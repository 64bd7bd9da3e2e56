"""SpatialTemporalFormer (reference models/tformer.py:296-455): the
AU-token-centric temporal model — per-frame AU_former tokens (12 x 128 =
1536-dim per frame) become the temporal sequence for a dim-1536 TFormer;
a depth-3 tformer_AU_head refines the pooled AU tokens.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dtype
from .heads import AUFormerHead, FormerAUHead
from .resnet import ResFormerTrunk
from .vformer import MLPHead, TFormer


class TformerVideoModel(nn.Module):
    """s_former -> per-frame AU tokens -> TFormer(dim=1536) -> (B, 1536)
    (reference tformer.py:296-316)."""
    num_channels: int = 3
    n_frames: int = 16
    dropout: float = 0.2
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, clip, *, train: bool = False):
        x = clip[..., -self.num_channels:]
        b, t, h, w, c = x.shape
        frames = x.reshape(b * t, h, w, c)
        feats = ResFormerTrunk(dtype=self.dtype, use_pallas=self.use_pallas,
                               name="s_former")(
                                   frames, train=train,
                                   deterministic=not train)
        _, tokens = AUFormerHead(dropout=self.dropout, dtype=self.dtype,
                                 use_pallas=self.use_pallas, name="au_head")(
                                     feats, train=train,
                                     deterministic=not train)
        per_frame = tokens.reshape(b, t, 12 * 128)
        return TFormer(num_patches=self.n_frames, dim=12 * 128,
                       dtype=self.dtype, use_pallas=self.use_pallas,
                       name="t_former")(per_frame, deterministic=not train)


class SpatialTemporalFormer(nn.Module):
    modality: str = "V"
    task: str = "AU"
    n_frames: int = 16
    dropout: float = 0.2
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "tformer"

    @property
    def num_channels(self) -> int:
        if "M" in self.modality:
            return 4 if "V" in self.modality else 1
        return 3

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        feats = TformerVideoModel(self.num_channels, self.n_frames,
                                  self.dropout, self.dtype, self.use_pallas,
                                  name="video_model")(x["clip"], train=train)
        out = MLPHead(in_features=12 * 128, dtype=self.dtype,
                      name="fc")(feats, train=train).astype(jnp.float32)
        # tformer_AU_head at emb 128 over the pooled 12x128 tokens
        # (tformer.py:415,429-434) — always applied, regardless of task
        au = FormerAUHead(emb_dim=128, dropout=self.dropout, depth=3,
                          mlp_dim=256, dtype=self.dtype,
                          use_pallas=self.use_pallas, name="au_head")(
                              feats.reshape(-1, 12, 128),
                              deterministic=not train)
        return out.at[:, :12].set(au.astype(jnp.float32))
