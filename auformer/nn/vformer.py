"""Former-DFER style visual stream (reference models/vformer.py).

``TFormer``: CLS-token temporal encoder over the 16 per-frame embeddings
(vformer.py:270-293). ``VideoModel``: S-Former trunk folding time into batch
+ TFormer (vformer.py:295-331). ``VisualFormer``: the trainable model with
the BN-MLP 512->256->21 head (vformer.py:358-405).

TPU notes: clips arrive (B, T, H, W, C); time folds into the batch for the
2D trunk so the MXU sees B*T-size convolutions. Channel configuration
follows config_modality (vformer.py:313-331): the model consumes the LAST
``num_channels`` of the input channel dim.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Transformer
from .resnet import ResFormerTrunk

Dtype = jnp.dtype


class TFormer(nn.Module):
    """Temporal CLS transformer (reference vformer.py:270-293)."""
    num_patches: int = 16
    dim: int = 512
    depth: int = 3
    heads: int = 8
    mlp_dim: int = 1024
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.reshape(-1, self.num_patches, self.dim)
        b, n, _ = x.shape
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim), jnp.float32)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_patches + 1, self.dim), jnp.float32)
        cls_tokens = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim))
        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = x + pos[:, :n + 1].astype(x.dtype)
        x = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim, self.dropout, self.dtype,
                        self.use_pallas, name="transformer")(
                            x, deterministic=deterministic)
        return x[:, 0]


class VideoModel(nn.Module):
    """S-Former + T-Former feature extractor -> (B, 512)
    (reference vformer.py:295-311). ``num_classes`` adds the torch model's
    fc (replaced by Dummy when embedded, vformer.py:374)."""
    num_channels: int = 3
    n_frames: int = 16
    num_classes: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, clip, *, train: bool = False,
                 deterministic: bool = True):
        # clip: (B, T, H, W, C); consume the last num_channels channels
        x = clip[..., -self.num_channels:]
        b, t, h, w, c = x.shape
        x = x.reshape(b * t, h, w, c)
        feats = ResFormerTrunk(dropout=self.dropout, dtype=self.dtype,
                               use_pallas=self.use_pallas, name="s_former")(
                                   x, train=train, deterministic=deterministic)
        feats = feats.reshape(b, t, 512)
        out = TFormer(num_patches=self.n_frames, dtype=self.dtype,
                      use_pallas=self.use_pallas, name="t_former")(
                          feats, deterministic=deterministic)
        if self.num_classes is not None:
            out = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(out)
        return out


class MLPHead(nn.Module):
    """BN -> Dense(256) -> BN -> Dense(21) (reference vformer.py:368-373)."""
    in_features: int = 512
    out_features: int = 21
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = BatchNorm(name="bn1", dtype=self.dtype)(
            x, use_running_average=not train)
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(x)
        x = BatchNorm(name="bn2", dtype=self.dtype)(
            x, use_running_average=not train)
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)


class VisualFormer(nn.Module):
    """vformer model (reference vformer.py:358-405): clip -> (B, 21)."""
    modality: str = "V"
    task: str = "AU"
    n_frames: int = 16
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "vformer"

    @property
    def num_channels(self) -> int:
        if "M" in self.modality:
            return 4 if "V" in self.modality else 1
        return 3

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        feats = VideoModel(self.num_channels, self.n_frames, None,
                           0.0, self.dtype, self.use_pallas,
                           name="video_model")(
                               x["clip"], train=train, deterministic=not train)
        return MLPHead(dtype=self.dtype, name="fc")(feats, train=train)
