"""SpatialFormer — single-frame spatial model (reference models/sformer.py:
338-449): ResFormer trunk with dropout 0.2, BN-MLP 512->256->21 head, and
AU_former/VA_former heads overriding the AU/VA slices by task.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dtype
from .heads import AUFormerHead, VAFormerHead
from .resnet import ResFormerTrunk
from .vformer import MLPHead


class SpatialFormer(nn.Module):
    modality: str = "V"
    task: str = "AU"
    dropout: float = 0.2
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "sformer"

    @property
    def num_channels(self) -> int:
        if "M" in self.modality:
            return 4 if "V" in self.modality else 1
        return 3

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        clip = x["clip"][..., -self.num_channels:]
        b, t, h, w, c = clip.shape
        assert t == 1, "sformer is single-frame (reference sformer.py:368)"
        frames = clip.reshape(b, h, w, c)
        feats = ResFormerTrunk(dropout=self.dropout, dtype=self.dtype,
                               use_pallas=self.use_pallas,
                               name="base_model")(
                                   frames, train=train,
                                   deterministic=not train)
        out = MLPHead(dtype=self.dtype, name="fc")(feats, train=train)
        out = out.astype(jnp.float32)
        if self.task == "AU":
            au, _ = AUFormerHead(dropout=self.dropout, dtype=self.dtype,
                                 use_pallas=self.use_pallas, name="au_head")(
                                     feats, train=train,
                                     deterministic=not train)
            out = out.at[:, :12].set(au.astype(jnp.float32))
        if self.task == "VA":
            va, _ = VAFormerHead(dropout=self.dropout, dtype=self.dtype,
                                 use_pallas=self.use_pallas, name="va_head")(
                                     feats, train=train,
                                     deterministic=not train)
            out = out.at[:, -2:].set(va.astype(jnp.float32))
        return out
