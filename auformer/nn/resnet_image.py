"""ImageResNetModel — the simplest single-frame baseline (reference
models/resnet.py:16-80): plain resnet18 features + Dropout(0)+Linear(21);
also the fallback for unknown model names (train.py:315).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dtype
from .resnet import ResNet18


class ImageResNetModel(nn.Module):
    modality: str = "V;M"
    task: str = "AU"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "resnet"

    @property
    def num_channels(self) -> int:
        if "M" in self.modality:
            return 4 if "V" in self.modality else 1
        return 3

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        clip = x["clip"][..., -self.num_channels:]
        b, t, h, w, c = clip.shape
        assert t == 1, "resnet baseline is single-frame (resnet.py:37)"
        feats = ResNet18(dtype=self.dtype, name="base_model")(
            clip.reshape(b, h, w, c), train=train)
        return nn.Dense(21, dtype=self.dtype, name="fc")(feats)
