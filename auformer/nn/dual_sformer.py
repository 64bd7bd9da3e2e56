"""DualSpatialFormer (reference models/dual_sformer.py:279-365): two
single-frame ResFormer trunks — RGB (3ch) + mask (1ch) — whose 512-dim
features are summed before the BN-MLP head.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dtype
from .resnet import ResFormerTrunk
from .vformer import MLPHead


class DualSpatialFormer(nn.Module):
    modality: str = "V;M"
    task: str = "AU"
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "dsformer"

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        assert "V" in self.modality and "M" in self.modality, \
            "dsformer needs RGB+mask input (dual_sformer.py:282)"
        clip = x["clip"]
        b, t, h, w, c = clip.shape
        assert t == 1, "dsformer is single-frame (dual_sformer.py:308)"
        rgb = clip[:, 0, :, :, :-1]                  # (B, H, W, 3)
        mask = clip[:, 0, :, :, -1:]                 # (B, H, W, 1)
        f_rgb = ResFormerTrunk(dtype=self.dtype, use_pallas=self.use_pallas,
                               name="rgb_model")(
                                   rgb, train=train, deterministic=not train)
        f_mask = ResFormerTrunk(dtype=self.dtype, use_pallas=self.use_pallas,
                                name="mask_model")(
                                    mask, train=train,
                                    deterministic=not train)
        feats = f_rgb + f_mask                       # (dual_sformer.py:315)
        return MLPHead(dtype=self.dtype, name="fc")(feats, train=train)
