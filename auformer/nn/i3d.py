"""Inception-v1 I3D + VisualI3DModel (reference models/i3d.py).

The reference carries TF-style dynamic SAME padding helpers
(MaxPool3dSamePadding / Unit3D compute_pad, i3d.py:21-125); in JAX,
``padding='SAME'`` on convolutions and an explicit TF-SAME pad for pooling
give identical geometry with zero per-step host logic.

Clips are (B, T, H, W, C) — already the TPU-native layout for 3D convs.
VisualI3DModel uses extract_features (avg-pooled 1024-dim Mixed_5c,
i3d.py:341-345,377-384) -> Linear 256 -> BN -> Linear 21.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import Dtype


class Unit3D(nn.Module):
    """Conv3D(SAME) + BN(eps 1e-3, momentum 0.01) + ReLU (i3d.py:55-125)."""
    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    use_relu: bool = True
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=tuple(self.stride), padding="SAME",
                    use_bias=self.use_bias, dtype=self.dtype,
                    name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


def max_pool_same(x, kernel, stride):
    """TF-SAME max pool over (T, H, W) of a (B,T,H,W,C) tensor."""
    pads = [(0, 0)]
    for d, (k, s) in enumerate(zip(kernel, stride)):
        size = x.shape[1 + d]
        if size % s == 0:
            pad = max(k - s, 0)
        else:
            pad = max(k - (size % s), 0)
        pads.append((pad // 2, pad - pad // 2))
    pads.append((0, 0))
    return nn.max_pool(x, tuple(kernel), strides=tuple(stride),
                       padding=tuple(pads[1:-1]))


class InceptionModule(nn.Module):
    """4-branch inception block (i3d.py:128-153)."""
    out_channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        oc = self.out_channels
        b0 = Unit3D(oc[0], dtype=self.dtype, name="b0")(x, train=train)
        b1 = Unit3D(oc[1], dtype=self.dtype, name="b1a")(x, train=train)
        b1 = Unit3D(oc[2], (3, 3, 3), dtype=self.dtype, name="b1b")(
            b1, train=train)
        b2 = Unit3D(oc[3], dtype=self.dtype, name="b2a")(x, train=train)
        b2 = Unit3D(oc[4], (3, 3, 3), dtype=self.dtype, name="b2b")(
            b2, train=train)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], dtype=self.dtype, name="b3b")(b3, train=train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# endpoint channel configs (i3d.py:251-295)
_MIXED = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}


class InceptionI3d(nn.Module):
    """Feature trunk to Mixed_5c + avg pool -> (B, 1024)
    (i3d.py:156-345)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x, train=train)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))       # MaxPool3d_2a
        x = Unit3D(64, dtype=self.dtype, name="Conv3d_2b_1x1")(
            x, train=train)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype,
                   name="Conv3d_2c_3x3")(x, train=train)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))       # MaxPool3d_3a
        x = InceptionModule(_MIXED["Mixed_3b"], self.dtype,
                            name="Mixed_3b")(x, train=train)
        x = InceptionModule(_MIXED["Mixed_3c"], self.dtype,
                            name="Mixed_3c")(x, train=train)
        x = max_pool_same(x, (3, 3, 3), (2, 2, 2))       # MaxPool3d_4a
        for ep in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                   "Mixed_4f"):
            x = InceptionModule(_MIXED[ep], self.dtype, name=ep)(
                x, train=train)
        x = max_pool_same(x, (2, 2, 2), (2, 2, 2))       # MaxPool3d_5a
        x = InceptionModule(_MIXED["Mixed_5b"], self.dtype,
                            name="Mixed_5b")(x, train=train)
        x = InceptionModule(_MIXED["Mixed_5c"], self.dtype,
                            name="Mixed_5c")(x, train=train)
        # avg_pool kernel [2,7,7] stride 1 then squeeze — with 16x112x112
        # inputs the map is exactly (2,7,7) so this is a global mean
        # (i3d.py:298-299,341-345)
        return jnp.mean(x, axis=(1, 2, 3))


class VisualI3DModel(nn.Module):
    """i3d model (reference i3d.py:356-403)."""
    modality: str = "V"
    task: str = "AU"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "i3d"

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        assert "V" in self.modality and "M" not in self.modality, \
            "i3d is RGB-only (i3d.py:363)"
        feats = InceptionI3d(self.dtype, name="video_model")(
            x["clip"][..., -3:], train=train)
        h = nn.Dense(256, dtype=self.dtype, name="fc1")(feats)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="fc_bn")(h)
        return nn.Dense(21, dtype=self.dtype, name="fc2")(h)
