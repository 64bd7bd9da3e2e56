"""MC3-18 (torchvision mc3_18 semantics) + VisualMC3DModel
(reference models/mc3d.py:37-83).

MC3 = "mixed convolution" 3D ResNet-18: a full-3D stem + layer1 (3x3x3
convs), then spatial-only (1x3x3) convs in layers 2-4. Clips are
(B, T, H, W, C); features (B, 512) -> Linear 256 -> BN -> Linear 21.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dtype


def conv3d(features, kernel, stride=(1, 1, 1), name=None,
           dtype=jnp.float32):
    pad = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(features, tuple(kernel), strides=tuple(stride),
                   padding=pad, use_bias=False, dtype=dtype, name=name)


class BasicBlock3D(nn.Module):
    """torchvision video BasicBlock with Conv3DSimple (3x3x3) or
    Conv3DNoTemporal (1x3x3) convs."""
    planes: int
    temporal: bool
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        k = (3, 3, 3) if self.temporal else (1, 3, 3)
        s = ((self.stride,) * 3 if self.temporal
             else (1, self.stride, self.stride))
        identity = x
        out = conv3d(self.planes, k, s, "conv1", self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv3d(self.planes, k, (1, 1, 1), "conv2", self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1, 1), strides=s,
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="ds_bn")(identity)
        return nn.relu(out + identity)


class MC3_18(nn.Module):
    """(B, T, H, W, 3) -> (B, 512)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # BasicStem: Conv3d(3,64,(3,7,7),s(1,2,2),p(1,3,3)) + BN + ReLU
        x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                    padding=((1, 1), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        specs = [  # (planes, temporal, stride, blocks)
            (64, True, 1, 2), (128, False, 2, 2),
            (256, False, 2, 2), (512, False, 2, 2)]
        in_planes = 64
        for li, (planes, temporal, stride, blocks) in enumerate(specs):
            for bi in range(blocks):
                st = stride if bi == 0 else 1
                ds = bi == 0 and (st != 1 or in_planes != planes)
                x = BasicBlock3D(planes, temporal, st, ds, self.dtype,
                                 name=f"layer{li + 1}_block{bi}")(
                                     x, train=train)
            in_planes = planes
        return jnp.mean(x, axis=(1, 2, 3))  # AdaptiveAvgPool3d(1)


class VisualMC3DModel(nn.Module):
    """mc3d model (reference mc3d.py:37-83)."""
    modality: str = "V"
    task: str = "AU"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "mc3d"

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        assert "V" in self.modality and "M" not in self.modality, \
            "mc3d is RGB-only (mc3d.py:44)"
        feats = MC3_18(self.dtype, name="video_model")(
            x["clip"][..., -3:], train=train)
        h = nn.Dense(256, dtype=self.dtype, name="fc1")(feats)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="fc_bn")(h)
        return nn.Dense(21, dtype=self.dtype, name="fc2")(h)
