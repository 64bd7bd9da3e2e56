"""TwoStreamAuralVisualModel — the ABAW2020TNT baseline
(reference models/tsav.py:65-143): r2plus1d_18 video stream + 1-channel
resnet18 audio stream, 512+512 concat -> Dropout + Linear -> 22 outputs
(12 AU + 8 EX + 2 VA; the reference's EX slice uses 7 of the 8).

Note: the reference never exports tsav from models/__init__.py, so it is
unreachable from train.py's dispatch — included here for full inventory
parity (SURVEY.md §2.1 tsav row).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .avformer import AudioModel
from .blocks import Dtype


class R2Plus1DBlock(nn.Module):
    """torchvision Conv2Plus1D BasicBlock: every 3D conv factorizes into
    (1,3,3) spatial + (3,1,1) temporal with a BN+ReLU between, using the
    torchvision midplane count."""
    in_planes: int
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    def _mid(self, in_p, out_p):
        return (in_p * out_p * 3 * 3 * 3) // (in_p * 3 * 3 + 3 * out_p)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def conv2plus1d(inp, in_p, out_p, stride, prefix):
            mid = self._mid(in_p, out_p)
            h = nn.Conv(mid, (1, 3, 3), strides=(1, stride, stride),
                        padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"{prefix}_s")(inp)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"{prefix}_bn_mid")(h)
            h = nn.relu(h)
            return nn.Conv(out_p, (3, 1, 1), strides=(stride, 1, 1),
                           padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                           dtype=self.dtype, name=f"{prefix}_t")(h)

        identity = x
        out = conv2plus1d(x, self.in_planes, self.planes, self.stride,
                          "conv1")
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv2plus1d(out, self.planes, self.planes, 1, "conv2")
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1, 1),
                               strides=(self.stride,) * 3, use_bias=False,
                               dtype=self.dtype, name="ds_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="ds_bn")(identity)
        return nn.relu(out + identity)


class R2Plus1D18(nn.Module):
    """(B, T, H, W, C) -> (B, 512). R(2+1)D stem: (1,7,7)s(1,2,2) 45ch +
    (3,1,1) 64ch."""
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                    padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="stem_s")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    use_bias=False, dtype=self.dtype, name="stem_t")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn2")(x)
        x = nn.relu(x)
        in_planes = 64
        for li, (planes, stride, blocks) in enumerate(
                [(64, 1, 2), (128, 2, 2), (256, 2, 2), (512, 2, 2)]):
            for bi in range(blocks):
                st = stride if bi == 0 else 1
                ds = bi == 0 and (st != 1 or in_planes != planes)
                x = R2Plus1DBlock(in_planes if bi == 0 else planes, planes,
                                  st, ds, self.dtype,
                                  name=f"layer{li + 1}_block{bi}")(
                                      x, train=train)
            in_planes = planes
        return jnp.mean(x, axis=(1, 2, 3))


class TwoStreamAuralVisualModel(nn.Module):
    modality: str = "A;V"
    task: str = "AU"
    n_frames: int = 16
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip", "audio_features")
    loss_key = "tsav"

    @property
    def num_channels(self) -> int:
        return 4 if ("M" in self.modality and "V" in self.modality) else 3

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        clip = x["clip"][..., -self.num_channels:]
        vfeat = R2Plus1D18(self.num_channels, self.dtype,
                           name="video_model")(clip, train=train)
        afeat = AudioModel(self.dtype, name="audio_model")(
            x["audio_features"], train=train)
        feats = jnp.concatenate([afeat, vfeat], axis=1)
        # Dropout(0.0) + Linear -> 22 (tsav.py:71-74)
        return nn.Dense(22, dtype=self.dtype, name="fc")(
            feats).astype(jnp.float32)
