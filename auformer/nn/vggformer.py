"""VGGFace2-backboned visual former (reference models/vggformer.py).

``VGGFace2Extractor``: ResNet-50 Bottleneck trunk with the VGGFace2 repo's
ceil-mode stem maxpool (vggformer.py:62-115) -> (B*T, 7, 7, 2048).
``VGGFormerTrunk``: frozen trunk + 1x1 conv to 512 + 49-token spatial
transformer + avg pool (vggformer.py:250-296). ``VGGConvTrunk`` is the
no-transformer ablation (vggformer.py:218-248). ``VGGVisualFormer``: trunk
per frame -> TFormer -> Linear+BN+ReLU+Linear head (vggformer.py:364-402;
note this head has a ReLU and no input BN, unlike vformer's).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Dtype, Transformer
from .vformer import TFormer


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # the VGGFace2 repo's bottleneck strides conv1, not conv2
        # (vggformer.py:30: conv1 kernel_size=1 stride=stride)
        identity = x
        out = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(name="bn1", dtype=self.dtype)(
            out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(name="bn2", dtype=self.dtype)(
            out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(name="bn3", dtype=self.dtype)(
            out, use_running_average=not train)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="ds_conv")(x)
            identity = BatchNorm(name="ds_bn", dtype=self.dtype)(
                identity, use_running_average=not train)
        return nn.relu(out + identity)


class VGGFace2Extractor(nn.Module):
    """ResNet-50 trunk, ceil-mode stem pool (vggformer.py:62-115)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(name="bn1", dtype=self.dtype)(
            x, use_running_average=not train)
        x = nn.relu(x)
        # MaxPool2d(3, 2, padding=0, ceil_mode=True): right/bottom pad so the
        # last partial window counts (vggformer.py:71)
        h, w = x.shape[1], x.shape[2]
        ph = (-(h - 3) % 2)
        pw = (-(w - 3) % 2)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((0, ph), (0, pw)))
        in_planes = 64
        for li, (planes, stride, blocks) in enumerate(
                [(64, 1, 3), (128, 2, 4), (256, 2, 6), (512, 2, 3)]):
            for bi in range(blocks):
                st = stride if bi == 0 else 1
                ds = bi == 0 and (st != 1 or in_planes != planes * 4)
                x = Bottleneck(planes, st, ds, self.dtype,
                               name=f"layer{li + 1}_block{bi}")(
                                   x, train=train)
                in_planes = planes * 4
        return x  # (B, 4, 4, 2048) at 112 input; (B, 7, 7, 2048) at 224


class VGGFormerTrunk(nn.Module):
    """trunk + conv1x1(2048->512) + spatial transformer + pool
    (vggformer.py:250-296)."""
    dim: int = 512
    depth: int = 1
    heads: int = 8
    mlp_dim: int = 512
    dim_head: int = 32
    num_patches: int = 49
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 deterministic: bool = True):
        x = VGGFace2Extractor(self.dtype, name="VGG_model")(x, train=train)
        x = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_patches, self.dim), jnp.float32)
        tokens = tokens + pos[:, :h * w].astype(tokens.dtype)
        tokens = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                             self.mlp_dim, self.dropout, self.dtype,
                             self.use_pallas, name="spatial_transformer")(
                                 tokens, deterministic=deterministic)
        return tokens.mean(axis=1)  # avg pool over patches -> (B, 512)


class VGGConvTrunk(nn.Module):
    """No-transformer ablation (VGGCONV, vggformer.py:218-248)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = VGGFace2Extractor(self.dtype, name="VGG_model")(x, train=train)
        x = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return x.mean(axis=(1, 2))


class VGGVisualFormer(nn.Module):
    """vggformer model (reference vggformer.py:364-402)."""
    modality: str = "V"
    task: str = "AU"
    n_frames: int = 16
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "vggformer"

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        clip = x["clip"][..., -3:]
        b, t, h, w, c = clip.shape
        frames = clip.reshape(b * t, h, w, c)
        feats = VGGFormerTrunk(dtype=self.dtype, use_pallas=self.use_pallas,
                               name="s_former")(
                                   frames, train=train,
                                   deterministic=not train)
        feats = feats.reshape(b, t, 512)
        pooled = TFormer(num_patches=self.n_frames, dtype=self.dtype,
                         use_pallas=self.use_pallas, name="t_former")(
                             feats, deterministic=not train)
        h1 = nn.Dense(256, dtype=self.dtype, name="fc1")(pooled)
        h1 = BatchNorm(name="fc_bn", dtype=self.dtype)(
            h1, use_running_average=not train)
        h1 = nn.relu(h1)
        return nn.Dense(21, dtype=self.dtype, name="fc2")(h1)
