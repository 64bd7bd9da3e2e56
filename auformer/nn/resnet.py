"""ResNet-18 trunks in NHWC (TPU-native layout).

Two variants used across the zoo:
  * ``ResFormerTrunk`` — the Former-DFER "S-Former" trunk
    (reference vformer.py:168-268): resnet18 stem + layers1-3, a 49-token
    256-dim spatial transformer inserted between layer3 and layer4, then
    layer4 + global average pool -> (B, 512).
  * ``ResNet18`` — a plain resnet18 feature extractor (torchvision
    semantics) used by the audio stream (reference audio.py:22-39) and the
    image baseline (reference resnet.py:16-80), with configurable input
    channels and optional classifier head.

Layout notes: inputs are (B, H, W, C); convs are HWIO; BatchNorm follows
torch semantics (eps 1e-5, momentum 0.1) via blocks.BatchNorm. MaxPool pads
with -inf like torch's MaxPool2d(3, 2, 1).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Transformer

Dtype = jnp.dtype


def conv3x3(features: int, stride: int = 1, name: str | None = None,
            dtype=jnp.float32):
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), use_bias=False, dtype=dtype,
                   name=name)


def conv1x1(features: int, stride: int = 1, name: str | None = None,
            dtype=jnp.float32):
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   padding="VALID", use_bias=False, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """reference vformer.py:128-165 (torchvision BasicBlock semantics)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        out = conv3x3(self.planes, self.stride, "conv1", self.dtype)(x)
        out = BatchNorm(name="bn1", dtype=self.dtype)(
            out, use_running_average=not train)
        out = nn.relu(out)
        out = conv3x3(self.planes, 1, "conv2", self.dtype)(out)
        out = BatchNorm(name="bn2", dtype=self.dtype)(
            out, use_running_average=not train)
        if self.downsample:
            identity = conv1x1(self.planes, self.stride, "ds_conv",
                               self.dtype)(x)
            identity = BatchNorm(name="ds_bn", dtype=self.dtype)(
                identity, use_running_average=not train)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    in_planes: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        needs_ds = self.stride != 1 or self.in_planes != self.planes
        x = BasicBlock(self.planes, self.stride, needs_ds, self.dtype,
                       name="block0")(x, train=train)
        for i in range(1, self.blocks):
            x = BasicBlock(self.planes, 1, False, self.dtype,
                           name=f"block{i}")(x, train=train)
        return x


def stem_maxpool(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1): -inf padded."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class StemConv(nn.Module):
    """The stem's 7x7 stride-2 conv, with an optional space-to-depth
    evaluation path.

    The parameter is ALWAYS (7, 7, C, width) HWIO under {conv1: {kernel}},
    so checkpoints are interchangeable between modes. With
    ``space_to_depth=True`` the same weights are reshuffled at trace time
    (XLA constant-folds it) into a 4x4 stride-1 kernel over 2x2-packed
    pixels — the classic TPU stem transform: a stride-2 7x7 conv on 3
    channels under-fills the 128-lane MXU tiles; packing quadruples the
    input features and removes the stride. Bit-equal in exact arithmetic.
    Requires even H, W.
    """
    width: int = 64
    dtype: Dtype = jnp.float32
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c_in, self.width), jnp.float32)
        # no preferred_element_type: the MXU accumulates f32 for bf16
        # convs regardless, the output is cast to dtype right away, and
        # a widened output dtype breaks the conv's AD transpose rule
        # (bf16/f32 mismatch in _conv_general_dilated_transpose_rhs)
        if not self.space_to_depth:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, "s2d stem needs even H, W"
        # pack 2x2 pixel blocks into channels, order (p, q, c)
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # zero-pad the 7x7 kernel to 8x8 at the top-left (offsets -4..3),
        # then W4[a, b, (p, q, c), o] = W8[2a + p, 2b + q, c, o]
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, c, self.width)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.width)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), k4.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNetStem(nn.Module):
    """conv7x7 s2 + BN + relu + maxpool3x3 s2 (see StemConv for the
    optional space-to-depth evaluation)."""
    width: int = 64
    dtype: Dtype = jnp.float32
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = StemConv(self.width, self.dtype, self.space_to_depth,
                     name="conv1")(x)
        x = BatchNorm(name="bn1", dtype=self.dtype)(
            x, use_running_average=not train)
        x = nn.relu(x)
        return stem_maxpool(x)


class ResFormerTrunk(nn.Module):
    """S-Former: resnet18 trunk with a spatial transformer between layer3 and
    layer4 (reference vformer.py:168-268 / sformer.py:236-336).

    Input (B*T, H, W, C) -> (B*T, 512). The 7x7 feature map becomes 49
    tokens of dim 256 with a learned positional embedding, runs through a
    ``depth``-layer encoder, and is folded back for layer4.
    """
    layers: Sequence[int] = (2, 2, 2, 2)
    num_patches: int = 49
    dim: int = 256
    depth: int = 1
    heads: int = 8
    mlp_dim: int = 512
    dim_head: int = 32
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: bool = True):
        x = ResNetStem(64, self.dtype, self.s2d_stem,
                       name="stem")(x, train=train)
        x = ResNetStage(64, self.layers[0], 1, 64, self.dtype,
                        name="layer1")(x, train=train)
        x = ResNetStage(128, self.layers[1], 2, 64, self.dtype,
                        name="layer2")(x, train=train)
        x = ResNetStage(256, self.layers[2], 2, 128, self.dtype,
                        name="layer3")(x, train=train)

        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_patches, self.dim), jnp.float32)
        tokens = tokens + pos[:, :h * w].astype(tokens.dtype)
        tokens = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                             self.mlp_dim, self.dropout, self.dtype,
                             self.use_pallas, name="spatial_transformer")(
                                 tokens, deterministic=deterministic)
        x = tokens.reshape(b, h, w, c)

        x = ResNetStage(512, self.layers[3], 2, 256, self.dtype,
                        name="layer4")(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1)


class ResNet18(nn.Module):
    """Plain resnet18 trunk -> (B, 512) features (torchvision semantics),
    with optional ``num_classes`` linear head."""
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: Optional[int] = None
    dtype: Dtype = jnp.float32
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ResNetStem(64, self.dtype, self.s2d_stem,
                       name="stem")(x, train=train)
        x = ResNetStage(64, self.layers[0], 1, 64, self.dtype,
                        name="layer1")(x, train=train)
        x = ResNetStage(128, self.layers[1], 2, 64, self.dtype,
                        name="layer2")(x, train=train)
        x = ResNetStage(256, self.layers[2], 2, 128, self.dtype,
                        name="layer3")(x, train=train)
        x = ResNetStage(512, self.layers[3], 2, 256, self.dtype,
                        name="layer4")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x
