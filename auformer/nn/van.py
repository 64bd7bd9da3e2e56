"""Visual-Attention-Network backbone + SpatialVAN (reference models/van.py).

VAN-base: 4 stages of overlap patch embed + LKA (large-kernel-attention)
blocks — 5x5 depthwise, 7x7 dilated-3 depthwise, 1x1 pointwise gating
(van.py:66-80) — with BatchNorm2d block norms, layer-scale residuals,
stochastic depth, and per-stage token LayerNorm(eps 1e-6). The timm
dependencies (DropPath, trunc_normal_) are implemented locally.

SpatialVAN (van.py:330-438): single-frame van_base features -> BN-MLP 21 +
AU_former override of the AU slice (the reference's un-unpacked tuple
assignment at van.py:368-369 is implemented per evident intent).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Dtype
from .heads import AUFormerHead
from .vformer import MLPHead


def drop_path(x, rate: float, deterministic: bool, rng) -> jax.Array:
    """Stochastic depth (timm DropPath semantics: per-sample keep/scale)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class DWConv(nn.Module):
    """3x3 depthwise (van.py:270-277)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                       feature_group_count=self.dim, dtype=self.dtype,
                       name="dwconv")(x)


class VanMlp(nn.Module):
    """1x1 conv -> DW 3x3 -> GELU -> 1x1 conv (van.py:27-61). torch nn.GELU
    is the exact erf form here (unlike the transformer blocks' tanh GELU)."""
    dim: int
    hidden: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = DWConv(self.hidden, self.dtype, name="dwconv")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class LKA(nn.Module):
    """Large-kernel attention (van.py:66-80): u * (1x1 o dilated-DW7 o DW5)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        u = x
        a = nn.Conv(self.dim, (5, 5), padding=((2, 2), (2, 2)),
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="conv0")(x)
        a = nn.Conv(self.dim, (7, 7), padding=((9, 9), (9, 9)),
                    kernel_dilation=(3, 3), feature_group_count=self.dim,
                    dtype=self.dtype, name="conv_spatial")(a)
        a = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv1")(a)
        return u * a


class SpatialAttention(nn.Module):
    """proj -> GELU -> LKA -> proj, residual (van.py:83-99)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = LKA(self.dim, self.dtype, name="spatial_gating_unit")(x)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_2")(x)
        return x + shortcut


class VanBlock(nn.Module):
    """BN -> attn, BN -> mlp, layer-scaled residuals + drop-path
    (van.py:102-138)."""
    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 deterministic: bool = True):
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-2), (self.dim,),
                         jnp.float32)
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-2), (self.dim,),
                         jnp.float32)
        h = BatchNorm(name="norm1", dtype=self.dtype)(
            x, use_running_average=not train)
        h = SpatialAttention(self.dim, self.dtype, name="attn")(h)
        h = ls1.astype(h.dtype) * h
        if not deterministic and self.drop_path_rate > 0:
            h = drop_path(h, self.drop_path_rate, deterministic,
                          self.make_rng("dropout"))
        x = x + h
        h = BatchNorm(name="norm2", dtype=self.dtype)(
            x, use_running_average=not train)
        h = VanMlp(self.dim, int(self.dim * self.mlp_ratio), self.drop,
                   self.dtype, name="mlp")(h, deterministic=deterministic)
        h = ls2.astype(h.dtype) * h
        if not deterministic and self.drop_path_rate > 0:
            h = drop_path(h, self.drop_path_rate, deterministic,
                          self.make_rng("dropout"))
        return x + h


class OverlapPatchEmbed(nn.Module):
    """Strided overlap conv + BN (van.py:141-179)."""
    patch_size: int
    stride: int
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        p = self.patch_size // 2
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    name="proj")(x)
        return BatchNorm(name="norm", dtype=self.dtype)(
            x, use_running_average=not train)


class VAN(nn.Module):
    """van_base by default (van.py:320-328): dims [64,128,320,512],
    depths [3,3,12,3], mlp ratios [8,8,4,4]. -> (B, 512) pooled tokens."""
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    depths: Sequence[int] = (3, 3, 12, 3)
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 deterministic: bool = True):
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        cur = 0
        for i, (dim, ratio, depth) in enumerate(
                zip(self.embed_dims, self.mlp_ratios, self.depths)):
            x = OverlapPatchEmbed(7 if i == 0 else 3, 4 if i == 0 else 2,
                                  dim, self.dtype,
                                  name=f"patch_embed{i + 1}")(x, train=train)
            for j in range(depth):
                x = VanBlock(dim, ratio, self.drop_rate, dpr[cur + j],
                             self.dtype, name=f"block{i + 1}_{j}")(
                                 x, train=train, deterministic=deterministic)
            cur += depth
            b, h, w, c = x.shape
            tokens = x.reshape(b, h * w, c)
            tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name=f"norm{i + 1}")(tokens)
            if i != len(self.depths) - 1:
                x = tokens.reshape(b, h, w, c)
            else:
                x = tokens
        return x.mean(axis=1)  # (B, 512)


class SpatialVAN(nn.Module):
    """van model (reference van.py:330-438)."""
    modality: str = "V"
    task: str = "AU"
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "van"

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        clip = x["clip"][..., -3:]  # VAN stays 3-channel (van.py:340-341)
        b, t, h, w, c = clip.shape
        assert t == 1, "van is single-frame (van.py:361)"
        feats = VAN(dtype=self.dtype, name="base_model")(
            clip.reshape(b, h, w, c), train=train, deterministic=not train)
        out = MLPHead(dtype=self.dtype, name="fc")(
            feats, train=train).astype(jnp.float32)
        au, _ = AUFormerHead(dtype=self.dtype, use_pallas=self.use_pallas,
                             name="au_head")(feats, train=train,
                                             deterministic=not train)
        return out.at[:, :12].set(au.astype(jnp.float32))
