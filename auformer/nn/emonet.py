"""EmoNet — landmark-attention single-frame model
(reference models/emonet.py).

A frozen 2-module FAN hourglass (InstanceNorm ConvBlocks, emonet.py:106-138)
produces 68-channel landmark heatmaps; their channel-sum gates the hourglass
features (attention mask, emonet.py:187-190); an emo branch of 4 ConvBlocks
+ maxpools pools to 256-dim features feeding an 8+2 expression/VA MLP and an
AU_former (emonet.py:141-202).

Output is flattened to the framework's (B, 21) layout: [AU | EX(first 7 of
8) | VA] — the reference returns a dict and its own evaluate() path cannot
consume it (SURVEY.md §2.4); the flat layout integrates EmoNet with the
shared loop while preserving every trained tensor.

Geometry: the hourglass halves resolution 4x, so H and W must be divisible
by 64 (the reference crashes at its own 112 default; EmoNet is a 256x256
model).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dtype
from .heads import AUFormerHead


def instance_norm(x, eps: float = 1e-5):
    """torch InstanceNorm2d(affine=False) on NHWC: per-sample per-channel
    normalization over H, W."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class ConvBlock(nn.Module):
    """IN->relu->3x3 pyramid concat block (emonet.py:18-60)."""
    in_planes: int
    out_planes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.out_planes // 2
        quarter = self.out_planes // 4

        def c3(f, name):
            return nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, dtype=self.dtype, name=name)

        o1 = c3(half, "conv1")(nn.relu(instance_norm(x)))
        o2 = c3(quarter, "conv2")(nn.relu(instance_norm(o1)))
        o3 = c3(quarter, "conv3")(nn.relu(instance_norm(o2)))
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if self.in_planes != self.out_planes:
            res = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                          dtype=self.dtype, name="downsample")(
                              nn.relu(instance_norm(x)))
        else:
            res = x
        return out + res


class HourGlass(nn.Module):
    """Recursive hourglass, depth 4 (emonet.py:62-104)."""
    depth: int = 4
    features: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def level(inp, lv):
            up1 = ConvBlock(256, 256, self.dtype, name=f"b1_{lv}")(inp)
            low = nn.max_pool(inp, (2, 2), strides=(2, 2))
            low = ConvBlock(256, 256, self.dtype, name=f"b2_{lv}")(low)
            if lv > 1:
                low2 = level(low, lv - 1)
            else:
                low2 = ConvBlock(256, 256, self.dtype,
                                 name=f"b2_plus_{lv}")(low)
            low3 = ConvBlock(256, 256, self.dtype, name=f"b3_{lv}")(low2)
            b, h, w, c = low3.shape
            up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
            return up1 + up2
        return level(x, self.depth)


class EmoNet(nn.Module):
    """FAN + attention-gated emo branch (emonet.py:106-202)."""
    num_modules: int = 2
    n_expression: int = 8
    n_reg: int = 2
    n_blocks: int = 4
    in_channels: int = 3
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="conv1")(img)
        x = nn.relu(instance_norm(x))
        x = ConvBlock(64, 128, self.dtype, name="conv2")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, 128, self.dtype, name="conv3")(x)
        x = ConvBlock(128, 256, self.dtype, name="conv4")(x)

        previous = x
        hg_features = []
        tmp_out = None
        for i in range(self.num_modules):
            hg = HourGlass(4, 256, self.dtype, name=f"m{i}")(previous)
            ll = ConvBlock(256, 256, self.dtype, name=f"top_m_{i}")(hg)
            ll = nn.Conv(256, (1, 1), dtype=self.dtype,
                         name=f"conv_last{i}")(ll)
            ll = nn.relu(instance_norm(ll))
            tmp_out = nn.Conv(68, (1, 1), dtype=self.dtype,
                              name=f"l{i}")(ll)
            if i < self.num_modules - 1:
                bl = nn.Conv(256, (1, 1), dtype=self.dtype,
                             name=f"bl{i}")(ll)
                al = nn.Conv(256, (1, 1), dtype=self.dtype,
                             name=f"al{i}")(tmp_out)
                previous = previous + bl + al
            hg_features.append(ll)

        feats = jnp.concatenate(hg_features, axis=-1)
        mask = jnp.sum(tmp_out, axis=-1, keepdims=True)  # attention
        feats = feats * mask
        emo = jnp.concatenate([x, feats], axis=-1)
        emo = nn.Conv(256, (1, 1), dtype=self.dtype,
                      name="conv1x1_input_emo_2")(emo)
        for bi in range(self.n_blocks):
            emo = ConvBlock(256, 256, self.dtype, name=f"emo_convs_{bi}")(emo)
            emo = nn.max_pool(emo, (2, 2), strides=(2, 2))
        final = emo.mean(axis=(1, 2))  # avg_pool_2 (global at 256x256 input)
        h = nn.Dense(128, dtype=self.dtype, name="emo_fc_1")(final)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="emo_fc_bn")(h)
        h = nn.relu(h)
        predict = nn.Dense(self.n_expression + self.n_reg, dtype=self.dtype,
                           name="emo_fc_2")(h)
        au_out, _ = AUFormerHead(input_dim=256, dtype=self.dtype,
                                 use_pallas=self.use_pallas, name="au_head")(
                                     final, train=train,
                                     deterministic=not train)
        return {"heatmap": tmp_out,
                "expression": predict[:, :-2],
                "valence_arousal": predict[:, -2:],
                "action_unit": au_out}


class ImageEmoNetModel(nn.Module):
    """emonet model (reference emonet.py:218-286) in the (B,21) layout."""
    modality: str = "V"
    task: str = "AU"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip",)
    loss_key = "emonet"

    @property
    def num_channels(self) -> int:
        if "M" in self.modality:
            return 4 if "V" in self.modality else 1
        return 3

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        clip = x["clip"][..., -self.num_channels:]
        b, t, h, w, c = clip.shape
        assert t == 1, "emonet is single-frame (emonet.py:237)"
        assert h % 64 == 0 and w % 64 == 0, \
            "emonet needs 64-divisible input (hourglass geometry)"
        d = EmoNet(in_channels=c, dtype=self.dtype,
                   use_pallas=self.use_pallas, name="base_model")(
                       clip.reshape(b, h, w, c), train=train)
        out = jnp.zeros((b, 21), jnp.float32)
        out = out.at[:, :12].set(d["action_unit"].astype(jnp.float32))
        out = out.at[:, 12:19].set(
            d["expression"][:, :7].astype(jnp.float32))
        out = out.at[:, 19:21].set(
            d["valence_arousal"].astype(jnp.float32))
        return out
