"""On-device clip preprocessing (fused into the jitted step).

The reference converts uint8 THWC -> float CTHW /255 then normalizes in
place on the host per sample (clip_transforms.py:31-93). TPU-first, the host
ships raw uint8 clips (4x less PCIe/ICI bytes than f32) and this module does
/255 + per-channel normalize + optional horizontal flip on device, where XLA
fuses it into the first convolution's input pipeline.

Constants are the Kinetics statistics used everywhere in the reference
(aff2compdataset.py:69-77); the 4th entry is the mask channel (0.5/0.225).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.43216, 0.394666, 0.37645, 0.5], np.float32)
CLIP_STD = np.array([0.22803, 0.22145, 0.216989, 0.225], np.float32)


def normalize_clip(clip_u8: jax.Array, channels: int | None = None,
                   dtype=jnp.float32) -> jax.Array:
    """(..., H, W, C) uint8 -> normalized float. C in {1, 3, 4}.

    For C==1 (mask-only) the reference still indexes mean[0:1] of the RGB
    stats via broadcasting of its channel tensor; we use the RGB-first
    convention: channels <=3 take the leading constants, C==4 appends the
    mask stats.
    """
    c = clip_u8.shape[-1] if channels is None else channels
    mean = jnp.asarray(CLIP_MEAN[:c], dtype)
    std = jnp.asarray(CLIP_STD[:c], dtype)
    x = clip_u8.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
    return (x - mean) / std


def denormalize_clip(clip: jax.Array) -> jax.Array:
    """Inverse transform (the reference's ComposeWithInvert(invert=True)
    path, clip_transforms.py:21-28,85-87): float -> uint8 THWC."""
    c = clip.shape[-1]
    mean = jnp.asarray(CLIP_MEAN[:c], clip.dtype)
    std = jnp.asarray(CLIP_STD[:c], clip.dtype)
    x = (clip * std + mean) * 255.0
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def random_flip_clips(clip: jax.Array, rng: jax.Array,
                      p: float = 0.5) -> jax.Array:
    """Per-sample whole-clip horizontal flip (clip_transforms.py:111-128).
    clip: (B, T, H, W, C). One Bernoulli draw per clip, same for all frames.
    """
    b = clip.shape[0]
    flip = jax.random.bernoulli(rng, p, (b,))
    flipped = clip[:, :, :, ::-1, :]
    return jnp.where(flip[:, None, None, None, None], flipped, clip)


def normalize_spec_batch(feats: jax.Array, mean: float = -14.8,
                         std: float = 19.895) -> jax.Array:
    """Audio feature normalize when features come precomputed from host."""
    return (feats - mean) / std
