"""On-device AutoAugment (XLA): the reference's per-frame PIL augmentation
pipeline (autoaugment.py / ops.py, invoked at aff2compdataset.py:72-74)
implemented as jittable uint8 image ops so training augmentation fuses into
the input batch on TPU instead of per-frame PIL calls (SURVEY.md §2.3).

Ops operate on (..., H, W, 3) uint8 RGB. Table-based ops (invert, posterize,
solarize, equalize, autocontrast) are integer-exact vs PIL; the ImageEnhance
family matches to +-1 LSB (float blend rounding); geometric ops (rotate /
shear / translate) reproduce PIL's coordinate conventions with nearest or
bicubic (a=-0.75) sampling and the (128,128,128) fill.

``imagenet_policy_device`` applies one randomly chosen sub-policy per clip
with per-frame probability/sign draws, mirroring the host path
(data/transforms.py) semantics under jax PRNG.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FILL = 128.0


# -- table ops ---------------------------------------------------------------

def invert(img):
    return 255 - img


def posterize(img, bits):
    """Keep top ``bits`` bits (ImageOps.posterize)."""
    mask = (0xFF << (8 - bits)) & 0xFF
    return img & jnp.uint8(mask)


def solarize(img, threshold):
    return jnp.where(img.astype(jnp.int32) < threshold, img, 255 - img)


def _channel_hist(ch):
    """(H, W) uint8 -> (256,) int32 histogram."""
    return jnp.zeros(256, jnp.int32).at[ch.reshape(-1)].add(1)


def equalize(img):
    """PIL ImageOps.equalize: per-channel histogram equalization with the
    step = (pixels - last_nonzero_bin) // 255 rule."""
    def eq_channel(ch):
        h = _channel_hist(ch)
        nz = jnp.nonzero(h, size=256, fill_value=255)[0]
        last_nonzero = nz.max()
        step = (h.sum() - h[last_nonzero]) // 255

        def with_lut(_):
            csum = jnp.cumsum(h)
            lut = (jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]])
                   + step // 2) // jnp.maximum(step, 1)
            lut = jnp.clip(lut, 0, 255).astype(jnp.uint8)
            return lut[ch]

        return jax.lax.cond(step > 0, with_lut, lambda _: ch, None)

    flat = img.reshape(-1, *img.shape[-3:])          # (N, H, W, C)
    per_chan = jnp.moveaxis(flat, -1, 1)             # (N, C, H, W)
    shaped = per_chan.reshape(-1, *img.shape[-3:-1])
    out = jax.vmap(eq_channel)(shaped)
    out = out.reshape(per_chan.shape)
    return jnp.moveaxis(out, 1, -1).reshape(img.shape)


def autocontrast(img):
    """PIL ImageOps.autocontrast(cutoff=0): per-channel remap of [lo, hi]
    to [0, 255] with int truncation."""
    def ac_channel(ch):
        lo = ch.min().astype(jnp.float32)
        hi = ch.max().astype(jnp.float32)

        def remap(_):
            scale = 255.0 / (hi - lo)
            ix = jnp.arange(256, dtype=jnp.float32)
            lut = jnp.clip((ix - lo) * scale, 0, 255)
            # PIL: lut.append(int(ix * scale + offset)) — C double->int
            # truncation; +0.5-free. Add tiny eps against fp wobble.
            lut = jnp.floor(lut + 1e-5).astype(jnp.uint8)
            return lut[ch]

        return jax.lax.cond(hi > lo, remap, lambda _: ch, None)

    flat = img.reshape(-1, *img.shape[-3:])
    per_chan = jnp.moveaxis(flat, -1, 1)
    shaped = per_chan.reshape(-1, *img.shape[-3:-1])
    out = jax.vmap(ac_channel)(shaped)
    out = out.reshape(per_chan.shape)
    return jnp.moveaxis(out, 1, -1).reshape(img.shape)


# -- ImageEnhance family -------------------------------------------------------

def _blend(degenerate, img_f, factor):
    # PIL Image.blend truncates the float interpolation (C float->uint8)
    out = degenerate + factor * (img_f - degenerate)
    return jnp.floor(jnp.clip(out, 0, 255)).astype(jnp.uint8)


def _gray_L(img_f):
    """PIL convert('L'): (R*19595 + G*38470 + B*7471 + 0x8000) >> 16."""
    r = img_f[..., 0].astype(jnp.int32)
    g = img_f[..., 1].astype(jnp.int32)
    b = img_f[..., 2].astype(jnp.int32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        jnp.float32)


def brightness(img, factor):
    return _blend(0.0, img.astype(jnp.float32), factor)


def contrast(img, factor):
    """degenerate = uniform mean of the L channel (+0.5 int round)."""
    f = img.astype(jnp.float32)
    l = _gray_L(img)
    mean = jnp.floor(l.mean(axis=(-2, -1), keepdims=True) + 0.5)
    return _blend(mean[..., None], f, factor)


def color(img, factor):
    """degenerate = grayscale replicated over RGB."""
    f = img.astype(jnp.float32)
    return _blend(_gray_L(f)[..., None], f, factor)


_SMOOTH_K = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0


def sharpness(img, factor):
    """degenerate = PIL SMOOTH filter; border pixels keep original values
    (PIL filters only the interior)."""
    f = img.astype(jnp.float32)
    lead = f.shape[:-3]
    x = f.reshape(-1, *f.shape[-3:])
    k = jnp.asarray(_SMOOTH_K).reshape(3, 3, 1, 1)
    per_c = jnp.moveaxis(x, -1, 0).reshape(-1, *x.shape[1:3], 1)
    sm = jax.lax.conv_general_dilated(
        per_c, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    sm = jnp.pad(sm, ((0, 0), (1, 1), (1, 1), (0, 0)))
    interior = jnp.zeros(x.shape[1:3], bool).at[1:-1, 1:-1].set(True)
    deg = jnp.where(interior[None, :, :, None], sm, per_c)
    deg = deg.reshape(3, -1, *x.shape[1:3]).transpose(1, 2, 3, 0)
    # PIL rounds the filtered value (half-up) to uint8 BEFORE blending
    deg = jnp.floor(deg + 0.5)
    return _blend(deg, x, factor).reshape(img.shape)


# -- geometric ops -------------------------------------------------------------

def _affine_sample(img, coeffs, resample: str):
    """PIL Image.transform(AFFINE, coeffs): out(x, y) = in(a x + b y + c,
    d x + e y + f), sampled nearest or bicubic (a = -0.5), gray fill."""
    a, b, c, d, e, f = coeffs
    h, w = img.shape[-3], img.shape[-2]
    ys, xs = jnp.mgrid[0:h, 0:w]
    sx = a * (xs + 0.5) + b * (ys + 0.5) + c
    sy = d * (xs + 0.5) + e * (ys + 0.5) + f
    fimg = img.astype(jnp.float32)

    if resample == "nearest":
        ix = jnp.floor(sx).astype(jnp.int32)
        iy = jnp.floor(sy).astype(jnp.int32)
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        out = fimg[..., iyc, ixc, :]
        return jnp.where(inside[..., None], out, FILL).astype(jnp.uint8)

    # bicubic: 4x4 taps, PIL cubic a=-0.5, fill outside
    sx = sx - 0.5
    sy = sy - 0.5
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0

    def cubic(t, a_coef=-0.5):
        at = jnp.abs(t)
        at2 = at * at
        at3 = at2 * at
        w1 = (a_coef + 2) * at3 - (a_coef + 3) * at2 + 1
        w2 = a_coef * at3 - 5 * a_coef * at2 + 8 * a_coef * at - 4 * a_coef
        return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))

    acc = 0.0
    wacc = 0.0
    for j in range(-1, 3):
        for i in range(-1, 3):
            px = x0.astype(jnp.int32) + i
            py = y0.astype(jnp.int32) + j
            wgt = cubic(tx - i) * cubic(ty - j)
            pin = (px >= 0) & (px < w) & (py >= 0) & (py < h)
            pxc = jnp.clip(px, 0, w - 1)
            pyc = jnp.clip(py, 0, h - 1)
            val = jnp.where(pin[..., None], fimg[..., pyc, pxc, :], FILL)
            acc = acc + wgt[..., None] * val
            wacc = wacc + wgt
    out = acc / wacc[..., None]
    center_in = (sx >= -1) & (sx <= w) & (sy >= -1) & (sy <= h)
    out = jnp.where(center_in[..., None], out, FILL)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def shear_x(img, magnitude):
    return _affine_sample(img, (1.0, magnitude, 0.0, 0.0, 1.0, 0.0),
                          "bicubic")


def shear_y(img, magnitude):
    return _affine_sample(img, (1.0, 0.0, 0.0, magnitude, 1.0, 0.0),
                          "bicubic")


def translate_x(img, frac):
    w = img.shape[-2]
    return _affine_sample(img, (1.0, 0.0, frac * w, 0.0, 1.0, 0.0),
                          "nearest")


def translate_y(img, frac):
    h = img.shape[-3]
    return _affine_sample(img, (1.0, 0.0, 0.0, 0.0, 1.0, frac * h),
                          "nearest")


def rotate(img, degrees):
    """PIL rotate(angle): CCW about the center, nearest, gray fill (the
    reference composites onto (128,)*4, ops.py:45-50)."""
    h, w = img.shape[-3], img.shape[-2]
    ang = jnp.deg2rad(degrees)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    cx, cy = w / 2.0, h / 2.0
    # output->input mapping for a CCW rotation about the center:
    # in = (cos*dx - sin*dy + cx, sin*dx + cos*dy + cy), d = out - center
    coeffs = (cos, -sin, cx - cos * cx + sin * cy,
              sin, cos, cy - sin * cx - cos * cy)
    return _affine_sample(img, coeffs, "nearest")


# -- policy machinery ----------------------------------------------------------

OP_FNS = {
    "invert": lambda img, m: invert(img),
    "posterize": lambda img, m: posterize(img, int(m)),
    "solarize": lambda img, m: solarize(img, m),
    "equalize": lambda img, m: equalize(img),
    "autocontrast": lambda img, m: autocontrast(img),
    "brightness": brightness,
    "contrast": contrast,
    "color": color,
    "sharpness": sharpness,
    "shearX": shear_x,
    "shearY": shear_y,
    "translateX": translate_x,
    "translateY": translate_y,
    "rotate": rotate,
}

SIGNED_OPS = {"brightness", "contrast", "color", "sharpness",
              "shearX", "shearY", "translateX", "translateY", "rotate"}


def apply_op(img, op: str, magnitude, sign=1.0):
    m = magnitude * sign if op in SIGNED_OPS else magnitude
    return OP_FNS[op](img, m)


def imagenet_policy_device(clip: jax.Array, rng: jax.Array) -> jax.Array:
    """One random ImageNet sub-policy per clip, per-frame prob/sign draws.
    clip: (T, H, W, 3) uint8. Geometric magnitudes are traced per-branch via
    lax.switch over the 25 sub-policies (static table, compiled once)."""
    from ..data.transforms import IMAGENET_POLICIES, _RANGES

    t = clip.shape[0]
    k_policy, k_p1, k_p2, k_s1, k_s2 = jax.random.split(rng, 5)
    p_draws1 = jax.random.uniform(k_p1, (t,))
    p_draws2 = jax.random.uniform(k_p2, (t,))
    signs1 = jnp.where(jax.random.bernoulli(k_s1, 0.5, (t,)), 1.0, -1.0)
    signs2 = jnp.where(jax.random.bernoulli(k_s2, 0.5, (t,)), 1.0, -1.0)

    def make_branch(policy):
        p1, op1, m1, p2, op2, m2 = policy
        mag1 = float(_RANGES[op1][m1])
        mag2 = float(_RANGES[op2][m2])

        def branch(c):
            def frame(fr, p1d, p2d, s1, s2):
                fr = jax.lax.cond(
                    p1d < p1,
                    lambda f: apply_op(f, op1, mag1, s1),
                    lambda f: f, fr)
                fr = jax.lax.cond(
                    p2d < p2,
                    lambda f: apply_op(f, op2, mag2, s2),
                    lambda f: f, fr)
                return fr
            return jax.vmap(frame)(c, p_draws1, p_draws2, signs1, signs2)
        return branch

    branches = [make_branch(p) for p in IMAGENET_POLICIES]
    idx = jax.random.randint(k_policy, (), 0, len(branches))
    return jax.lax.switch(idx, branches, clip)


def augment_clips_device(clips: jax.Array, rng: jax.Array) -> jax.Array:
    """Batch entry: (B, T, H, W, 3) uint8 -> augmented, one policy draw per
    clip (the train-time aug path when Config.device_augment is set)."""
    keys = jax.random.split(rng, clips.shape[0])
    return jax.vmap(imagenet_policy_device)(clips, keys)
