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
        # last nonzero bin (PIL's histo[-1]); fill with 0, NOT 255 — a 255
        # pad index would alias bin 255 (possibly empty) as the last
        # nonzero bin for any channel with no 255-valued pixels
        nz = jnp.nonzero(h, size=256, fill_value=0)[0]
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


# -- staged fast path ----------------------------------------------------------
#
# ``imagenet_policy_device`` above is the REFERENCE implementation: under
# vmap, ``lax.switch`` lowers to compute-all-25-branches-and-select, and
# each branch's two ``lax.cond``s also evaluate both sides — so every frame
# pays for ~50 op applications. Equalize alone costs ~1 ms/frame on a v5e
# (vmapped scatter histograms) and appears in ~a dozen policy slots: a 64x16
# train batch spent 13.4 s/step in augmentation (round-5 trace,
# fusion-dominated; the K=8 steps/dispatch program then exceeded the TPU's
# execution watchdog and hard-crashed the worker).
#
# The fast path exploits the structure of the vocabulary instead: a frame
# applies AT MOST ONE op per policy slot, and every op is one of
#   * an AFFINE warp (shear/translate/rotate) -> one per-frame 2x3 warp,
#     nearest + bicubic both sampled, selected by a per-frame mode flag;
#   * a per-frame-per-channel 256-entry LUT (invert/posterize/solarize/
#     brightness/contrast/autocontrast/equalize) -> build the LUT from
#     per-frame stats (gray mean, channel min/max, channel histograms via
#     a compare-reduce, NOT scatter) and apply with one tiny gather;
#   * the two remaining blends (color, sharpness) -> always-on stages whose
#     factor defaults to the exact-identity 1.0.
# Each slot then costs one warp pair + one LUT build/apply + two cheap
# blends for the whole batch — ~25-40x less device work than the switch
# lowering, with op formulas IDENTICAL to the reference fns above (the
# fast-vs-reference parity test pins exact equality).

_OP_IDS = {"none": 0, "shearX": 1, "shearY": 2, "translateX": 3,
           "translateY": 4, "rotate": 5, "invert": 6, "posterize": 7,
           "solarize": 8, "brightness": 9, "contrast": 10,
           "autocontrast": 11, "equalize": 12, "color": 13,
           "sharpness": 14}


@functools.lru_cache(maxsize=1)
def _policy_tables():
    """(25,) static per-slot tables: op id, probability, magnitude,
    signedness — from the same IMAGENET_POLICIES/_RANGES the reference
    branch builder reads."""
    from ..data.transforms import IMAGENET_POLICIES, _RANGES

    n = len(IMAGENET_POLICIES)
    op = np.zeros((n, 2), np.int32)
    prob = np.zeros((n, 2), np.float32)
    mag = np.zeros((n, 2), np.float32)
    signed = np.zeros((n, 2), np.float32)
    for i, (p1, o1, m1, p2, o2, m2) in enumerate(IMAGENET_POLICIES):
        for s, (p, o, m) in enumerate([(p1, o1, m1), (p2, o2, m2)]):
            op[i, s] = _OP_IDS[o]
            prob[i, s] = p
            mag[i, s] = float(_RANGES[o][m])
            signed[i, s] = 1.0 if o in SIGNED_OPS else 0.0
    # numpy, NOT jnp: this is lru_cached, and a jnp constant created
    # under one jit trace would leak that trace's tracer into the next
    return op, prob, mag, signed


def _cubic_w(t, a_coef=-0.5):
    at = jnp.abs(t)
    at2 = at * at
    at3 = at2 * at
    w1 = (a_coef + 2) * at3 - (a_coef + 3) * at2 + 1
    w2 = (a_coef * at3 - 5 * a_coef * at2 + 8 * a_coef * at
          - 4 * a_coef)
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _axis_resample_apply(img_f, shift, bicubic_frame, axis_w,
                         einsum_spec):
    """1D resample along one axis as a sum of 4 fused one-hot einsums.

    img_f: (T, H, W, C) f32; shift: (T, A, B) f32 source offset so that
    out[.., b, ..] samples in[.., s(b), ..] along the resampled axis
    (length axis_w); bicubic_frame: (T,) bool — PIL uses bicubic for
    shear, nearest for translate. Out-of-range taps blend toward FILL
    exactly like ``_affine_sample``.

    Each tap contributes ``w_i * one_hot(tap_i) @ img``: XLA fuses the
    one-hot construction into the MXU contraction, so no (T, A, B,
    axis_w) weight tensor is ever materialized (the materialized form
    costs ~40 GB of HBM traffic per axis pass — 244 ms/slot measured;
    the fused form is bandwidth-light)."""
    bc = bicubic_frame[:, None, None]

    # nearest: one tap at floor(s), FILL outside
    ixn = jnp.floor(shift)
    inside = (ixn >= 0) & (ixn <= axis_w - 1)

    # bicubic: 4 taps (the 2D kernel collapses: the orthogonal offset is
    # an exact integer for shear, so its cubic weights are [0, 1, 0, 0])
    s = shift - 0.5
    x0 = jnp.floor(s)
    tx = s - x0

    out = None
    wsum_all = jnp.zeros(shift.shape, jnp.float32)
    wsum_in = jnp.zeros(shift.shape, jnp.float32)
    for i in range(-1, 3):
        cub_tap = x0 + i
        cub_w = _cubic_w(tx - i)
        cub_in = (cub_tap >= 0) & (cub_tap <= axis_w - 1)
        wsum_all = wsum_all + cub_w
        wsum_in = wsum_in + cub_w * cub_in
        tap = jnp.where(bc, cub_tap, ixn)
        wgt = jnp.where(bc, cub_w * cub_in,
                        inside.astype(jnp.float32) if i == -1 else 0.0)
        oh = jax.nn.one_hot(jnp.clip(tap, 0, axis_w - 1).astype(jnp.int32),
                            axis_w, dtype=jnp.float32)
        term = wgt[..., None] * jnp.einsum(einsum_spec, oh, img_f)
        out = term if out is None else out + term

    fill_w = jnp.where(bc, wsum_all - wsum_in,
                       1.0 - inside.astype(jnp.float32))
    wall = jnp.where(bc, wsum_all, jnp.ones_like(wsum_all))
    center_in = jnp.where(bc, (s >= -1) & (s <= axis_w), inside)
    out = (out + fill_w[..., None] * FILL) / wall[..., None]
    return jnp.where(center_in[..., None], out, FILL)


def _geo_stage(x, op, m):
    """Stage 1: the affine-family ops, decomposed TPU-first.

    shearX/translateX are per-row horizontal resamples and shearY/
    translateY per-column vertical resamples — both run as banded-weight
    matmuls on the MXU (exact: one sample per output in the nearest case,
    the reference 2D bicubic collapses to 1D on the shear axis). Only
    rotate is a genuinely 2D nearest gather; it uses a flattened
    take_along_axis, the fastest XLA gather form measured on v5e."""
    t, h, w = x.shape[0], x.shape[1], x.shape[2]
    xf = x.astype(jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    is_h = (op == 1) | (op == 3)
    is_v = (op == 2) | (op == 4)
    is_rot = op == 5
    bicubic_f = op == 1  # shearX
    bicubic_v = op == 2  # shearY

    # horizontal: sx = x + b*(y+0.5) + c  (b = shear mag, c = translate)
    b_h = jnp.where(op == 1, m, 0.0)
    c_h = jnp.where(op == 3, m * w, 0.0)
    sx = (xs[None, None, :] + 0.5) + b_h[:, None, None] \
        * (ys[None, :, None] + 0.5) + c_h[:, None, None]
    out_h = _axis_resample_apply(xf, sx, bicubic_f, w, 'thxu,thuc->thxc')

    # vertical: sy = d*(x+0.5) + y + f  (d = shear mag, f = translate)
    d_v = jnp.where(op == 2, m, 0.0)
    f_v = jnp.where(op == 4, m * h, 0.0)
    sy = d_v[:, None, None] * (xs[None, None, :] + 0.5) \
        + (ys[None, :, None] + 0.5) + f_v[:, None, None]
    # resample along H: one-hot weights indexed (T, H_out, W, H_in)
    out_v = _axis_resample_apply(xf, sy, bicubic_v, h, 'thxr,trxc->thxc')

    # rotate: nearest 2D gather via flattened linear indices
    ang = jnp.deg2rad(m)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    cx, cy = w / 2.0, h / 2.0
    gx = (xs[None, None, :] + 0.5)
    gy = (ys[None, :, None] + 0.5)
    rc = cos[:, None, None]
    rs = sin[:, None, None]
    sxr = rc * gx - rs * gy + (cx - cos * cx + sin * cy)[:, None, None]
    syr = rs * gx + rc * gy + (cy - sin * cx - cos * cy)[:, None, None]
    ixr = jnp.floor(sxr).astype(jnp.int32)
    iyr = jnp.floor(syr).astype(jnp.int32)
    rin = (ixr >= 0) & (ixr < w) & (iyr >= 0) & (iyr < h)
    # 2D nearest gather as a rank-1 double one-hot contraction:
    # out[y,x] = sum_r sum_u [r==iy][u==ix] img[r,u]. XLA schedules the
    # chained einsum on the MXU — EXACT (one unit weight per output,
    # uint8 values are exact in bf16) and 2.7x faster than the best
    # element-gather form (59 vs 161 ms device-side at 1024 frames;
    # XLA's TPU element gather runs ~86 M elem/s regardless of layout)
    ohy = jax.nn.one_hot(jnp.clip(iyr, 0, h - 1), h, dtype=jnp.bfloat16)
    ohx = jax.nn.one_hot(jnp.clip(ixr, 0, w - 1), w, dtype=jnp.bfloat16)
    rot = jnp.einsum('tyxr,tyxu,truc->tyxc', ohy, ohx,
                     x.astype(jnp.bfloat16)).astype(jnp.float32)
    rot = jnp.where(rin[..., None], rot, FILL)

    out = jnp.where(is_rot[:, None, None, None], rot,
                    jnp.where(is_v[:, None, None, None], out_v, out_h))
    # nearest/identity paths are exact integers; bicubic rounds like
    # _affine_sample (round-half-away via jnp.round, then clip)
    rounded = jnp.where((bicubic_f | bicubic_v)[:, None, None, None],
                        jnp.round(out), out)
    out_u8 = jnp.clip(rounded, 0, 255).astype(jnp.uint8)
    geo_any = is_h | is_v | is_rot
    return jnp.where(geo_any[:, None, None, None], out_u8, x)


def _channel_hist_dense(x):
    """(T, H, W, C) uint8 -> (T, C, 256) int32 histograms via compare-
    reduce (TPU-friendly; the scatter-add of ``_channel_hist`` lowers to a
    serialized sort on TPU and costs ~1 ms/frame)."""
    iota = jnp.arange(256, dtype=jnp.int32)
    flat = x.astype(jnp.int32).reshape(x.shape[0], -1, x.shape[-1])
    eq = flat[:, :, :, None] == iota  # (T, P, C, 256), fused into the sum
    return jnp.sum(eq, axis=1, dtype=jnp.int32).astype(jnp.int32)


def _lut_stage(x, op, m):
    """Stage 2: every 256-LUT op. Builds one (T, C, 256) table from
    per-frame stats and applies it with a single tiny gather."""
    t, ch = x.shape[0], x.shape[-1]
    iota = jnp.arange(256, dtype=jnp.int32)
    iota_f = iota.astype(jnp.float32)
    mcol = m[:, None]

    # per-frame LUTs (T, 256), identical across channels
    lut = jnp.broadcast_to(iota[None], (t, 256))
    lut = jnp.where((op == 6)[:, None], 255 - iota[None], lut)
    bits = jnp.clip(m.astype(jnp.int32), 1, 8)
    mask = jnp.left_shift(jnp.int32(0xFF), 8 - bits) & 0xFF
    lut = jnp.where((op == 7)[:, None], iota[None] & mask[:, None], lut)
    lut = jnp.where((op == 8)[:, None],
                    jnp.where(iota_f[None] < mcol, iota[None],
                              255 - iota[None]), lut)
    bri = jnp.floor(jnp.clip(mcol * iota_f[None], 0, 255)).astype(jnp.int32)
    lut = jnp.where((op == 9)[:, None], bri, lut)
    # contrast: degenerate = round(mean of the gray-L plane)
    gmean = jnp.floor(_gray_L(x.astype(jnp.float32)).mean(axis=(1, 2))
                      + 0.5)
    con = jnp.floor(jnp.clip(
        gmean[:, None] + mcol * (iota_f[None] - gmean[:, None]),
        0, 255)).astype(jnp.int32)
    lut = jnp.where((op == 10)[:, None], con, lut)
    lut3 = jnp.broadcast_to(lut[:, None, :], (t, ch, 256))

    # autocontrast: per-channel [lo, hi] -> [0, 255] remap (identity when
    # hi == lo, PIL semantics)
    lo = x.min(axis=(1, 2)).astype(jnp.float32)  # (T, C)
    hi = x.max(axis=(1, 2)).astype(jnp.float32)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-20)
    ac = jnp.floor(jnp.clip(
        (iota_f[None, None] - lo[..., None]) * scale[..., None], 0, 255)
        + 1e-5).astype(jnp.int32)
    ac = jnp.where((hi > lo)[..., None], ac, iota[None, None])
    lut3 = jnp.where((op == 11)[:, None, None], ac, lut3)

    # equalize: per-channel histogram LUT (identity when step == 0)
    hist = _channel_hist_dense(x)  # (T, C, 256)
    nz = hist > 0
    # last nonzero bin per channel: max index where hist > 0
    last_idx = jnp.max(jnp.where(nz, iota[None, None], -1), axis=-1)
    last_count = jnp.take_along_axis(hist, last_idx[..., None],
                                     axis=-1)[..., 0]
    step = (hist.sum(-1) - last_count) // 255  # (T, C)
    csum = jnp.cumsum(hist, axis=-1)
    shifted = jnp.concatenate(
        [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], -1)
    eq = jnp.clip((shifted + step[..., None] // 2)
                  // jnp.maximum(step[..., None], 1), 0, 255)
    eq = jnp.where((step > 0)[..., None], eq, iota[None, None])
    lut3 = jnp.where((op == 12)[:, None, None], eq, lut3)

    # apply out[t,h,w,c] = lut3[t,c,x[t,h,w,c]] as a one-hot einsum: XLA
    # fuses the one-hot into the contraction on the MXU (below timing
    # noise at 1024 frames, vs ~0.6 s for the take_along_axis gather).
    # Exact: one nonzero weight per output, LUT values <= 255 are exact
    # in bf16.
    oh = jax.nn.one_hot(x.astype(jnp.int32), 256, dtype=jnp.bfloat16)
    out = jnp.einsum('thwcv,tcv->thwc', oh, lut3.astype(jnp.bfloat16))
    return out.astype(jnp.uint8)


def _color_stage(x, factor):
    """Stage 3: ImageEnhance.Color with per-frame factor (1.0 = exact
    identity: blend returns floor(v) == v)."""
    f = x.astype(jnp.float32)
    return _blend(_gray_L(f)[..., None], f, factor[:, None, None, None])


def _sharp_stage(x, factor):
    """Stage 4: ImageEnhance.Sharpness with per-frame factor (1.0 = exact
    identity)."""
    f = x.astype(jnp.float32)
    k = jnp.asarray(_SMOOTH_K).reshape(3, 3, 1, 1)
    per_c = jnp.moveaxis(f, -1, 0).reshape(-1, *x.shape[1:3], 1)
    sm = jax.lax.conv_general_dilated(
        per_c, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    sm = jnp.pad(sm, ((0, 0), (1, 1), (1, 1), (0, 0)))
    interior = jnp.zeros(x.shape[1:3], bool).at[1:-1, 1:-1].set(True)
    deg = jnp.where(interior[None, :, :, None], sm, per_c)
    deg = deg.reshape(x.shape[-1], -1, *x.shape[1:3]).transpose(1, 2, 3, 0)
    deg = jnp.floor(deg + 0.5)
    return _blend(deg, f, factor[:, None, None, None])


def _slot_apply(x, op, m):
    """Apply one policy slot (op (T,) int32, m (T,) float32) to every
    frame: 4 always-on stages, exactly one of which is non-identity per
    frame."""
    x = _geo_stage(x, op, m)
    x = _lut_stage(x, op, m)
    x = _color_stage(x, jnp.where(op == 13, m, 1.0))
    x = _sharp_stage(x, jnp.where(op == 14, m, 1.0))
    return x


def imagenet_policy_device_fast(clip: jax.Array, rng: jax.Array
                                ) -> jax.Array:
    """Staged-vocabulary equivalent of :func:`imagenet_policy_device`
    (same key-split structure, bit-identical outputs; see the parity
    test)."""
    op_t, prob_t, mag_t, signed_t = map(jnp.asarray, _policy_tables())
    t = clip.shape[0]
    k_policy, k_p1, k_p2, k_s1, k_s2 = jax.random.split(rng, 5)
    p_draws1 = jax.random.uniform(k_p1, (t,))
    p_draws2 = jax.random.uniform(k_p2, (t,))
    signs1 = jnp.where(jax.random.bernoulli(k_s1, 0.5, (t,)), 1.0, -1.0)
    signs2 = jnp.where(jax.random.bernoulli(k_s2, 0.5, (t,)), 1.0, -1.0)
    idx = jax.random.randint(k_policy, (), 0, op_t.shape[0])

    x = clip
    for s, (draws, signs) in enumerate([(p_draws1, signs1),
                                        (p_draws2, signs2)]):
        active = draws < prob_t[idx, s]
        op = jnp.where(active, op_t[idx, s], 0).astype(jnp.int32)
        m = mag_t[idx, s] * jnp.where(signed_t[idx, s] > 0, signs, 1.0)
        x = _slot_apply(x, op, m)
    return x


def augment_clips_device(clips: jax.Array, rng: jax.Array) -> jax.Array:
    """Batch entry: (B, T, H, W, 3) uint8 -> augmented, one policy draw per
    clip (the train-time aug path when Config.device_augment is set).

    Draws mirror ``vmap(imagenet_policy_device_fast)`` exactly (same
    per-clip key splits), but the stage pipeline runs on the FLAT (B*T)
    frame axis: every stage is frame-parallel, and the un-vmapped form
    gives XLA clean 2D matmul shapes for the warp/LUT contractions."""
    op_t, prob_t, mag_t, signed_t = map(jnp.asarray, _policy_tables())
    b, t = clips.shape[0], clips.shape[1]
    keys = jax.random.split(rng, b)

    def clip_draws(key):
        k_policy, k_p1, k_p2, k_s1, k_s2 = jax.random.split(key, 5)
        idx = jax.random.randint(k_policy, (), 0, op_t.shape[0])
        out = []
        for s, (kp, ks) in enumerate([(k_p1, k_s1), (k_p2, k_s2)]):
            draws = jax.random.uniform(kp, (t,))
            signs = jnp.where(jax.random.bernoulli(ks, 0.5, (t,)),
                              1.0, -1.0)
            active = draws < prob_t[idx, s]
            op = jnp.where(active, op_t[idx, s], 0).astype(jnp.int32)
            m = mag_t[idx, s] * jnp.where(signed_t[idx, s] > 0, signs, 1.0)
            out += [op, m]
        return tuple(out)

    op1, m1, op2, m2 = jax.vmap(clip_draws)(keys)
    x = clips.reshape((b * t,) + clips.shape[2:])
    x = _slot_apply(x, op1.reshape(-1), m1.reshape(-1))
    x = _slot_apply(x, op2.reshape(-1), m2.reshape(-1))
    return x.reshape(clips.shape)
