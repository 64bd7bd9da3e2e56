"""On-device AutoAugment ops vs PIL goldens."""
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from auformer.ops import augment_device as D

RS = np.random.RandomState(5)


@pytest.fixture(scope="module")
def img():
    # structured image: gradients + noise so histograms are non-trivial
    yy, xx = np.mgrid[0:40, 0:40]
    base = np.stack([xx * 6 % 256, yy * 6 % 256, (xx + yy) * 3 % 256], -1)
    noise = RS.randint(0, 40, (40, 40, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def pil(img):
    return Image.fromarray(img)


def test_invert(img):
    ours = np.asarray(D.invert(img))
    ref = np.array(ImageOps.invert(pil(img)))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("bits", [4, 5, 6, 7, 8])
def test_posterize(img, bits):
    ours = np.asarray(D.posterize(img, bits))
    ref = np.array(ImageOps.posterize(pil(img), bits))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("thr", [0.0, 85.33, 142.22, 256.0])
def test_solarize(img, thr):
    ours = np.asarray(D.solarize(img, thr))
    ref = np.array(ImageOps.solarize(pil(img), thr))
    np.testing.assert_array_equal(ours, ref)


def test_equalize(img):
    ours = np.asarray(D.equalize(img))
    ref = np.array(ImageOps.equalize(pil(img)))
    np.testing.assert_array_equal(ours, ref)


def test_autocontrast(img):
    ours = np.asarray(D.autocontrast(img))
    ref = np.array(ImageOps.autocontrast(pil(img)))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1  # float LUT truncation wobble


@pytest.mark.parametrize("op,factor", [
    ("brightness", 1.5), ("brightness", 0.4),
    ("contrast", 1.8), ("contrast", 0.3),
    ("color", 1.9), ("color", 0.1),
    ("sharpness", 1.7), ("sharpness", 0.3),
])
def test_enhance_family(img, op, factor):
    fn = {"brightness": D.brightness, "contrast": D.contrast,
          "color": D.color, "sharpness": D.sharpness}[op]
    pil_cls = {"brightness": ImageEnhance.Brightness,
               "contrast": ImageEnhance.Contrast,
               "color": ImageEnhance.Color,
               "sharpness": ImageEnhance.Sharpness}[op]
    ours = np.asarray(fn(img, factor))
    ref = np.array(pil_cls(pil(img)).enhance(factor))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"{op}: max diff {diff.max()}"
    assert diff.mean() < 0.2


def test_translate_matches_pil(img):
    frac = 0.2
    ours = np.asarray(D.translate_x(img, frac))
    ref = np.array(pil(img).transform(
        pil(img).size, Image.AFFINE, (1, 0, frac * 40, 0, 1, 0),
        fillcolor=(128, 128, 128)))
    assert (ours == ref).mean() > 0.98  # boundary-row rounding only


def test_rotate_reasonable(img):
    """Rotate: same fill behavior and mostly-matching pixels vs the
    reference's RGBA-composite rotate (ops.py:45-50)."""
    deg = 15.0
    ours = np.asarray(D.rotate(img, deg))
    rot = pil(img).convert("RGBA").rotate(deg)
    ref = np.array(Image.composite(
        rot, Image.new("RGBA", rot.size, (128,) * 4), rot).convert("RGB"))
    match = (np.abs(ours.astype(int) - ref.astype(int)) <= 1).mean()
    assert match > 0.9, f"pixel agreement {match:.3f}"


def test_shear_bicubic_close(img):
    ours = np.asarray(D.shear_x(img, 0.2))
    ref = np.array(pil(img).transform(
        pil(img).size, Image.AFFINE, (1, 0.2, 0, 0, 1, 0),
        Image.BICUBIC, fillcolor=(128, 128, 128)))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.median(diff) <= 1
    assert (diff <= 3).mean() > 0.93


def test_policy_device_runs():
    import jax
    clip = RS.randint(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    out = D.imagenet_policy_device(clip, jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == clip.shape and out.dtype == np.uint8
    # different keys -> different augmentations (with high probability)
    outs = [np.asarray(D.imagenet_policy_device(clip, jax.random.PRNGKey(k)))
            for k in range(6)]
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])


def test_fast_policy_matches_reference():
    """The staged fast path (imagenet_policy_device_fast) must reproduce
    the reference switch-based path: same key-split structure, same op
    formulas, only the selection machinery differs. Table/geometric ops
    must be bit-identical; the ImageEnhance float blends may flip floor()
    by 1 LSB on a small fraction of pixels (XLA fuses the mul+add as an
    FMA in one lowering and not the other — the same +-1 LSB class the
    PIL goldens above already tolerate)."""
    import jax
    clip = RS.randint(0, 256, (6, 32, 32, 3)).astype(np.uint8)
    for k in range(12):
        key = jax.random.PRNGKey(k)
        ref = np.asarray(D.imagenet_policy_device(clip, key))
        fast = np.asarray(D.imagenet_policy_device_fast(clip, key))
        diff = np.abs(fast.astype(int) - ref.astype(int))
        assert diff.max() <= 1, f"key {k}: max diff {diff.max()}"
        assert (diff > 0).mean() < 0.02, \
            f"key {k}: {(diff > 0).mean():.3%} pixels differ"


@pytest.mark.parametrize("op,mag", [
    ("shearX", 0.2), ("shearX", -0.2), ("shearY", 0.15),
    ("translateX", 0.3), ("translateX", -0.3), ("translateY", 0.2),
    ("rotate", 20.0), ("rotate", -15.0), ("invert", 0.0),
    ("posterize", 5.0), ("solarize", 85.33), ("brightness", 1.4),
    ("brightness", 0.6), ("contrast", 1.5), ("autocontrast", 0.0),
    ("equalize", 0.0), ("color", 1.7), ("sharpness", 0.4),
])
def test_slot_apply_per_op(op, mag):
    """Every op of the staged fast path vs the reference op function.
    Nearest/table ops are exact; bicubic + enhance blends may differ by
    1 LSB (summation order / FMA fusion)."""
    import jax.numpy as jnp
    frames = RS.randint(0, 256, (3, 24, 24, 3)).astype(np.uint8)
    ref = np.asarray(D.apply_op(frames, op, mag))
    opid = np.full(3, D._OP_IDS[op], np.int32)
    m = np.full(3, mag, np.float32)
    fast = np.asarray(D._slot_apply(jnp.asarray(frames), jnp.asarray(opid),
                                    jnp.asarray(m)))
    diff = np.abs(fast.astype(int) - ref.astype(int))
    tol = 1 if op in ("shearX", "shearY", "brightness", "contrast",
                      "color", "sharpness") else 0
    assert diff.max() <= tol, f"{op}: max diff {diff.max()}"
    if tol:
        assert (diff > 0).mean() < 0.05, f"{op}: {(diff>0).mean():.2%}"


def test_slot_apply_identity():
    """op id 0 must be an EXACT uint8 passthrough of all four stages."""
    import jax.numpy as jnp
    frames = RS.randint(0, 256, (4, 24, 24, 3)).astype(np.uint8)
    out = np.asarray(D._slot_apply(jnp.asarray(frames),
                                   jnp.zeros(4, jnp.int32),
                                   jnp.zeros(4, jnp.float32)))
    np.testing.assert_array_equal(out, frames)
