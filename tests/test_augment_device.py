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
