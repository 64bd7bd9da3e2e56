"""Host transform tests: invertible compose, color ops, device-normalize
equivalence with the reference NumpyToTensor+Normalize pipeline."""
import random

import numpy as np
import pytest

from auformer.data import transforms as T
from auformer.ops.preprocess import (CLIP_MEAN, CLIP_STD, denormalize_clip,
                                     normalize_clip)

RS = np.random.RandomState(9)


def test_numpy_to_tensor_roundtrip():
    clip = RS.randint(0, 256, (4, 16, 16, 3)).astype(np.uint8)
    t = T.NumpyToTensor()
    f = t(clip)
    assert f.shape == (3, 4, 16, 16) and f.dtype == np.float32
    assert f.max() <= 1.0
    back = t(f, invert=True)
    np.testing.assert_array_equal(back, clip)


def test_compose_invert_roundtrip():
    clip = RS.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    pipe = T.ComposeWithInvert([
        T.NumpyToTensor(),
        T.Normalize(mean=CLIP_MEAN[:3], std=CLIP_STD[:3])])
    fwd = pipe(clip.copy())
    back = pipe(fwd, invert=True)
    np.testing.assert_array_equal(back, clip)


def test_device_normalize_matches_host_pipeline():
    """ops.preprocess.normalize_clip == NumpyToTensor + Normalize (up to
    layout): the device path is numerically the reference host path."""
    clip = RS.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    host = T.ComposeWithInvert([
        T.NumpyToTensor(),
        T.Normalize(mean=CLIP_MEAN[:3], std=CLIP_STD[:3])])(clip.copy())
    dev = np.asarray(normalize_clip(clip))          # (T, H, W, C)
    np.testing.assert_allclose(np.transpose(dev, (3, 0, 1, 2)), host,
                               rtol=1e-5, atol=1e-6)
    # device inverse matches the original
    np.testing.assert_array_equal(np.asarray(denormalize_clip(dev)), clip)


def test_flip_is_horizontal():
    clip = RS.randint(0, 256, (2, 4, 6, 3)).astype(np.uint8)
    random.seed(1)
    out = T.random_clip_flip(clip.copy(), p=1.1)  # always flip
    np.testing.assert_array_equal(out, clip[:, :, ::-1, :])


def test_color_ops_run():
    img = RS.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    assert T.adjust_brightness(img, 1.3).shape == img.shape
    assert T.adjust_contrast(img, 0.7).shape == img.shape
    assert T.adjust_saturation(img, 1.5).shape == img.shape
    h = T.adjust_hue(img, 0.1)
    assert h.shape == img.shape and not np.array_equal(h, img)


def test_jpeg_compression_changes_pixels():
    img = RS.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    np.random.seed(0)
    out = T.jpeg_compression(img.copy(), probability=1.1)
    assert not np.array_equal(out, img)


def test_amp_to_db_class():
    x = np.abs(RS.randn(1, 64, 10).astype(np.float32))
    db = T.AmpToDB()(x)
    assert db.shape == x.shape
    assert db.max() - db.min() <= 80.0 + 1e-5

def test_intensity_class_surface():
    """intensity.py class surface (reference dataloader/intensity.py:
    dead code there, kept for API completeness — VERDICT r2 item 9)."""
    rs = np.random.RandomState(0)
    frame = rs.randint(0, 256, (16, 16, 3)).astype(np.uint8)

    np.testing.assert_allclose(T.Rescale()(frame), frame / 255.0)

    # deterministic ops match their PIL-enhancer definitions
    bright = T.Brightness(1.5)(frame)
    assert bright.dtype == np.uint8 and bright.mean() > frame.mean()
    dark = T.Brightness(0.5)(frame)
    assert dark.mean() < frame.mean()
    assert T.Contrast(1.0)(frame).shape == frame.shape
    np.testing.assert_array_equal(T.Saturation(1.0)(frame), frame)
    # PIL's RGB->HSV->RGB round trip quantizes: Hue(0) is near-identity
    hue0 = T.Hue(0.0)(frame)
    assert np.abs(hue0.astype(int) - frame.astype(int)).max() <= 8
    with pytest.raises(ValueError):
        T.Hue(0.7)

    # Random* variants draw their factor once at construction
    rng = random.Random(3)
    op = T.RandomBrightness(0.3, rng=rng)
    out1 = op(frame)
    np.testing.assert_array_equal(op(frame), out1)  # same factor, same out
    assert 0.7 <= op.brightness <= 1.3
    assert 0.9 <= T.RandomContrast(0.1, rng=rng).contrast <= 1.1
    assert 0.9 <= T.RandomSaturation(0.1, rng=rng).saturation <= 1.1
    assert -0.01 <= T.RandomHue(0.01, rng=rng).hue <= 0.01


def test_random_color_augment_class():
    rs = np.random.RandomState(1)
    frame = rs.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    rng = random.Random(0)
    aug = T.RandomColorAugment(brightness=0.5, contrast=0.5,
                               hue=0.1, saturation=0.5, rng=rng)
    out = aug(frame)
    assert out.shape == frame.shape and out.dtype == np.uint8
    # factors are per-instance constants -> deterministic application
    np.testing.assert_array_equal(aug(frame), out)
    # zero-strength augment is near-identity (Hue(0)'s HSV round trip
    # quantizes; every other factor is exactly 1)
    ident = T.RandomColorAugment(brightness=0, contrast=0,
                                 hue=0, saturation=0)
    assert np.abs(ident(frame).astype(int) - frame.astype(int)).max() <= 8
