"""Native C++ framestore reader: build, read, batched decode parity."""
import cv2
import numpy as np
import pytest

from auformer.data import FrameStoreWriter
from auformer.data.native import NativeFrameStore, available, build_error


pytestmark = pytest.mark.skipif(
    not available(), reason=f"native reader unavailable: {build_error()}")


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("native") / "store")
    rs = np.random.RandomState(0)
    images = {}
    with FrameStoreWriter(p) as w:
        for i in range(20):
            img = (rs.rand(48, 48, 3) * 255).astype(np.uint8)
            ok, enc = cv2.imencode(
                ".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 92])
            assert ok
            w.put(f"vid/{i:05d}.jpg", enc.tobytes())
            images[f"vid/{i:05d}.jpg"] = enc.tobytes()
        w.put("raw/blob", b"hello world")
    return p, images


def test_open_and_raw_get(store):
    p, images = store
    s = NativeFrameStore(p)
    assert len(s) == 21
    assert s.get("raw/blob") == b"hello world"
    assert s.get("missing") is None
    key = "vid/00003.jpg"
    assert s.get(key) == images[key]


def test_decode_batch_matches_cv2(store):
    p, images = store
    s = NativeFrameStore(p, n_threads=2)
    keys = [f"vid/{i:05d}.jpg" for i in range(16)]
    out, ok = s.decode_batch(keys, 48, 48, 3)
    assert ok.all()
    for i, k in enumerate(keys):
        buf = np.frombuffer(images[k], np.uint8)
        ref = cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR),
                           cv2.COLOR_BGR2RGB)
        # cv2 bundles libjpeg-turbo, system lib may differ by +-1 in IDCT
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1, f"frame {i}: max diff {diff.max()}"


def test_decode_batch_missing_and_empty(store):
    p, _ = store
    s = NativeFrameStore(p)
    keys = ["vid/00000.jpg", None, "missing/key.jpg", "raw/blob"]
    out, ok = s.decode_batch(keys, 48, 48, 3)
    assert list(ok) == [True, False, False, False]
    assert out[1].max() == 0 and out[2].max() == 0
    # corrupt data (raw/blob) must not crash, frame stays black ok=0
    assert out[3].max() == 0


def test_decode_grayscale(store):
    p, images = store
    s = NativeFrameStore(p)
    out, ok = s.decode_batch(["vid/00001.jpg"], 48, 48, 1)
    assert ok[0]
    buf = np.frombuffer(images["vid/00001.jpg"], np.uint8)
    ref = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
    diff = np.abs(out[0, :, :, 0].astype(int) - ref.astype(int))
    # grayscale conversion coefficients differ slightly between
    # libjpeg (ITU-R 601 in DCT space) and cv2's post-decode conversion
    assert diff.mean() < 2.0
