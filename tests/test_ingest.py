"""L0 ingest tooling tests: image-store packing, timestamps, video wrapper."""
import os

import cv2
import numpy as np
import pytest

from auformer.data.framestore import FrameStore
from auformer.data.ingest import (create_image_store, extract_timestamps,
                                  iter_image_files, write_label_store)
from auformer.data.split import read_timestamps
from auformer.data.video import Video


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("tree")
    rs = np.random.RandomState(0)
    for v in ("vidB", "vidA"):
        d = root / v
        d.mkdir()
        for i in (2, 1, 10):  # natural sort check
            img = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{i:05d}.jpg"), img)
    return str(root)


def test_iter_image_files_natsorted(image_tree):
    keys = [k for k, _ in iter_image_files(image_tree)]
    assert keys == ["vidA/00001.jpg", "vidA/00002.jpg", "vidA/00010.jpg",
                    "vidB/00001.jpg", "vidB/00002.jpg", "vidB/00010.jpg"]


def test_create_image_store_roundtrip(image_tree, tmp_path):
    store_path = str(tmp_path / "imgs")
    keys = create_image_store(image_tree, store_path)
    assert len(keys) == 6
    s = FrameStore(store_path)
    raw = s.get("vidA/00001.jpg")
    with open(os.path.join(image_tree, "vidA", "00001.jpg"), "rb") as f:
        assert raw == f.read()
    assert os.path.isfile(store_path + "_keys_cache.p")


def test_write_label_store(tmp_path):
    p = str(tmp_path / "au")
    labels = {"v/1.jpg": np.array([1, 0] * 6, np.int8)}
    write_label_store(p, labels)
    s = FrameStore(p)
    got = np.frombuffer(s.get("v/1.jpg"), np.int8)
    np.testing.assert_array_equal(got, labels["v/1.jpg"])


@pytest.fixture(scope="module")
def small_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (48, 48))
    rs = np.random.RandomState(0)
    for _ in range(25):
        w.write((rs.rand(48, 48, 3) * 255).astype(np.uint8))
    w.release()
    return path


def test_video_wrapper(small_video):
    v = Video(small_video)
    assert v.num_frames == 25
    assert v.fps == pytest.approx(10.0)
    f = v.read_RGB(0)
    assert f.shape == (48, 48, 3)
    assert v.count_frames() == 25
    assert os.path.isfile(os.path.splitext(small_video)[0] + "meta.json")
    assert sum(1 for _ in v.frames()) == 25


def test_extract_timestamps(small_video):
    out = extract_timestamps(small_video)
    ts = read_timestamps(out, 25)
    assert len(ts) == 25
    assert (np.diff(ts) > 0).all()
    # 10 fps -> ~100 ms spacing
    assert np.median(np.diff(ts)) == pytest.approx(100.0, rel=0.05)
