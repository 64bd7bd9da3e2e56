"""Packed cross-video serving pipeline: parity with the per-video route.

The packed pipeline (auformer/packed.py) replaces the reference's batch-1
submission loop (test_aff2.py:82-117) with fixed-size buckets of clips
drawn from several videos; these tests pin it to the per-video
serve.sweep_stream route, which is itself goldened against run_inference.
"""
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.data.fixtures import generate_synthetic_dataset
from auformer.nn import init_model
from auformer.packed import FrameArena, packed_sweep_stream
from auformer.serve import sweep_stream


def _make_cfg(base, n_videos=5, frames=21, audio_secs=1.0, fps=30.0):
    root, label = str(base / "root"), str(base / "labels")
    generate_synthetic_dataset(root, label, n_videos=n_videos,
                               frames_per_video=frames, image_size=32,
                               audio_secs=audio_secs, fps=fps,
                               splits=["test"])
    return Config(root=root, lmdb_label_dir=label,
                  cache_dir=str(base / "cache"), exp_dir=str(base / "exp"),
                  model_name="avformer", modality="A;V", task="AU",
                  n_frames=4, dilation=2, image_size=32, batch_size=8,
                  compute_dtype="float32", use_pallas=False, host_threads=2)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    base = tmp_path_factory.mktemp("packed")
    # audio shorter than video: exercises the file-length clamp and
    # zero-valid windows at the video tails inside packed buckets
    cfg = _make_cfg(base, n_videos=5, frames=21, audio_secs=1.0)
    _, variables = init_model(cfg)
    ref = {}
    for vid_idx, video_id, out in sweep_stream(cfg, variables,
                                               decode_worker=False):
        ref[video_id] = (vid_idx, out)
    assert len(ref) == 5
    return cfg, variables, ref


def test_packed_matches_per_video(setup):
    """bucket=16 over 5x21 clips: cross-video joins, partial flush."""
    cfg, variables, ref = setup
    seen = {}
    for vid_idx, video_id, out in packed_sweep_stream(
            cfg, variables, bucket=16, decode_worker=False):
        seen[video_id] = (vid_idx, out)
    assert set(seen) == set(ref)
    for vid in ref:
        np.testing.assert_array_equal(seen[vid][0], ref[vid][0])
        np.testing.assert_allclose(seen[vid][1], ref[vid][1],
                                   rtol=2e-3, atol=1e-3)


def test_packed_single_giant_bucket(setup):
    """bucket larger than the whole fixture: one flush-dispatched bucket
    packing every video."""
    cfg, variables, ref = setup
    seen = {}
    for vid_idx, video_id, out in packed_sweep_stream(
            cfg, variables, bucket=512, decode_worker=False):
        seen[video_id] = (vid_idx, out)
    assert set(seen) == set(ref)
    for vid in ref:
        np.testing.assert_allclose(seen[vid][1], ref[vid][1],
                                   rtol=2e-3, atol=1e-3)


def test_packed_with_decode_worker_shm(setup):
    """Explicit DecodeWorker: the mmap'd shared-frame-ring slice protocol
    end to end (attach_arena -> request_slice -> slice_result)."""
    from auformer.serve import DecodeWorker

    cfg, variables, ref = setup
    worker = DecodeWorker(cfg)
    try:
        seen = {}
        for vid_idx, video_id, out in packed_sweep_stream(
                cfg, variables, bucket=16, decode_worker=worker):
            seen[video_id] = (vid_idx, out)
        assert set(seen) == set(ref)
        for vid in ref:
            np.testing.assert_allclose(seen[vid][1], ref[vid][1],
                                       rtol=2e-3, atol=1e-3)
    finally:
        worker.close()


def test_packed_phase_fallback_video(tmp_path_factory):
    """A video whose jittered timestamps need >MAX_PHASES hop-grid phases
    dispatches alone through the per-video device-audio route; its
    neighbors still pack. Output parity holds for all videos."""
    base = tmp_path_factory.mktemp("packed_fb")
    cfg = _make_cfg(base, n_videos=3, frames=21, audio_secs=1.0)
    # rewrite vid001's timestamps with per-frame jitter: offsets hit ~21
    # distinct phases mod 441, beyond MAX_PHASES=8
    import os
    rs = np.random.RandomState(7)
    ts = np.arange(21) * 1000.0 / 30.0 + rs.uniform(0, 9.9, 21)
    ts[0] = 0.0
    with open(os.path.join(cfg.root, "vid001_video_ts.txt"), "w") as f:
        f.write("# timestamp format v2\n")
        for t in ts:
            f.write(f"{t:.6f}\n")
    _, variables = init_model(cfg)
    ref = {}
    for vid_idx, video_id, out in sweep_stream(cfg, variables,
                                               decode_worker=False):
        ref[video_id] = out
    seen = {}
    for vid_idx, video_id, out in packed_sweep_stream(
            cfg, variables, bucket=16, decode_worker=False):
        seen[video_id] = out
    assert set(seen) == set(ref) and len(ref) == 3
    for vid in ref:
        np.testing.assert_allclose(seen[vid], ref[vid],
                                   rtol=2e-3, atol=1e-3)


def test_packed_max_clips_cut(setup):
    """max_clips cuts whole videos upfront, same as the per-video route."""
    cfg, variables, ref = setup
    seen = []
    for vid_idx, video_id, out in packed_sweep_stream(
            cfg, variables, bucket=16, max_clips=30, decode_worker=False):
        seen.append(video_id)
    assert len(seen) == 2  # 21 + 21 >= 30


def test_frame_arena_ring():
    a = FrameArena(10, 2, 2)
    b0 = a.alloc(0, 4)
    a.buf[b0:b0 + 4] = np.arange(4, dtype=np.uint8)[:, None, None, None]
    b1 = a.alloc(4, 4)
    a.buf[b1:b1 + 4] = np.arange(4, 8, dtype=np.uint8)[:, None, None, None]
    got = a.chunk(1, 7)
    np.testing.assert_array_equal(got[:, 0, 0, 0],
                                  np.arange(1, 7, dtype=np.uint8))
    # contiguous range -> zero-copy view of the ring buffer
    assert got.base is not None
    a.release_below(6)
    b2 = a.alloc(8, 4)  # wraps: cursor 8+4 > 10 -> base 0
    assert b2 == 0
    a.buf[b2:b2 + 4] = np.arange(8, 12, dtype=np.uint8)[:, None, None, None]
    # wrapped range assembles a copy
    got = a.chunk(6, 10)
    np.testing.assert_array_equal(got[:, 0, 0, 0],
                                  np.array([6, 7, 8, 9], np.uint8))
    # live backlog would be overwritten -> hard error, not corruption
    with pytest.raises(RuntimeError):
        a.alloc(12, 8)


def test_frame_arena_shm_backing(tmp_path):
    import os
    a = FrameArena(4, 2, 2, shm=True)
    assert a.mmap_path is not None and os.path.exists(a.mmap_path)
    a.buf[0, 0, 0, 0] = 7
    other = np.memmap(a.mmap_path, np.uint8, mode="r", shape=(4, 2, 2, 3))
    assert other[0, 0, 0, 0] == 7
    path = a.mmap_path
    a.close()
    assert not os.path.exists(path)
