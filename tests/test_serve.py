"""Serving pipeline test: streamed predictions match run_inference."""
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.data.fixtures import generate_synthetic_dataset
from auformer.data.testset import Aff2TestDataset
from auformer.infer import run_inference
from auformer.nn import init_model
from auformer.serve import serve_benchmark, stream_predictions


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    base = tmp_path_factory.mktemp("serve")
    root = str(base / "root")
    label = str(base / "labels")
    generate_synthetic_dataset(root, label, n_videos=4, frames_per_video=24,
                               image_size=32, audio_secs=1.0)
    return Config(root=root, lmdb_label_dir=label,
                  cache_dir=str(base / "cache"), exp_dir=str(base / "exp"),
                  model_name="vformer", modality="V", task="AU",
                  n_frames=2, dilation=2, image_size=32, batch_size=8,
                  compute_dtype="float32", use_pallas=False, host_threads=2)


def test_stream_matches_batch_inference(cfg, tmp_path):
    model, variables = init_model(cfg)
    ref = run_inference(cfg, variables, result_path=str(tmp_path / "r"))
    streamed = np.zeros_like(ref)
    vids_seen = set()
    for idxs, logits, vids in stream_predictions(cfg, variables):
        streamed[idxs] = logits
        vids_seen.update(vids)
    np.testing.assert_allclose(streamed, ref, rtol=1e-5, atol=1e-6)
    assert "vid003" in vids_seen


def test_serve_benchmark_counts(cfg):
    _, variables = init_model(cfg)
    stats = serve_benchmark(cfg, variables, batch_size=8)
    assert stats["clips"] == 24  # one test video
    assert stats["clips_per_sec"] > 0


def test_sweep_serve_benchmark_device_audio(tmp_path_factory):
    """End-to-end sweep serving (device-resident per-video audio) counts
    every test clip and produces finite throughput on the avformer path."""
    from auformer.data.fixtures import generate_synthetic_dataset
    from auformer.serve import sweep_serve_benchmark

    base = tmp_path_factory.mktemp("sweep_serve")
    root, label = str(base / "root"), str(base / "labels")
    generate_synthetic_dataset(root, label, n_videos=4, frames_per_video=20,
                               image_size=32, audio_secs=1.0)
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(base / "cache"), exp_dir=str(base / "exp"),
                 model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32, batch_size=8,
                 compute_dtype="float32", use_pallas=False, host_threads=2)
    _, variables = init_model(cfg)
    stats = sweep_serve_benchmark(cfg, variables, bucket=8)
    assert stats["clips"] == 20  # one test video (vid003)
    assert stats["clips_per_sec"] > 0
