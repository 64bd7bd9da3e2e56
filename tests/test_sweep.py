"""Frame-feature-cached sweep == clip-at-a-time avformer forward."""
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.nn import init_model
from auformer.ops.preprocess import normalize_clip
from auformer.sweep import AvformerSweep


def test_sweep_matches_clip_forward():
    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    model, variables = init_model(cfg)
    sweep = AvformerSweep(cfg, variables)

    rs = np.random.RandomState(0)
    n = 12
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    audio = rs.randn(n, 1, 64, 1001).astype(np.float32)

    got = sweep.sweep_video(frames, audio, batch=8)
    assert got.shape == (n, 12)

    # reference: assemble each clip window explicitly and run the model
    lf = cfg.label_frame
    for i in [0, 3, 7, n - 1]:
        clip = np.zeros((1, cfg.n_frames, 32, 32, 3), np.uint8)
        for k, src in enumerate(range(i - lf + cfg.dilation,
                                      i - lf + cfg.dilation * (cfg.n_frames + 1),
                                      cfg.dilation)):
            if 0 <= src < n:
                clip[0, k] = frames[src]
        out = np.asarray(model.apply(
            variables, {"clip": normalize_clip(clip),
                        "audio_features": audio[i:i + 1]}, train=False))
        np.testing.assert_allclose(got[i], out[0, :12], rtol=2e-4, atol=2e-4)


def test_window_indices():
    cfg = Config(n_frames=4, dilation=2)
    sweep = object.__new__(AvformerSweep)
    sweep.cfg = cfg
    idx = AvformerSweep.window_indices(sweep, 10)
    assert idx.shape == (10, 4)
    # label frame 7, L=8: range(7-8+2, 7-8+2*5, 2) = [1, 3, 5, 7]
    np.testing.assert_array_equal(idx[7], [1, 3, 5, 7])
    # frame 0: all history out of range except the labeled frame
    np.testing.assert_array_equal(idx[0], [10, 10, 10, 0])


def test_run_inference_sweep_matches_batched(tmp_path):
    """The dense-sweep inference entry produces the same AU predictions and
    submission rows as the clip-batched path."""
    from auformer.data.fixtures import generate_synthetic_dataset
    from auformer.infer import run_inference, run_inference_sweep
    from auformer.nn import init_model

    root = str(tmp_path / "root")
    label = str(tmp_path / "labels")
    generate_synthetic_dataset(root, label, n_videos=4, frames_per_video=20,
                               image_size=32, audio_secs=1.0)
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(tmp_path / "cache"),
                 model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32, batch_size=8,
                 compute_dtype="float32", use_pallas=False, host_threads=2)
    model, variables = init_model(cfg)
    ref = run_inference(cfg, variables, result_path=str(tmp_path / "r1"))
    got = run_inference_sweep(cfg, variables,
                              result_path=str(tmp_path / "r2"), bucket=8)
    np.testing.assert_allclose(got[:, :12], ref[:, :12],
                               rtol=2e-4, atol=2e-4)
    t1 = (tmp_path / "r1" / "au" / "vid003.txt").read_text()
    t2 = (tmp_path / "r2" / "au" / "vid003.txt").read_text()
    assert t1 == t2
