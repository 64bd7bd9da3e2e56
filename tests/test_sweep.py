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


def test_bucket_size_adaptive():
    """Video-adaptive bucket sizing: short videos don't pad to the cap,
    sizes quantize to bucket_quantum, and the cap still binds."""
    sweep = object.__new__(AvformerSweep)
    # short video, big cap: one bucket of the quantized video length
    assert AvformerSweep._bucket_size(sweep, 1280, 2048) == 1280
    assert AvformerSweep._bucket_size(sweep, 1281, 2048) == 1536
    # longer than the cap: even split across ceil(n/batch) buckets
    assert AvformerSweep._bucket_size(sweep, 5000, 2048) == 1792  # 3 buckets
    # cap smaller than the quantum (CPU tests): exactly the old behavior
    assert AvformerSweep._bucket_size(sweep, 5, 8) == 8
    assert AvformerSweep._bucket_size(sweep, 13, 8) == 8
    # degenerate
    assert AvformerSweep._bucket_size(sweep, 0, 512) == 512
    # every size divides cleanly for an 8-way data mesh
    for n in (1280, 1281, 5000, 300):
        assert AvformerSweep._bucket_size(sweep, n, 2048) % 8 == 0


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


def test_run_inference_sweep_strict_parity_matches_default(tmp_path):
    """--strict_parity routes run_inference_sweep through the reference-
    exact per-window host audio loop (infer.py); with the left-aligned
    device mel now exact, both branches must produce identical submission
    rows and near-identical logits."""
    import dataclasses

    from auformer.data.fixtures import generate_synthetic_dataset
    from auformer.infer import run_inference_sweep
    from auformer.nn import init_model

    root = str(tmp_path / "root")
    label = str(tmp_path / "labels")
    generate_synthetic_dataset(root, label, n_videos=2, frames_per_video=16,
                               image_size=32, audio_secs=1.0,
                               splits=["test"])
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(tmp_path / "cache"),
                 model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32, batch_size=8,
                 compute_dtype="float32", use_pallas=False, host_threads=2)
    model, variables = init_model(cfg)
    got = run_inference_sweep(cfg, variables,
                              result_path=str(tmp_path / "r1"), bucket=8)
    strict = dataclasses.replace(cfg, strict_parity=True)
    ref = run_inference_sweep(strict, variables,
                              result_path=str(tmp_path / "r2"), bucket=8)
    np.testing.assert_allclose(got[:, :12], ref[:, :12],
                               rtol=2e-4, atol=2e-4)
    t1 = (tmp_path / "r1" / "au" / "vid001.txt").read_text()
    t2 = (tmp_path / "r2" / "au" / "vid001.txt").read_text()
    assert t1 == t2


def test_vformer_sweep_matches_clip_forward():
    """VformerSweep (VERDICT round-2 item 8): frame-feature-reuse inference
    for the visual-only flagship matches the clip-at-a-time forward on all
    21 logits."""
    from auformer.sweep import VformerSweep, make_sweep

    cfg = Config(model_name="vformer", modality="V", task="ALL",
                 n_frames=4, dilation=2, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    model, variables = init_model(cfg)
    sweep = make_sweep(cfg, variables)
    assert isinstance(sweep, VformerSweep)
    assert not sweep.needs_audio

    rs = np.random.RandomState(1)
    n = 12
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    got = sweep.sweep_video(frames, batch=8)
    assert got.shape == (n, 21)

    lf = cfg.label_frame
    for i in [0, 3, 7, n - 1]:
        clip = np.zeros((1, cfg.n_frames, 32, 32, 3), np.uint8)
        for k, src in enumerate(range(i - lf + cfg.dilation,
                                      i - lf + cfg.dilation * (cfg.n_frames + 1),
                                      cfg.dilation)):
            if 0 <= src < n:
                clip[0, k] = frames[src]
        out = np.asarray(model.apply(
            variables, {"clip": normalize_clip(clip)}, train=False))
        np.testing.assert_allclose(got[i], out[0], rtol=2e-4, atol=2e-4)


def test_vformer_run_inference_sweep_matches_batched(tmp_path):
    """run_inference_sweep serves vformer too: same 21-logit output and AU
    submission rows as the clip-batched path."""
    from auformer.data.fixtures import generate_synthetic_dataset
    from auformer.infer import run_inference, run_inference_sweep

    root = str(tmp_path / "root")
    label = str(tmp_path / "labels")
    generate_synthetic_dataset(root, label, n_videos=4, frames_per_video=20,
                               image_size=32, audio_secs=1.0)
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(tmp_path / "cache"),
                 model_name="vformer", modality="V", task="ALL",
                 n_frames=4, dilation=2, image_size=32, batch_size=8,
                 compute_dtype="float32", use_pallas=False, host_threads=2)
    model, variables = init_model(cfg)
    ref = run_inference(cfg, variables, result_path=str(tmp_path / "r1"))
    got = run_inference_sweep(cfg, variables,
                              result_path=str(tmp_path / "r2"), bucket=8)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    t1 = (tmp_path / "r1" / "au" / "vid003.txt").read_text()
    t2 = (tmp_path / "r2" / "au" / "vid003.txt").read_text()
    assert t1 == t2


def test_make_sweep_unknown_model_raises():
    import pytest as _pytest

    from auformer.sweep import make_sweep

    cfg = Config(model_name="i3d", modality="V", task="AU")
    with _pytest.raises(NotImplementedError):
        make_sweep(cfg, variables=None)


def test_shared_audio_mode_close_to_exact():
    """Opt-in shared-spectrogram audio: grid-snapped windows produce mel
    features near the exact per-window pipeline (interior columns match;
    only STFT boundary frames and the <=5 ms snap differ)."""
    from auformer.ops import audio_host
    from auformer.ops.audio import mel_spectrogram

    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    _, variables = init_model(cfg)
    sweep = AvformerSweep(cfg, variables)

    rs = np.random.RandomState(1)
    sr = 44100
    wav = (rs.randn(3 * sr) * 0.1).astype(np.float32)
    # timestamps chosen so int(ts*44.1) is a multiple of 441 (grid-aligned)
    ts = np.array([441 * 120 / 44.1, 441 * 180 / 44.1, 441 * 250 / 44.1])

    cols = sweep.shared_audio_plan(ts, len(wav))
    assert cols.shape == (3, 1001)
    mel = np.asarray(mel_spectrogram(wav[None]))[0]
    pad = np.zeros((64, 1001), np.float32)
    mp = np.concatenate([pad, mel, pad], axis=1)

    for i, t in enumerate(ts):
        offset, nsamp = audio_host.audio_window_params(float(t))
        nsamp = min(nsamp, len(wav) - offset)
        exact, _ = audio_host.reference_audio_features(
            wav[None, offset:offset + nsamp])
        got_power = mp[:, cols[i]]                      # (64, 1001) power
        db = audio_host.amplitude_to_db_host(got_power)
        got = (db - (-14.8)) / 19.895
        # interior columns (skip 3 boundary frames each side + the pad
        # junction) match the exact per-window pipeline
        t_valid = 1 + nsamp // 441
        sl = slice(1001 - t_valid + 3, 1001 - 3)
        np.testing.assert_allclose(got[:, sl], exact[0][:, sl],
                                   rtol=2e-3, atol=2e-2)


def test_sweep_device_audio_matches_reference_features():
    """Device-resident audio (whole-video wav shipped once, LEFT-ALIGNED
    window gather + mel fused on device) produces the same logits as
    feeding the sweep the REFERENCE host features — mel over the short
    loaded window, features left-padded (dataset.get_audio_feature via
    audio_host.reference_audio_features, aff2compdataset.py:227-247). The
    device STFT grid anchors at the true signal start and the end
    reflect-pad of short windows is emulated on device, so short windows
    (video start), full 10 s windows, AND windows truncated by the file
    end all match the reference path, not just an approximation of it."""
    from auformer.ops import audio_host

    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    _, variables = init_model(cfg)
    sweep = AvformerSweep(cfg, variables)

    rs = np.random.RandomState(3)
    n = 6
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    wav = (rs.randn(11 * 44100) * 0.1).astype(np.float32)  # 11 s
    # short window (video start), mid-length, full 10 s windows, and a
    # window truncated by the file end (offset + 10 s > len(wav))
    ts = np.array([120.0, 3000.0, 10500.0, 10800.0, 10900.0, 10950.0])

    feats = np.zeros((n, 1, cfg.n_mels, cfg.mel_frames), np.float32)
    for i, t in enumerate(ts):
        offset, want = audio_host.audio_window_params(float(t))
        nv = max(min(want, len(wav) - min(offset, len(wav))), 0)
        a = wav[offset:offset + nv][None] if nv else \
            np.zeros((1, cfg.sample_len_frames), np.float32)
        feats[i] = audio_host.reference_audio_features(
            a, cfg.audio_len_secs, cfg.window_stride,
            cfg.sample_len_frames, cfg.n_mels)[0]

    want_logits = sweep.sweep_video(frames, feats, batch=8)
    got = sweep.sweep_video_device_audio(frames, wav, ts, batch=8)
    np.testing.assert_allclose(got, want_logits, rtol=2e-4, atol=2e-4)


def test_sweep_shared_audio_runs_end_to_end():
    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    _, variables = init_model(cfg)
    sweep = AvformerSweep(cfg, variables)
    rs = np.random.RandomState(2)
    n = 10
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    wav = (rs.randn(2 * 44100) * 0.1).astype(np.float32)
    ts = np.arange(n) * 33.367 + 500.0
    out = sweep.sweep_video_shared_audio(frames, wav, ts, batch=8)
    assert out.shape == (n, 12)
    assert np.isfinite(out).all()


def test_single_frame_sweep_matches_clip_forward():
    """SingleFrameSweep == the model's own single-frame clip forward."""
    from auformer.ops.preprocess import normalize_clip
    from auformer.sweep import SingleFrameSweep

    cfg = Config(model_name="sformer", modality="V", task="AU",
                 n_frames=1, dilation=1, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    model, variables = init_model(cfg)
    sweep = SingleFrameSweep(cfg, variables)

    rs = np.random.RandomState(1)
    n = 11  # exercises the pad tail (bucket 8 -> 8 + 3-pad-to-8)
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    got = sweep.sweep_video(frames, batch=8)
    assert got.shape == (n, 21)
    ref = np.asarray(model.apply(
        variables, {"clip": normalize_clip(frames[:, None])}, train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("model_name", ["sformer", "van"])
def test_single_frame_run_inference_sweep_matches_batched(tmp_path,
                                                          model_name):
    """run_inference_sweep serves the single-frame zoo models: same
    21-logit output and submission rows as the clip-batched path
    (VERDICT round-3 item 9: the fast submission path is universal for
    models with no temporal window)."""
    from auformer.data.fixtures import generate_synthetic_dataset
    from auformer.infer import run_inference, run_inference_sweep

    root = str(tmp_path / "root")
    label = str(tmp_path / "labels")
    generate_synthetic_dataset(root, label, n_videos=4, frames_per_video=12,
                               image_size=32, audio_secs=1.0)
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(tmp_path / "cache"),
                 model_name=model_name, modality="V", task="ALL",
                 n_frames=1, dilation=1, image_size=32, batch_size=8,
                 compute_dtype="float32", use_pallas=False, host_threads=2)
    model, variables = init_model(cfg)
    ref = run_inference(cfg, variables, result_path=str(tmp_path / "r1"))
    got = run_inference_sweep(cfg, variables,
                              result_path=str(tmp_path / "r2"), bucket=8)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    t1 = (tmp_path / "r1" / "au" / "vid003.txt").read_text()
    t2 = (tmp_path / "r2" / "au" / "vid003.txt").read_text()
    assert t1 == t2
