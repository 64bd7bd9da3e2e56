"""EXACT shared-spectrogram (phase-mel) audio path (ops/phase_mel.py).

The dense sweep's default device-audio route: per-video phase-shifted
global mel tables + per-window reflect edge frames must reproduce the
reference's per-window host features (aff2compdataset.py:218-247 via
audio_host.reference_audio_features) for every window class — short
(video start), full 10 s, truncated by file end, and all hop-grid phases
an int-truncated 30 fps timestamp grid produces.
"""
import numpy as np

from auformer.core.config import Config
from auformer.nn import init_model
from auformer.ops import audio_host
from auformer.sweep import AvformerSweep

SLEN = 441000


def _window_plan(ts, wav):
    starts = np.zeros(len(ts), np.int32)
    n_valid = np.zeros(len(ts), np.int32)
    for i, t in enumerate(ts):
        offset, want = audio_host.audio_window_params(float(t))
        nv = max(min(want, len(wav) - min(offset, len(wav))), 0)
        starts[i] = SLEN + min(offset, len(wav))
        n_valid[i] = nv
    return starts, n_valid


def _wav_ext(wav):
    bucket = 60 * 44100
    l_pad = -(-len(wav) // bucket) * bucket
    ext = np.zeros(l_pad + 2 * SLEN + 512, np.float32)
    ext[SLEN:SLEN + len(wav)] = wav
    return ext


def test_phase_features_match_reference_host():
    """Feature-level parity vs the exact reference host mel for short,
    mid, truncated, and 30 fps multi-phase windows."""
    import jax.numpy as jnp

    from auformer.ops.phase_mel import (phase_mel_table, phase_plan,
                                        phase_window_features)

    rs = np.random.RandomState(3)
    wav = (rs.randn(11 * 44100) * 0.1).astype(np.float32)
    ts = np.array([120.0, 3000.0, 10500.0, 10800.0, 10950.0,
                   320 * 1000 / 30, 321 * 1000 / 30, 322 * 1000 / 30,
                   150 * 1000 / 30])
    starts, n_valid = _window_plan(ts, wav)
    plan = phase_plan(starts.astype(np.int64) - SLEN, n_valid)
    assert plan is not None
    phases, base, phase_sel = plan
    assert len(np.unique(phases)) >= 3  # the 30 fps grid spreads phases

    ext = _wav_ext(wav)
    pm = phase_mel_table(jnp.asarray(ext), jnp.asarray(phases))
    got = np.asarray(phase_window_features(
        jnp.asarray(ext), pm, jnp.asarray(starts), jnp.asarray(n_valid),
        jnp.asarray(base), jnp.asarray(phase_sel)))

    for i, t in enumerate(ts):
        o, nv = int(starts[i]) - SLEN, int(n_valid[i])
        a = wav[o:o + nv][None]
        ref = audio_host.reference_audio_features(a, 10, 10e-3, SLEN, 64)[0]
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-4)


def test_sweep_phase_audio_matches_reference_features():
    """End-to-end: the default device-audio dispatch routes through the
    phase-mel tables (30 fps timestamps) and produces the same logits as
    feeding the sweep the reference host features."""
    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    _, variables = init_model(cfg)
    sweep = AvformerSweep(cfg, variables)

    rs = np.random.RandomState(5)
    n = 5
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    wav = (rs.randn(12 * 44100) * 0.1).astype(np.float32)
    ts = np.array([k * 1000.0 / 30.0 for k in (4, 310, 320, 330, 350)])

    starts, n_valid = _window_plan(ts, wav)
    from auformer.ops.phase_mel import phase_plan
    assert phase_plan(starts.astype(np.int64) - SLEN, n_valid) is not None

    feats = np.zeros((n, 1, cfg.n_mels, cfg.mel_frames), np.float32)
    for i in range(n):
        o, nv = int(starts[i]) - SLEN, int(n_valid[i])
        a = wav[o:o + nv][None]
        feats[i] = audio_host.reference_audio_features(
            a, cfg.audio_len_secs, cfg.window_stride,
            cfg.sample_len_frames, cfg.n_mels)[0]

    want = sweep.sweep_video(frames, feats, batch=8)
    got = sweep.sweep_video_device_audio(frames, wav, ts, batch=8)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_many_phase_fallback_matches(monkeypatch):
    """Timestamps spraying >MAX_PHASES hop phases force the per-window
    fallback; both routes agree on the same video."""
    from auformer.ops import phase_mel

    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=4, dilation=2, image_size=32,
                 compute_dtype="float32", use_pallas=False)
    _, variables = init_model(cfg)
    sweep = AvformerSweep(cfg, variables)

    rs = np.random.RandomState(7)
    n = 6
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    wav = (rs.randn(11 * 44100) * 0.1).astype(np.float32)
    ts = np.array([5100.0 + 17.3 * k for k in range(n)])  # scattered phases

    starts, n_valid = _window_plan(ts, wav)
    offsets = starts.astype(np.int64) - SLEN
    phase_route = phase_mel.phase_plan(offsets, n_valid) is not None

    got = sweep.sweep_video_device_audio(frames, wav, ts, batch=8)
    # force the other route and compare
    monkeypatch.setattr(
        phase_mel, "phase_plan",
        (lambda *a, **k: None) if phase_route
        else phase_mel.phase_plan.__wrapped__
        if hasattr(phase_mel.phase_plan, "__wrapped__")
        else phase_mel.phase_plan)
    if phase_route:
        other = sweep.sweep_video_device_audio(frames, wav, ts, batch=8)
        np.testing.assert_allclose(got, other, rtol=2e-4, atol=2e-4)
    else:
        # already on the fallback: check it against reference features
        feats = np.zeros((n, 1, cfg.n_mels, cfg.mel_frames), np.float32)
        for i in range(n):
            o, nv = int(starts[i]) - SLEN, int(n_valid[i])
            feats[i] = audio_host.reference_audio_features(
                wav[o:o + nv][None], cfg.audio_len_secs, cfg.window_stride,
                cfg.sample_len_frames, cfg.n_mels)[0]
        want = sweep.sweep_video(frames, feats, batch=8)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
