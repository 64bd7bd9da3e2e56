"""Golden tests for the mel-spectrogram frontend.

The golden is built from torch.stft (torch CPU is available; torchaudio is
not) plus the documented torchaudio-0.6 formulas for the mel filterbank and
AmplitudeToDB — an implementation independent from both auformer paths.
"""
import numpy as np
import pytest
import torch

from auformer.ops import audio as A
from auformer.ops import audio_host as AH


def torch_golden_power_spec(x: np.ndarray) -> np.ndarray:
    """torch.stft with the exact reference MelSpectrogram arguments."""
    xt = torch.from_numpy(x)
    win = torch.hann_window(A.WIN_LENGTH, periodic=True)
    spec = torch.stft(xt, n_fft=A.N_FFT, hop_length=A.HOP_LENGTH,
                      win_length=A.WIN_LENGTH, window=win, center=True,
                      pad_mode="reflect", normalized=False, onesided=True,
                      return_complex=True)
    return (spec.real ** 2 + spec.imag ** 2).numpy()  # (F, T)


@pytest.fixture(scope="module")
def wave():
    rs = np.random.RandomState(42)
    t = np.arange(44100, dtype=np.float32) / 44100.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 3000 * t)
         + 0.05 * rs.randn(44100)).astype(np.float32)
    return x


def test_window_matches_torch():
    ours = A.hann_window_periodic(A.WIN_LENGTH)
    ref = torch.hann_window(A.WIN_LENGTH, periodic=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_host_power_spec_vs_torch(wave):
    golden = torch_golden_power_spec(wave)                      # (F, T)
    ours = AH.stft_power(wave[None])[0]                         # (F, T)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-6)


def test_device_power_spec_vs_host(wave):
    host = AH.stft_power(wave[None])[0]                         # (F, T)
    dev = np.asarray(A.power_spectrogram(wave[None]))[0].T      # (T,F)->(F,T)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("n", [44100, 441000, 12345, 441])
def test_power_spec_methods_agree(n):
    """matmul (default), conv, and gather+rfft lowerings agree; the matmul
    frame assembly (hop-aligned blocks + window-support-trimmed basis)
    is checked at awkward lengths incl. a single-frame tail."""
    rs = np.random.RandomState(n)
    x = (rs.randn(2, n) * 0.3).astype(np.float32)
    mm = np.asarray(A.power_spectrogram(x, method="matmul"))
    cv = np.asarray(A.power_spectrogram(x, method="conv"))
    ft = np.asarray(A.power_spectrogram(x, method="fft"))
    assert mm.shape == cv.shape == ft.shape == (2, 1 + n // 441, 513)
    np.testing.assert_allclose(mm, cv, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(mm, ft, rtol=1e-4, atol=1e-4)


def test_mel_fb_properties():
    fb = A.mel_filterbank()
    assert fb.shape == (513, 64)
    assert fb.min() >= 0.0
    # triangles: every filter has positive mass and a single peak
    assert (fb.sum(axis=0) > 0).all()
    # HTK break points: first filter starts at 0 Hz bin
    assert fb[0, :].max() == 0.0  # DC bin has zero weight (f_min=0 triangle)


def test_amplitude_to_db_floor():
    x = np.zeros((1, 64, 10), np.float32)
    x[0, 0, 0] = 1.0  # 0 dB peak
    db = np.asarray(A.amplitude_to_db(x))
    assert db.max() == pytest.approx(0.0)
    assert db.min() == pytest.approx(-80.0)  # floored, not -100


def test_full_frontend_matches_host_reference(wave):
    """Device kernel == exact host reference for a full 10 s window."""
    full = np.tile(wave, 10).astype(np.float32)[None]           # (1, 441000)
    feats_host, _ = AH.reference_audio_features(full)           # (1, 64, 1001)
    feats_dev = np.asarray(A.audio_frontend(full))              # (1,1,64,1001)
    assert feats_dev.shape == (1, 1, 64, 1001)
    np.testing.assert_allclose(feats_dev[0], feats_host, rtol=1e-3, atol=2e-3)


def test_short_window_feature_padding():
    """Short windows: features right-aligned, pad at the -80dB floor after
    normalize (reference left-pads the feature map before AmpToDB)."""
    rs = np.random.RandomState(0)
    short = rs.randn(1, 44100).astype(np.float32) * 0.1
    feats, padded_audio = AH.reference_audio_features(short)
    assert feats.shape == (1, 64, 1001)
    assert padded_audio.shape == (1, 441000)
    # left-pad of raw audio is zeros
    assert np.all(padded_audio[:, :441000 - 44100] == 0)
    t_valid = 1 + 44100 // A.HOP_LENGTH
    pad_cols = feats[0, :, :1001 - t_valid]
    # padded columns all sit at the same floor value
    assert np.allclose(pad_cols, pad_cols[0, 0])


def test_wav_roundtrip(tmp_path):
    rs = np.random.RandomState(1)
    x = (rs.rand(1, 22050).astype(np.float32) - 0.5)
    p = str(tmp_path / "t.wav")
    AH.write_wav(p, x)
    y, sr = AH.load_wav(p)
    assert sr == 44100 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32768 + 1e-6)
    # offset/num_samples window
    y2, _ = AH.load_wav(p, offset=1000, num_samples=500)
    np.testing.assert_allclose(y2, y[:, 1000:1500], atol=1e-7)


def test_audio_frontend_mel_bf16_close():
    """Opt-in bf16 DFT conv: ~1e-2 relative spectrum accuracy -> small
    post-dB error vs the exact f32 frontend (ops/audio.py mel_bf16)."""
    import numpy as np

    from auformer.ops.audio import audio_frontend

    rs = np.random.RandomState(0)
    audio = (rs.randn(2, 44100) * 0.1).astype(np.float32)
    exact = np.asarray(audio_frontend(audio, out_frames=101))
    fast = np.asarray(audio_frontend(audio, out_frames=101, mel_bf16=True))
    assert fast.shape == exact.shape
    # dB-domain error stays small (values span ~[-5, 5] post-normalize)
    assert np.abs(fast - exact).mean() < 0.02
    assert np.abs(fast - exact).max() < 0.6


def test_audio_window_params_batch_matches_scalar():
    """Vectorized window planning is element-wise identical to the scalar
    reference math (aff2compdataset.py:218-226) across edge cases."""
    from auformer.ops.audio_host import (audio_window_params,
                                         audio_window_params_batch)

    ts = np.array([0.0, 1.0, 33.3, 120.0, 1000.0 / 30 * 7, 9999.9,
                   10000.0, 10500.0, 3_600_000.0, 220500 / 44.1])
    off_b, n_b = audio_window_params_batch(ts)
    for i, t in enumerate(ts):
        off_s, n_s = audio_window_params(float(t))
        assert off_b[i] == off_s and n_b[i] == n_s, (t, off_b[i], off_s)
