"""Log-mel spectrogram audio frontend (TPU, jittable).

Reproduces the reference audio feature pipeline — torchaudio 0.6
``MelSpectrogram(44100, n_mels=64, n_fft=1024, win_length=882, hop_length=441,
hann)`` + ``AmplitudeToDB('power', 80)`` + ``Normalize(-14.8, 19.895)``
(reference aff2compdataset.py:47-68, clip_transforms.py:96-108) — as a single
fused XLA computation:

    reflect-center pad -> frame gather -> windowed rfft -> |.|^2
    -> HTK mel filterbank matmul (MXU) -> power-to-dB with per-sample
    80 dB floor -> affine normalize

Semantics replicated exactly (for full-length windows):
  * hann window is *periodic* (torch.hann_window default) and zero-padded to
    n_fft centered (left pad (n_fft - win)//2), as torch.stft does
  * STFT is center-padded by n_fft//2 with reflect mode, onesided,
    not normalized, power 2.0
  * mel scale is HTK (2595 log10(1+f/700)), f_min 0, f_max sr//2,
    triangular filters, no norm (torchaudio create_fb_matrix defaults)
  * dB conversion: 10*log10(clamp(x, 1e-10)), then floored at
    (per-sample max - 80) — the reference applies AmplitudeToDB per sample,
    so the batched kernel reduces the max over each sample independently

The reference computes the mel on the *true-length* audio and left-pads the
feature map to 1001 frames (aff2compdataset.py:234-238). For windows shorter
than 10 s this kernel instead consumes a left-zero-padded fixed 441000-sample
buffer; the handful of frames at the zero/signal junction differ from the
reference (zeros instead of reflect padding). ``auformer.ops.audio_host``
provides the variable-length exact path used by the strict-parity dataset.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 44100
N_FFT = 1024
WIN_LENGTH = 882
HOP_LENGTH = 441
N_MELS = 64
TOP_DB = 80.0
AMIN = 1e-10
SPEC_MEAN = -14.8
SPEC_STD = 19.895


def hann_window_periodic(win_length: int) -> np.ndarray:
    """torch.hann_window(periodic=True): 0.5*(1 - cos(2 pi n / N))."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def padded_window(win_length: int = WIN_LENGTH, n_fft: int = N_FFT) -> np.ndarray:
    """Window zero-padded to n_fft, centered (torch.stft behavior)."""
    w = hann_window_periodic(win_length)
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[left:left + win_length] = w
    return out


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_freqs: int = N_FFT // 2 + 1,
                   f_min: float = 0.0,
                   f_max: float | None = None,
                   n_mels: int = N_MELS,
                   sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """HTK triangular filterbank, shape (n_freqs, n_mels), norm=None.

    Matches torchaudio 0.6 ``create_fb_matrix``: FFT bin centers are
    linspace(0, sr//2, n_freqs); mel break points are linspace in HTK mel
    space with n_mels+2 points.
    """
    if f_max is None:
        f_max = float(sample_rate // 2)
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                            # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]               # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def num_frames(n_samples: int, hop_length: int = HOP_LENGTH) -> int:
    """Frame count of a center-padded STFT: 1 + n // hop."""
    return 1 + n_samples // hop_length


@functools.lru_cache(maxsize=4)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed DFT basis, shape (n_fft, 2*(n_fft//2+1)).

    Column layout [cos_0..cos_F | sin_0..sin_F]: a matmul of framed audio
    with this basis produces the real/imag STFT banks in one MXU pass.
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = padded_window(win_length, n_fft).astype(np.float64)[:, None]
    cos = np.cos(ang) * w
    sin = -np.sin(ang) * w
    return np.concatenate([cos, sin], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_filters(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed DFT basis as conv filters: (n_fft, 1, 2*(n_fft//2+1))."""
    n_freqs = n_fft // 2 + 1
    return _dft_basis(n_fft, win_length).reshape(n_fft, 1, 2 * n_freqs)


def power_spectrogram(audio: jax.Array,
                      n_fft: int = N_FFT,
                      hop_length: int = HOP_LENGTH,
                      win_length: int = WIN_LENGTH,
                      method: str = "matmul",
                      conv_dtype=jnp.float32,
                      precision=None) -> jax.Array:
    """(..., L) float32 -> (..., T, n_fft//2+1) power spectrogram.

    method='matmul' (default): frames are assembled from hop-aligned
    contiguous row blocks (pure reshape + slice + concat — the window
    support spans at most ceil((left+win)/hop) hop rows) and the STFT is
    ONE dense (B*T, win) x (win, 2F) MXU matmul with the windowed DFT
    basis trimmed to the window support (win=882 of n_fft=1024 rows are
    nonzero). ~2.5x faster than method='conv' (the strided-conv lowering
    pays an implicit-im2col at 29% MXU efficiency plus a layout
    relayout — round-3 profiler trace, docs/DESIGN.md) and ~25x faster
    than the gather+rfft lowering (method='fft', kept for cross-checks).

    Precision on TPU: with ``precision=None`` XLA contracts f32 inputs at
    DEFAULT precision — ONE bf16 pass with f32 accumulation (~1e-3
    relative spectrum accuracy; the round-3 trace showed the old f32 conv
    was already lowered this way). Pass ``precision='highest'`` for true
    f32 (6-pass) on parity-strict paths; CPU is always true f32.
    ``conv_dtype=jnp.bfloat16`` additionally casts the operands (the
    ``mel_bf16`` fast path).
    """
    pad = n_fft // 2
    lead = audio.shape[:-1]
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
                mode="reflect")
    n = audio.shape[-1]
    t = num_frames(n, hop_length)
    n_freqs = n_fft // 2 + 1
    left = (n_fft - win_length) // 2
    if method == "matmul":
        # frame k covers padded samples [k*hop + left, k*hop + left + win):
        # split into hop-aligned blocks; block r of frame k is row k+r,
        # cols [max(left - r*hop, 0), min(left + win - r*hop, hop))
        r_last = (left + win_length - 1) // hop_length
        rows = t + r_last
        need = rows * hop_length
        have = x.shape[-1]
        if need > have:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - have)])
        x3 = x[..., :need].reshape(-1, rows, hop_length)
        blocks = []
        for r in range(r_last + 1):
            c0 = max(left - r * hop_length, 0)
            c1 = min(left + win_length - r * hop_length, hop_length)
            blocks.append(x3[:, r:r + t, c0:c1])
        frames = jnp.concatenate(blocks, axis=-1)    # (B', T, win)
        basis = jnp.asarray(
            _dft_basis(n_fft, win_length)[left:left + win_length])
        spec = jax.lax.dot_general(
            frames.astype(conv_dtype), basis.astype(conv_dtype),
            (((frames.ndim - 1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)      # (B', T, 2F)
        power = spec[..., :n_freqs] ** 2 + spec[..., n_freqs:] ** 2
        return power.reshape(*lead, t, n_freqs)
    if method == "conv":
        filt = jnp.asarray(_dft_filters(n_fft, win_length))
        xf = x.reshape(-1, x.shape[-1], 1).astype(conv_dtype)  # NWC
        spec = jax.lax.conv_general_dilated(
            xf, filt.astype(conv_dtype), window_strides=(hop_length,),
            padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
            precision=precision,
            preferred_element_type=jnp.float32)      # (B', T, 2F)
        spec = spec[:, :t]
        power = spec[..., :n_freqs] ** 2 + spec[..., n_freqs:] ** 2
        return power.reshape(*lead, t, n_freqs)
    # reference lowering: frame gather + rfft
    window = jnp.asarray(padded_window(win_length, n_fft))
    idx = (np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :])
    frames = x[..., idx] * window                   # (..., T, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)


def mel_spectrogram(audio: jax.Array,
                    n_mels: int = N_MELS,
                    sample_rate: int = SAMPLE_RATE,
                    n_fft: int = N_FFT,
                    hop_length: int = HOP_LENGTH,
                    win_length: int = WIN_LENGTH,
                    conv_dtype=jnp.float32,
                    precision=None) -> jax.Array:
    """(..., L) -> (..., n_mels, T) mel power spectrogram (torchaudio layout)."""
    spec = power_spectrogram(audio, n_fft, hop_length, win_length,
                             conv_dtype=conv_dtype,
                             precision=precision)        # (..., T, F)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, 0.0, None, n_mels, sample_rate))
    mel = jnp.einsum("...tf,fm->...mt", spec, fb,
                     preferred_element_type=jnp.float32)
    return mel


def amplitude_to_db(x: jax.Array,
                    top_db: float = TOP_DB,
                    amin: float = AMIN,
                    sample_axes: tuple[int, ...] = (-2, -1)) -> jax.Array:
    """Power -> dB with per-sample floor at (max - top_db).

    torchaudio 0.6 AmplitudeToDB('power', 80): ref_value=1.0 so the
    db_multiplier term vanishes; the top_db clamp is relative to the max of
    the whole (per-sample) tensor.
    """
    db = 10.0 * jnp.log10(jnp.maximum(x, amin))
    mx = jnp.max(db, axis=sample_axes, keepdims=True)
    return jnp.maximum(db, mx - top_db)


def normalize_spec(x: jax.Array,
                   mean: float = SPEC_MEAN,
                   std: float = SPEC_STD) -> jax.Array:
    return (x - mean) / std


@functools.partial(jax.jit,
                   static_argnames=("n_mels", "out_frames", "mel_bf16",
                                    "precision", "use_pallas",
                                    "left_aligned"))
def audio_frontend(audio: jax.Array,
                   feature_len: jax.Array | None = None,
                   n_mels: int = N_MELS,
                   out_frames: int = 1001,
                   mel_bf16: bool = False,
                   precision: str | None = None,
                   use_pallas: bool = False,
                   left_aligned: bool = False) -> jax.Array:
    """Full fused frontend: (B, L) raw audio -> (B, 1, n_mels, out_frames).

    ``feature_len`` (B,) int32 — number of *valid* mel frames per sample
    (1 + true_samples//hop). Frames are right-aligned into ``out_frames``
    and dead columns zeroed before the dB step so short windows reproduce the
    reference's left-pad-then-AmpToDB behavior: padded columns sit at the
    -80 dB-from-max floor, i.e. exactly what AmpToDB does to zeros
    (aff2compdataset.py:234-241).

    ``left_aligned=True``: the valid samples start at buffer position 0
    (so the STFT grid and the start reflect-pad anchor at the true signal
    start, exactly like the reference's mel over a short window) and the
    valid mel frames are therefore the FIRST ``feature_len``; they are
    moved to the right edge of ``out_frames`` (a per-sample column gather)
    before masking + dB, matching the reference's left-pad-features
    layout. Used by the device-audio sweep (sweep.py).

    ``use_pallas``: route to the fully-fused Pallas kernel
    (ops/audio_pallas.py) when the backend is TPU, the shape is the fixed
    serving buffer (L=441000, out_frames=1001), and no explicit precision
    override is requested. SILENT fallback otherwise (mirrors
    ops/attention.py::fused_attention). The kernel's numerics class equals
    the TPU default (bf16-contracted DFT, f32 elsewhere). Opt-in only:
    measured at parity with this XLA path on v5e (17.8 vs 17.1 ms per
    512-clip bucket, 2026-08-17) — see ops/audio_pallas.py docstring.
    """
    if (use_pallas and precision is None and not left_aligned
            and audio.ndim == 2 and audio.shape[-1] == 441000
            and out_frames == 1001
            and jax.default_backend() == "tpu"):
        from .audio_pallas import mel_frontend_pallas
        return mel_frontend_pallas(audio, feature_len, n_mels=n_mels)
    # mel_bf16 (opt-in): casts the DFT operands to bf16 — on TPU this is
    # nearly the same numerics as the default (XLA contracts f32 at
    # DEFAULT precision = one bf16 pass; see power_spectrogram), but it
    # also shrinks CPU-side compute. precision='highest' forces true f32
    # on TPU for parity-strict runs.
    mel = mel_spectrogram(audio, n_mels=n_mels,
                          conv_dtype=jnp.bfloat16 if mel_bf16
                          else jnp.float32,
                          precision=precision)              # (B, n_mels, T)
    t = mel.shape[-1]
    if t > out_frames:
        # left_aligned: valid frames sit at the START of the grid
        mel = mel[..., :out_frames] if left_aligned else mel[..., -out_frames:]
        t = out_frames
    if t < out_frames:
        pad = (0, out_frames - t) if left_aligned else (out_frames - t, 0)
        mel = jnp.pad(mel, ((0, 0), (0, 0), pad))
    if feature_len is not None:
        cols = jnp.arange(out_frames)[None, None, :]
        if left_aligned:
            # move the first feature_len frames to the right edge: a
            # per-row uniform shift, expressed as a one-hot einsum so the
            # MXU does it (XLA fuses the one-hot into the contraction;
            # the take_along_axis gather this replaces cost ~52 ms/step
            # inside the train program — round-5 trace). Exact: one
            # weight of 1.0 per output element.
            src = (jnp.arange(out_frames)[None, :]
                   - (out_frames - feature_len)[:, None])  # (B, T_out)
            oh = jax.nn.one_hot(jnp.clip(src, 0, out_frames - 1),
                                out_frames, dtype=mel.dtype)  # (B, To, Ti)
            shifted = jnp.einsum('bot,bmt->bmo', oh, mel)
            mel = jnp.where(src[:, None, :] >= 0, shifted, 0.0)
        else:
            valid = cols >= (out_frames - feature_len[:, None, None])
            mel = jnp.where(valid, mel, 0.0)
    db = amplitude_to_db(mel)
    out = normalize_spec(db)
    return out[:, None, :, :]


def reflect_end_patch(audio: jax.Array, n_valid: jax.Array) -> jax.Array:
    """Patch torchaudio's center-pad END reflection into left-aligned windows.

    ``audio``: (B, L) float32, each row a window whose ``n_valid[b]`` true
    samples sit at the START of the buffer with zeros after. torchaudio's
    STFT (center=True) reflect-pads the *signal* end — position
    ``n_valid + j`` takes sample ``n_valid - 2 - j`` (no edge repeat) — so
    for a short window the mel frames near the signal end see reflected
    tail, not zeros. This writes ``reverse(signal tail)[1:513]`` right
    after the last valid sample, making :func:`audio_frontend`
    (``left_aligned=True``) EXACT vs the per-window host path
    (ops/audio_host.reference_audio_features) for all windows >= 513
    samples; shorter ones (< 12 ms, where torchaudio's own reflect pad
    raises) stay zero after the signal. Same construction as the serving
    sweep's per-window slice path (sweep.py::fused_sweep_device_audio);
    reference semantics: aff2compdataset.py:227-238 + torch.stft center pad.

    Full windows (``n_valid == L``) are returned unchanged: the patch lands
    entirely in the scratch padding that is cropped away, and the
    frontend's own reflect pad at the buffer edge IS the signal edge.
    """
    b, length = audio.shape
    w = jnp.pad(audio, ((0, 0), (0, 512)))

    def one(row, nv):
        r = jax.lax.dynamic_slice(
            row, (jnp.maximum(nv - 513, 0),), (513,))[::-1]
        patched = jax.lax.dynamic_update_slice(row, r[1:513], (nv,))
        return jnp.where(nv >= 513, patched, row)[:length]

    return jax.vmap(one)(w, n_valid.astype(jnp.int32))
