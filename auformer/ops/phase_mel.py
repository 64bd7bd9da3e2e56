"""EXACT shared-spectrogram mel for the dense sweep (phase-mel path).

The per-window mel frontend dominates the sweep's residual device time
(~17 ms of a 43.9 ms 512-clip bucket, round-3 trace in docs/DESIGN.md)
because every window recomputes a 1001-frame STFT over audio that its
neighbors already analyzed: consecutive sweep windows share 439530 of
441000 samples. The reference's window grid makes the redundancy
removable *exactly*:

* A window at timestamp ts starts at ``offset = max(int(ts_s * 44100) -
  220500, 0)`` (aff2compdataset.py:218-226; 220500 = 5 s shift). With
  ideal 30 fps timestamps offsets step by 1470 = 3*441 + 147 samples, so
  ``offset mod 441`` (441 = the STFT hop) takes at most THREE values per
  video. Every window's STFT grid therefore coincides with one of a
  handful of *phase-shifted global grids*.
* torch.stft's hann window (win 882 zero-padded to n_fft 1024, left pad
  71) has support exactly ``[(j-1)*441, (j+1)*441)`` around frame j's
  hop point — so ONLY frame 0 and frame T-1 of a window read the
  window's reflect padding. Every interior frame is bit-for-bit the same
  computation as the phase-aligned global frame at the same absolute
  sample position.

So: compute one (T_g, n_mels) POWER mel per phase per video (a ~100x
smaller STFT than per-window), gather each window's interior frames from
its phase table, compute the two edge frames per window exactly
(including the reference's start/end reflect semantics), left-pad, and
apply the per-window AmplitudeToDB floor + normalize. Numerics class
matches ops/audio.py::audio_frontend (DEFAULT-precision = bf16-contracted
DFT with f32 accumulation); sub-513-sample degenerate windows reproduce
audio_frontend's documented masked-no-end-reflect behavior (torchaudio
itself raises on reflect pad >= signal length, reference undefined).

Host planning (``phase_plan``) falls back to ``None`` when a video's
timestamps produce more than ``max_phases`` distinct phases (non-30fps /
jittery timestamp files); callers then use the per-window device-audio
path (sweep.py::fused_sweep_device_audio).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .audio import (HOP_LENGTH, N_FFT, N_MELS, WIN_LENGTH, _dft_basis,
                    amplitude_to_db, mel_filterbank, normalize_spec)

# ideal 30 fps timestamps produce {0,146,147,293,294,440} (int truncation
# wobbles the 3-phase cycle by -1); 8 covers that with margin, and the
# table cost is linear in P (~0.5 ms per video-minute per phase on v5e)
MAX_PHASES = 8
_LEFT = (N_FFT - WIN_LENGTH) // 2          # 71: window support offset
_EDGE_EXT = 3 * HOP_LENGTH + 1             # end-edge mini buffer: 1324


@functools.lru_cache(maxsize=2)
def _basis_trim() -> np.ndarray:
    """Windowed DFT basis trimmed to the 882-sample window support."""
    return _dft_basis(N_FFT, WIN_LENGTH)[_LEFT:_LEFT + WIN_LENGTH]


@functools.lru_cache(maxsize=2)
def _basis_split() -> np.ndarray:
    """(441, 2*1026) block-row basis [B_lo | B_hi]: frame j's spectrum is
    rows[j] @ B_lo + rows[j+1] @ B_hi where rows[k] covers samples
    [(k-1)*441, k*441) of the phase-shifted grid."""
    b = _basis_trim()
    return np.concatenate([b[:HOP_LENGTH], b[HOP_LENGTH:]], axis=1)


def phase_mel_table_span(wav_buf: jax.Array, phases: jax.Array,
                         pre: int, t_g: int,
                         n_mels: int = N_MELS) -> jax.Array:
    """(P, t_g, n_mels) POWER mel of the P phase-shifted global grids over
    an arbitrary buffer layout [zeros(pre) | content | zeros(tail)].

    ``pre``/``t_g`` are trace-time constants: the grid anchors at buffer
    position ``pre`` (= unpadded coordinate 0), so global frame g of phase
    p covers buffer samples [pre + p + (g-1)*441, pre + p + (g+1)*441).
    Requires pre >= 441 and tail >= 1764 so no slice clamps. Row 0 of each
    table reads into the prefix and is never indexed by windows (interior
    indices are >= base+1 >= 1). The packed cross-video serving buffers
    (auformer/packed.py) use this with pre=441; the per-video layout
    wraps it below.
    """
    basis = jnp.asarray(_basis_split())
    fb = jnp.asarray(mel_filterbank(N_FFT // 2 + 1, 0.0, None, n_mels))
    n_freqs = N_FFT // 2 + 1

    def one(p):
        rows = jax.lax.dynamic_slice(
            wav_buf, (pre + p - HOP_LENGTH,),
            ((t_g + 1) * HOP_LENGTH,)).reshape(t_g + 1, HOP_LENGTH)
        r = jax.lax.dot_general(rows, basis, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        lo, hi = r[..., :2 * n_freqs], r[..., 2 * n_freqs:]
        spec = lo[:t_g] + hi[1:t_g + 1]               # (T_g, 2F)
        power = spec[:, :n_freqs] ** 2 + spec[:, n_freqs:] ** 2
        return jax.lax.dot_general(power, fb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # static unroll over the (small, MAX_PHASES-padded) phase axis: a
    # vmapped dynamic-slice of the ~2.6 M-sample grid lowers to a SERIAL
    # while + dynamic-update-slice chain materializing an (P, (T_g+1)*441)
    # f32 buffer (while.12/13 + dynamic-update-slice.28, ~6 ms/bucket in
    # the round-3 phase trace); unrolled, XLA emits P independent
    # slice -> matmul chains it can schedule in parallel
    return jnp.stack([one(phases[i]) for i in range(phases.shape[0])])


def phase_mel_table(wav_ext: jax.Array, phases: jax.Array,
                    n_mels: int = N_MELS) -> jax.Array:
    """(P, T_g, n_mels) POWER mel for the per-video sweep layout
    wav_ext = [zeros(441000) | wav | zeros(441000 + 512)]."""
    slen = 441000
    t_g = (wav_ext.shape[-1] - 2 * slen - 512) // HOP_LENGTH + 2
    return phase_mel_table_span(wav_ext, phases, pre=slen, t_g=t_g,
                                n_mels=n_mels)


def _edge_frames(wav_ext: jax.Array, starts: jax.Array, n_valid: jax.Array,
                 n_mels: int) -> tuple[jax.Array, jax.Array]:
    """Per-window first/last STFT frames with the reference's window-local
    reflect padding -> two (N, n_mels) POWER mel rows.

    Start frame (j=0) covers window samples [-441, 441): the start
    reflect (p[-k] = s[k]) mirrors the first samples. End frame
    (j = T_w - 1) covers [(T_w-2)*441, T_w*441): positions past n_valid
    take the end reflect p[nv + k] = s[nv - 2 - k] when nv >= 513,
    matching ops/audio.py::audio_frontend's left-aligned semantics (and
    its masked-no-reflect behavior below 513). Both frames use the same
    trimmed basis as the bulk path.
    """
    hop = HOP_LENGTH
    ext = _EDGE_EXT

    def one(s, nv):
        tw1 = nv // hop                               # = T_w - 1 (nv > 0)
        # -- start frame: first 883 window samples, masked to nv --
        buf = jax.lax.dynamic_slice(wav_ext, (s,), (2 * hop + 1,))
        buf = jnp.where(jnp.arange(2 * hop + 1) < nv, buf, 0.0)
        v0 = jnp.concatenate([buf[1:hop + 1][::-1], buf[:hop]])
        # -- end frame: mini buffer one hop before the frame support so
        # reflect sources never precede it; local valid = nv mod 441 + 882
        o_end = s + (tw1 - 2) * hop
        w = jax.lax.dynamic_slice(
            wav_ext, (jnp.maximum(o_end, 0),), (ext,))
        nvl = nv - (tw1 - 2) * hop
        ar = jnp.arange(ext, dtype=jnp.int32)
        wm = jnp.where(ar < nvl, w, 0.0)
        # end-reflect wm[2*nvl - 2 - ar] for ar >= nvl is a CONTIGUOUS
        # ascending run of the reversed buffer, so one dynamic-slice of
        # [zeros | reverse(wm) | zeros] replaces the element gather
        # (fusion.2, ~7 ms/bucket in the round-3 phase trace). The gather
        # form's index clip never fired on the used [hop, 3*hop) slice:
        # nvl = (nv mod 441) + 882 >= 882 for every nv >= 513, so
        # 2*nvl - 2 >= 1762 > 3*hop - 1; below 513 the reflect is masked.
        z = jnp.zeros(ext, wm.dtype)
        refl_rev = jax.lax.dynamic_slice(
            jnp.concatenate([z, wm[::-1], z]),
            (2 * ext + 1 - 2 * nvl,), (ext,))
        refl = jnp.where(ar < nvl, wm, refl_rev)
        v1 = jnp.where((ar < nvl) | (nv >= 513), refl, 0.0)[hop:hop + 2 * hop]
        return v0, v1

    # vmap, not lax.map: the sequential map (batch_size=64) showed up as
    # 17% of e2e device busy time (while.21/22 in the round-3 trace); the
    # vmapped mini buffers are only N x 2207 floats (~18 MB at N=2048)
    v0, v1 = jax.vmap(one)(starts, n_valid)
    basis = jnp.asarray(_basis_trim())
    fb = jnp.asarray(mel_filterbank(N_FFT // 2 + 1, 0.0, None, n_mels))
    n_freqs = N_FFT // 2 + 1

    def project(v):
        spec = jax.lax.dot_general(v, basis, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        power = spec[:, :n_freqs] ** 2 + spec[:, n_freqs:] ** 2
        return jax.lax.dot_general(power, fb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    return project(v0), project(v1)                   # (N, M) x2


def phase_window_features(wav_ext: jax.Array, phase_mels: jax.Array,
                          starts: jax.Array, n_valid: jax.Array,
                          base: jax.Array, phase_sel: jax.Array,
                          out_frames: int = 1001,
                          time_major: bool = False) -> jax.Array:
    """Assemble (N, 1, n_mels, out_frames) normalized log-mel features.

    Interior frames gather from ``phase_mels`` (P, T_g, M); edge frames
    compute per window; features left-pad to ``out_frames`` and the
    per-window dB floor + affine normalize match audio_frontend.

    ``time_major=True`` returns (N, out_frames, n_mels, 1) instead — the
    layout the row gather already produces. The (N, T, M) -> (N, M, T)
    transpose is a full physical relayout on TPU (the round-3 phase trace
    charged ~3.6 ms/bucket of copy fusions to it); consumers avoid it by
    running the audio trunk with HW-swapped conv kernels
    (nn.avformer.AudioModel(time_major=True)), which is math-identical
    because every resnet18 conv/pool is symmetric across H and W.
    """
    n_mels = phase_mels.shape[-1]
    t_g = phase_mels.shape[1]
    tw = 1 + n_valid // HOP_LENGTH                    # (N,)
    k = jnp.arange(out_frames, dtype=jnp.int32)[None, :]
    j = k - (out_frames - tw[:, None])                # window frame index

    flat = phase_mels.reshape(-1, n_mels)             # (P*T_g, M)
    gidx = phase_sel[:, None] * t_g + base[:, None] + j
    gidx = jnp.clip(gidx, 0, flat.shape[0] - 1)
    interior = jnp.take(flat, gidx, axis=0)           # (N, T, M)

    e0, e1 = _edge_frames(wav_ext, starts, n_valid, n_mels)
    is0 = (j == 0)[..., None]
    islast = ((j == tw[:, None] - 1) & (tw[:, None] > 1))[..., None]
    valid = ((j >= 0) & (j < tw[:, None]) & (n_valid[:, None] > 0))[..., None]
    out = jnp.where(is0, e0[:, None, :], interior)
    out = jnp.where(islast, e1[:, None, :], out)
    out = jnp.where(valid, out, 0.0)
    if time_major:
        # amplitude_to_db reduces over the last two axes — the same
        # element set in either orientation, so the floor is identical
        return normalize_spec(amplitude_to_db(out))[..., None]
    mel = jnp.transpose(out, (0, 2, 1))               # (N, M, T)
    db = amplitude_to_db(mel)
    return normalize_spec(db)[:, None]


def phase_plan(offsets: np.ndarray, n_valid: np.ndarray,
               max_phases: int = MAX_PHASES
               ) -> "tuple[np.ndarray, np.ndarray, np.ndarray] | None":
    """Host-side plan: (phases[max_phases], base, phase_sel) int32, or
    ``None`` when the video needs more than ``max_phases`` grids (caller
    falls back to the per-window path). ``offsets`` are the clamped
    window offsets in unpadded sample coords (sweep.audio_window_plan)."""
    offsets = np.asarray(offsets, np.int64)
    live = np.asarray(n_valid) > 0
    uniq = np.unique((offsets % HOP_LENGTH)[live])
    if uniq.size > max_phases:
        return None
    if uniq.size == 0:
        uniq = np.zeros(1, np.int64)
    phases = np.concatenate(
        [uniq, np.full(max_phases - uniq.size, uniq[0])]).astype(np.int32)
    phase_sel = np.searchsorted(uniq, offsets % HOP_LENGTH).astype(np.int32)
    phase_sel = np.where(live, phase_sel, 0).astype(np.int32)
    base = (offsets // HOP_LENGTH).astype(np.int32)
    return phases, base, phase_sel
