"""Fully-fused Pallas TPU mel frontend.

One kernel replaces the whole ``ops.audio.audio_frontend`` chain for the
fixed serving shape (L=441000 samples -> (64, 1001) normalized log-mel,
reference aff2compdataset.py:47-68): frame assembly, windowed-DFT matmul,
power, mel filterbank, per-sample dB floor and affine normalize all happen
in VMEM.  The XLA lowering of the same math (ops/audio.py) materializes
the (B*T, 2F) DFT intermediate and runs a separate dB/max pass over the
mel in HBM; this kernel reads the raw audio once and writes the final
normalized mel once.

Measured reality (v5e, B=512, 2026-08-17): after the hop-aligned dense
STFT-matmul rewrite of the XLA path (commit dc3743c), both paths run at
the same speed — 17.1 ms (XLA) vs 17.8 ms (this kernel) per 512-clip
bucket; XLA already fuses the chain well enough that the saved HBM
round-trips are offset by the kernel's lane-padding overheads (441-lane
hop rows, 513-lane spectra).  The kernel is therefore OPT-IN
(``audio_frontend(use_pallas=True)``), kept as verified infrastructure
for shapes/generations where the fusion margin reappears, not routed by
default.

Key structural trick: with hop=441, win=882, n_fft=1024 the reflect-pad
offset is 512 and the window support starts at (1024-882)//2 = 71, so in
*unpadded* sample coordinates frame k (k = 1..999) covers exactly
[(k-1)*441, (k+1)*441) — two contiguous hop rows.  Rather than gathering
882-sample frames (a lane-misaligned concat the VPU pays dearly for), the
DFT basis is split at the hop boundary: with u = rows @ basis[:441] and
v = rows @ basis[441:], frame k's spectrum is u[k-1] + v[k] — a one-row
*sublane* shift in the (H, F) output domain, with u's last row carried
across grid steps in VMEM.  Only frames 0 and 1000 touch the reflect
padding; their powers are precomputed outside the kernel (2 frames per
sample, microscopic) and spliced in.

Numerics: DFT operands are cast to bf16 with f32 accumulation — the same
class as the XLA path's DEFAULT-precision contraction (see
ops/audio.py::power_spectrogram); the mel projection, dB, and normalize
run in f32.  Parity with ``audio_frontend(mel_bf16=True)`` is tested in
interpret mode (tests/test_audio_pallas.py) and was verified exact
(max abs diff 0.0 in normalized units) on a real v5e chip.

Grid: (B, 2) — two 512-frame halves per sample, sequential, so the last
step holds the whole sample's mel in a persistent VMEM scratch and can
apply the per-sample ``max - 80 dB`` floor (torchaudio AmplitudeToDB
semantics) without a second device pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; keep CPU test runs importable
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from .audio import (AMIN, HOP_LENGTH, N_FFT, SPEC_MEAN, SPEC_STD, TOP_DB,
                    WIN_LENGTH, _dft_basis, mel_filterbank)

_L = 441000                      # fixed 10 s @ 44.1 kHz serving buffer
_ROWS = _L // HOP_LENGTH         # 1000 hop rows
_T = 1 + _ROWS                   # 1001 STFT frames (center-padded)
_H = 512                         # frames per grid step (2 steps: 512+489)
_F = N_FFT // 2 + 1              # 513 freq bins
_LEFT = (N_FFT - WIN_LENGTH) // 2  # 71: window support offset in the frame


def _mel_kernel(rows_ref, epower_ref, blo_r_ref, bhi_r_ref, blo_i_ref,
                bhi_i_ref, melfb_ref, flen_ref, out_ref, acc_ref,
                carry_r_ref, carry_i_ref, *, n_mels: int):
    t = pl.program_id(1)
    flen = flen_ref[pl.program_id(0), 0]
    rows = rows_ref[0].astype(jnp.bfloat16)              # (H, 441)
    # Frame k spans hop rows (k-1, k); with the basis split at the hop
    # boundary, spec[k] = u[k-1] + v[k] where u/v are this block's
    # lo/hi-half contributions.  u[-1] of the previous grid step arrives
    # via the VMEM carry (t is the innermost grid dim => sequential).
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u_r = dot(rows, blo_r_ref[:])                        # (H, F) f32
    u_i = dot(rows, blo_i_ref[:])
    v_r = dot(rows, bhi_r_ref[:])
    v_i = dot(rows, bhi_i_ref[:])
    # At t==0 the carry is uninitialized; the garbage only feeds frame 0,
    # which is overwritten with the precomputed reflect-pad power below.
    pu_r = jnp.concatenate([carry_r_ref[:], u_r[:-1]], axis=0)
    pu_i = jnp.concatenate([carry_i_ref[:], u_i[:-1]], axis=0)
    carry_r_ref[:] = u_r[-1:]
    carry_i_ref[:] = u_i[-1:]
    power = (pu_r + v_r) ** 2 + (pu_i + v_i) ** 2        # (H, F)
    # frames 0 and 1000 cross the reflect padding: true powers arrive
    # precomputed (frame 1000 additionally reads an out-of-range hop row
    # whose garbage stays row-local through the row-wise ops above).
    j = jax.lax.broadcasted_iota(jnp.int32, (_H, 1), 0)
    power = jnp.where((t == 0) & (j == 0), epower_ref[0, 0:1], power)
    power = jnp.where((t == 1) & (j == _T - 1 - _H), epower_ref[0, 1:2],
                      power)
    mel = jax.lax.dot_general(
        power, melfb_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (H, n_mels)
    acc_ref[pl.ds(t * _H, _H), :] = mel

    @pl.when(t == 1)
    def _():
        full = acc_ref[:]                                # (2H, n_mels)
        k = jax.lax.broadcasted_iota(jnp.int32, (2 * _H, 1), 0)
        # zero invalid (left-pad) frames before dB — matches
        # audio_frontend's feature_len masking — and the 2H-T scratch tail
        valid = (k >= _T - flen) & (k < _T)
        full = jnp.where(valid, full, 0.0)
        db = 10.0 * jnp.log10(jnp.maximum(full, AMIN))
        mx = jnp.max(db)     # extra zero rows floor at -100 dB, never max
        db = jnp.maximum(db, mx - TOP_DB)
        out = (db - SPEC_MEAN) / SPEC_STD
        out_ref[0] = out[:_T].T                          # (n_mels, T)


def _edge_power(audio: jax.Array) -> jax.Array:
    """Exact powers of the two reflect-pad-crossing frames, (B, 2, F) f32.

    Frame 0 covers unpadded [-441, 441) = reverse(x[1:442]) ++ x[0:441];
    frame 1000 covers [440559, 441441) = x[440559:441000] ++
    reverse(x[440558:440999]).  bf16 operands / f32 accumulation — the
    same numerics class as the kernel's DFT.
    """
    e0 = jnp.concatenate([audio[:, 1:442][:, ::-1], audio[:, :441]], axis=1)
    e1 = jnp.concatenate([audio[:, _L - 441:],
                          audio[:, _L - 442:_L - 1][:, ::-1]], axis=1)
    edges = jnp.stack([e0, e1], axis=1)                  # (B, 2, 882)
    basis = jnp.asarray(
        _dft_basis(N_FFT, WIN_LENGTH)[_LEFT:_LEFT + WIN_LENGTH],
        dtype=jnp.bfloat16)                              # (882, 2F)
    espec = jax.lax.dot_general(
        edges.astype(jnp.bfloat16), basis, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (B, 2, 2F)
    return espec[..., :_F] ** 2 + espec[..., _F:] ** 2


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def mel_frontend_pallas(audio: jax.Array,
                        feature_len: jax.Array | None = None,
                        n_mels: int = 64,
                        interpret: bool = False) -> jax.Array:
    """(B, 441000) f32 raw audio -> (B, 1, n_mels, 1001) normalized log-mel.

    Drop-in for ``audio_frontend`` at the fixed serving shape (bf16 DFT
    numerics class — the TPU default).  ``feature_len`` as in
    audio_frontend: number of valid right-aligned frames per sample.
    """
    b, length = audio.shape
    if length != _L:
        raise ValueError(f"mel_frontend_pallas requires L={_L}, got {length}")
    x3 = audio.reshape(b, _ROWS, HOP_LENGTH)
    epower = _edge_power(audio)                          # (B, 2, F)
    basis = np.asarray(_dft_basis(N_FFT, WIN_LENGTH)
                       [_LEFT:_LEFT + WIN_LENGTH])       # (882, 2F)
    blo_r = jnp.asarray(basis[:HOP_LENGTH, :_F], jnp.bfloat16)
    bhi_r = jnp.asarray(basis[HOP_LENGTH:, :_F], jnp.bfloat16)
    blo_i = jnp.asarray(basis[:HOP_LENGTH, _F:], jnp.bfloat16)
    bhi_i = jnp.asarray(basis[HOP_LENGTH:, _F:], jnp.bfloat16)
    melfb = jnp.asarray(mel_filterbank(n_mels=n_mels))   # (F, n_mels)
    if feature_len is None:
        flen = jnp.full((b, 1), _T, jnp.int32)
    else:
        flen = feature_len.astype(jnp.int32).reshape(b, 1)
    kernel = functools.partial(_mel_kernel, n_mels=n_mels)
    if _HAS_PLTPU:
        kwargs = {"scratch_shapes": [
            pltpu.VMEM((2 * _H, n_mels), jnp.float32),
            pltpu.VMEM((1, _F), jnp.float32),
            pltpu.VMEM((1, _F), jnp.float32),
        ]}
        mem = dict(memory_space=pltpu.VMEM)
        smem_spec = pl.BlockSpec((b, 1), lambda bb, tt: (0, 0),
                                 memory_space=pltpu.SMEM)
    else:  # pragma: no cover - interpret-only environments without pltpu
        raise RuntimeError("pallas TPU backend unavailable")
    const = lambda bb, tt: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(b, 2),
        in_specs=[
            pl.BlockSpec((1, _H, HOP_LENGTH), lambda bb, tt: (bb, tt, 0),
                         **mem),
            pl.BlockSpec((1, 2, _F), lambda bb, tt: (bb, 0, 0), **mem),
            pl.BlockSpec((HOP_LENGTH, _F), const, **mem),
            pl.BlockSpec((WIN_LENGTH - HOP_LENGTH, _F), const, **mem),
            pl.BlockSpec((HOP_LENGTH, _F), const, **mem),
            pl.BlockSpec((WIN_LENGTH - HOP_LENGTH, _F), const, **mem),
            pl.BlockSpec((_F, n_mels), const, **mem),
            smem_spec,
        ],
        out_specs=pl.BlockSpec((1, n_mels, _T), lambda bb, tt: (bb, 0, 0),
                               **mem),
        out_shape=jax.ShapeDtypeStruct((b, n_mels, _T), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * _T * WIN_LENGTH * 2 * _F,
            bytes_accessed=b * _L * 4 + b * n_mels * _T * 4,
            transcendentals=b * n_mels * _T),
        interpret=interpret,
        **kwargs,
    )(x3, epower, blo_r, bhi_r, blo_i, bhi_i, melfb, flen)
    return out[:, None, :, :]
