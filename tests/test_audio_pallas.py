"""Parity tests for the fully-fused Pallas mel frontend (interpret mode).

The kernel's numerics class is the TPU default — bf16-contracted DFT with
f32 accumulation — so the reference for comparison is
``audio_frontend(mel_bf16=True)`` (identical operand casts, identical
math, different lowering). Real-chip parity/perf is exercised by
bench.py / scripts; these tests pin the kernel's *semantics* on CPU via
``interpret=True``.
"""
import numpy as np
import jax.numpy as jnp

from auformer.ops.audio import audio_frontend
from auformer.ops.audio_pallas import mel_frontend_pallas

ATOL = 2e-3  # normalized units (= 0.04 dB); paths differ only in lowering


def _ref(audio, flen=None):
    return np.asarray(audio_frontend(jnp.asarray(audio), flen,
                                     mel_bf16=True))


def test_parity_full_window():
    rng = np.random.RandomState(0)
    audio = (rng.randn(2, 441000) * 0.1).astype(np.float32)
    out = np.asarray(mel_frontend_pallas(jnp.asarray(audio),
                                         interpret=True))
    assert out.shape == (2, 1, 64, 1001)
    np.testing.assert_allclose(out, _ref(audio), atol=ATOL, rtol=0)


def test_parity_feature_len_masking():
    rng = np.random.RandomState(1)
    audio = (rng.randn(3, 441000) * 0.05).astype(np.float32)
    # left-zero-pad short windows exactly as fused_sweep_device_audio does
    n_valid = np.array([441000, 200_000, 441], np.int32)
    k = np.arange(441000)
    audio = np.where(k[None, :] >= 441000 - n_valid[:, None], audio,
                     0.0).astype(np.float32)
    flen = jnp.asarray(1 + n_valid // 441)
    out = np.asarray(mel_frontend_pallas(jnp.asarray(audio), flen,
                                         interpret=True))
    np.testing.assert_allclose(out, _ref(audio, flen), atol=ATOL, rtol=0)


def test_parity_all_zero_audio():
    audio = np.zeros((1, 441000), np.float32)
    out = np.asarray(mel_frontend_pallas(jnp.asarray(audio),
                                         interpret=True))
    np.testing.assert_allclose(out, _ref(audio), atol=ATOL, rtol=0)


def test_edge_frames_match_reflect_pad():
    """Frames 0 and 1000 cross the reflect padding — the precomputed edge
    path must match the XLA reflect-pad lowering exactly at those columns."""
    rng = np.random.RandomState(2)
    audio = (rng.randn(1, 441000) * 0.3).astype(np.float32)
    out = np.asarray(mel_frontend_pallas(jnp.asarray(audio),
                                         interpret=True))
    ref = _ref(audio)
    np.testing.assert_allclose(out[..., 0], ref[..., 0], atol=ATOL, rtol=0)
    np.testing.assert_allclose(out[..., -1], ref[..., -1], atol=ATOL,
                               rtol=0)
