"""Fused attention: XLA path semantics + Pallas kernel parity (interpret
mode on CPU; the TPU-compiled path is exercised by bench.py on hardware)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auformer.ops import attention as att


def ref_attention(q, k, v, scale):
    dots = np.einsum("bhid,bhjd->bhij", q, k) * scale
    dots = dots - dots.max(axis=-1, keepdims=True)
    p = np.exp(dots)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bhij,bhjd->bhid", p, v)


@pytest.mark.parametrize("n,d", [(49, 32), (17, 64), (12, 32)])
def test_xla_attention_matches_numpy(n, d):
    rs = np.random.RandomState(0)
    q = rs.randn(2, 8, n, d).astype(np.float32)
    k = rs.randn(2, 8, n, d).astype(np.float32)
    v = rs.randn(2, 8, n, d).astype(np.float32)
    scale = d ** -0.5
    out = np.asarray(att._xla_attention(q, k, v, scale))
    np.testing.assert_allclose(out, ref_attention(q, k, v, scale),
                               rtol=1e-4, atol=1e-5)


def test_xla_attention_mask():
    rs = np.random.RandomState(1)
    q = rs.randn(2, 4, 8, 16).astype(np.float32)
    mask = np.ones((2, 8), bool)
    mask[0, 5:] = False
    out = np.asarray(att._xla_attention(q, q, q, 0.25, mask))
    # masked-out query rows attend only within the kept set; finite always
    assert np.isfinite(out).all()
    # a kept query must ignore masked keys: perturbing masked v does nothing
    v2 = q.copy()
    v2[0, :, 5:, :] += 100.0
    out2 = np.asarray(att._xla_attention(q, q, v2, 0.25, mask))
    np.testing.assert_allclose(out[0, :, :5], out2[0, :, :5],
                               rtol=1e-4, atol=1e-5)


def test_pallas_kernel_interpret_matches_xla():
    """Run the Pallas kernel in interpreter mode (CPU) vs the XLA path."""
    from jax.experimental import pallas as pl

    rs = np.random.RandomState(2)
    b, h, n, d = 2, 8, 49, 32
    q = rs.randn(b, h, n, d).astype(np.float32)
    k = rs.randn(b, h, n, d).astype(np.float32)
    v = rs.randn(b, h, n, d).astype(np.float32)
    scale = d ** -0.5

    bh = b * h
    g = 8
    spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(att._attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        grid=(bh // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=True,
    )(q.reshape(bh, n, d), k.reshape(bh, n, d), v.reshape(bh, n, d))
    out = np.asarray(out).reshape(b, h, n, d)
    np.testing.assert_allclose(out, ref_attention(q, k, v, scale),
                               rtol=1e-4, atol=1e-5)


def test_dispatch_falls_back_off_tpu():
    """use_pallas on CPU must route to the XLA path (no pltpu lowering)."""
    rs = np.random.RandomState(3)
    q = rs.randn(1, 2, 12, 32).astype(np.float32)
    out = att.fused_attention(q, q, q, 0.2, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out),
                               ref_attention(q, q, q, 0.2),
                               rtol=1e-4, atol=1e-5)


def test_custom_vjp_backward_matches_autodiff():
    """The hand-written backward used for the Pallas path must equal
    autodiff of the XLA attention."""
    rs = np.random.RandomState(4)
    q = rs.randn(2, 4, 12, 32).astype(np.float32)
    k = rs.randn(2, 4, 12, 32).astype(np.float32)
    v = rs.randn(2, 4, 12, 32).astype(np.float32)
    g = rs.randn(2, 4, 12, 32).astype(np.float32)
    scale = 32 ** -0.5

    _, vjp = jax.vjp(lambda q, k, v: att._xla_attention(q, k, v, scale),
                     q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    dq, dk, dv = att._pallas_attention_bwd(scale, (q, k, v), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-5)
