"""Fused attention for short token sequences.

The reference's attention sites are all tiny: 49 spatial tokens x (B*16)
frames (vformer.py:253-255), 17 temporal tokens (vformer.py:286-289), 12 AU
correlation tokens (heads.py:323-324). Nothing here needs flash-attention
tiling — each (N, N) score matrix fits in VMEM whole. What *does* matter on
TPU is avoiding HBM round-trips between QK^T, softmax, and PV: the Pallas
kernel below keeps the whole per-head attention in VMEM and batches several
(batch*head) rows per grid program so the MXU sees non-trivial work.

``fused_attention`` dispatches: Pallas on TPU when enabled and maskless,
otherwise a single fp32-accumulated einsum chain that XLA fuses well.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; keep CPU test runs importable
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e30


def _xla_attention(q, k, v, scale, mask=None):
    """(B, H, N, D) attention with fp32 softmax accumulation."""
    dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                      preferred_element_type=jnp.float32) * scale
    if mask is not None:
        # mask: (B, N) bool, True = keep (reference vformer.py:85-89 builds
        # the outer-product i/j mask from a flattened token mask)
        m = mask[:, None, :, None] & mask[:, None, None, :]
        dots = jnp.where(m, dots, NEG_INF)
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One grid program: a block of G (batch*head) rows, full N x N attention
    held in VMEM. q/k/v block shapes: (G, N, D)."""
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    # batched QK^T on the MXU: (G, N, N)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_rows"))
def pallas_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     scale: float, block_rows: int = 8) -> jax.Array:
    """(B, H, N, D) -> (B, H, N, D); N, D small enough for whole-row VMEM."""
    b, h, n, d = q.shape
    bh = b * h
    # cap the rows/program so 4 double-buffered (g, n_pad, 128-lane) VMEM
    # buffers stay under ~12 MB (Mosaic pads d up to the 128-lane tile)
    n_pad = -(-n // 8) * 8
    d_pad = max(-(-d // 128) * 128, 128)
    per_row = 4 * n_pad * d_pad * 4 * 2  # q,k,v,o x f32 x double-buffer
    vmem_cap = max(int(12e6 / max(per_row, 1)), 1)
    g = min(block_rows, bh, vmem_cap)
    while bh % g:
        g -= 1
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    grid = (bh // g,)
    spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d, bytes_accessed=4 * bh * n * d * 4,
            transcendentals=bh * n * n),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_attention_ad(q, k, v, scale):
    return pallas_attention(q, k, v, scale)


def _pallas_attention_fwd(q, k, v, scale):
    return pallas_attention(q, k, v, scale), (q, k, v)


def _pallas_attention_bwd(scale, res, g):
    """XLA backward: the forward's VMEM-resident intermediates (scores,
    softmax) are cheap to recompute at these token counts, so the bwd is a
    plain rematerializing softmax-attention gradient."""
    q, k, v = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhid,bhjd->bhij", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhij,bhid->bhjd", p, gf)
    dp = jnp.einsum("bhid,bhjd->bhij", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhij,bhjd->bhid", ds, kf) * scale
    dk = jnp.einsum("bhij,bhid->bhjd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_pallas_attention_ad.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                    mask: Optional[jax.Array] = None,
                    use_pallas: bool = False) -> jax.Array:
    """Dispatch between the Pallas fused kernel and the XLA einsum path.

    NOTE the fallback is SILENT: any mask, a non-TPU backend, or a missing
    pltpu import routes to the XLA path. At this framework's sequence
    lengths (12/17/49/129 tokens) the difference is small — the fused
    kernel mainly saves the (B, H, N, N) HBM round trip — but profiles
    showing einsum-softmax-einsum instead of a single fused op mean this
    branch was taken; no reference model passes a mask today
    (vformer.py:87 asserts masks unsupported).
    """
    if (use_pallas and mask is None and _HAS_PLTPU
            and jax.default_backend() == "tpu"):
        return _pallas_attention_ad(q, k, v, scale)
    return _xla_attention(q, k, v, scale, mask)
