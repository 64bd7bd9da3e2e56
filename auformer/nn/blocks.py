"""Shared transformer building blocks (flax.linen).

Mirrors the reference block semantics (vformer.py:22-114, heads.py:164-256):
pre-LayerNorm residual encoder with tanh-approximate GELU, bias-free fused
QKV, per-head scale dim_head**-0.5, and an output projection unless
(heads == 1 and dim_head == dim).

TPU-first choices:
  * QKV is one fused matmul; attention math runs in ``dtype`` (bf16 by
    default) with fp32 softmax accumulation via ``preferred_element_type``
  * sequence lengths here are tiny (12/17/49/129 tokens) — attention is
    evaluated in one un-tiled einsum block that XLA maps directly onto the
    MXU; the Pallas fused path (ops/attention.py) is used when
    ``use_pallas`` and shapes are aligned
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import fused_attention

Dtype = jnp.dtype


def tanh_gelu(x: jax.Array) -> jax.Array:
    """Reference GELU (vformer.py:22-24): the tanh approximation."""
    return jax.nn.gelu(x, approximate=True)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = tanh_gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention (reference vformer.py:61-97)."""
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, *,
                 deterministic: bool = True):
        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        scale = self.dim_head ** -0.5

        out = fused_attention(q, k, v, scale, mask=mask,
                              use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.heads, self.dim_head, self.dropout,
                      self.dtype, self.use_pallas, name="attn")(
                          h, mask, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = FeedForward(self.dim, self.mlp_dim, self.dropout, self.dtype,
                        name="mlp")(h, deterministic=deterministic)
        return x + h


class Transformer(nn.Module):
    """Depth-stacked pre-norm encoder (reference vformer.py:100-114)."""
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, self.dim_head,
                                 self.mlp_dim, self.dropout, self.dtype,
                                 self.use_pallas, name=f"layers_{i}")(
                                     x, mask, deterministic=deterministic)
        return x


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm: eps 1e-5, running-stat momentum 0.1.

    Under jit+GSPMD with a batch-sharded input, the batch mean/var reductions
    are global across the data mesh axis (cross-replica BN for free —
    SURVEY.md §7.3-2). Works on (B, C) and (B, ..., C).
    """
    use_running_average: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        return nn.BatchNorm(
            use_running_average=nn.merge_param(
                "use_running_average", self.use_running_average,
                use_running_average),
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class TokenProjection(nn.Module):
    """N parallel per-token linears (the reference's 12 ``AU_linear_p*``,
    heads.py:264-275) batched into ONE matmul: (B, D) x (D, N*E) -> (B, N, E).

    Bitwise-equivalent to N separate nn.Linear(D, E) with concatenated
    weights; on TPU a single large matmul keeps the MXU busy instead of 12
    skinny ones.
    """
    n_tokens: int
    emb_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (d, self.n_tokens * self.emb_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.n_tokens * self.emb_dim,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32) + bias
        return y.reshape(b, self.n_tokens, self.emb_dim)


class TokenLogits(nn.Module):
    """N per-token scalar linears, no bias (``AU_linear_last*``,
    heads.py:278-289) as one einsum: (B, N, E) x (N, E) -> (B, N)."""
    n_tokens: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        _, n, e = tokens.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (n, e), jnp.float32)
        return jnp.einsum("bne,ne->bn", tokens.astype(self.dtype),
                          kernel.astype(self.dtype),
                          preferred_element_type=jnp.float32)
