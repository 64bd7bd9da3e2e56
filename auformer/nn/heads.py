"""AU/EX/VA prediction heads — the paper's core contribution
(reference heads.py).

``AUFormerHead`` is the AU-correlation transformer (reference ``AU_former``
heads.py:258-339): BatchNorm on the 512-dim embedding, 12 per-AU linear
projections to 128-dim AU tokens (batched into one matmul here), a learned
positional embedding, a depth-2 encoder over the 12 AU tokens, and 12 per-AU
bias-free scalar logits. Returns (logits (B,12), tokens (B,12,128)).

``FormerAUHead`` reconstructs the reference's missing ``former_AU_head``
class (imported at avformer.py:19, defined nowhere — SURVEY.md §2.4-1): by
call signature (``former_AU_head(emb_dim=256, dropout=0.2)`` avformer.py:87)
and input (the (B,12,256) fused A/V AU tokens, avformer.py:100) it is
``tformer_AU_head`` (tformer.py:362-403) generalized to emb_dim 256: a
12-token pos-embedded depth-3 correlation transformer + 12 per-AU scalar
linears.

``VAFormerHead`` is the 2-token valence/arousal analog (heads.py:341-372).
``AUMultihead`` / ``EXPHead`` / ``VAHead`` / ``MultiTaskHead`` complete the
inventory (heads.py:11-162); the reference's EXP/VA heads crash on
construction (`self.emb_dim` used before assignment, §2.4-6) — here they
implement the evident intent with ``input_dim``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, TokenLogits, TokenProjection, Transformer

Dtype = jnp.dtype


class AUFormerHead(nn.Module):
    """reference AU_former (heads.py:258-339)."""
    input_dim: int = 512
    emb_dim: int = 128
    dropout: float = 0.0
    n_tokens: int = 12
    depth: int = 2
    heads: int = 8
    dim_head: int = 32
    mlp_dim: int = 256
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, emb, *, train: bool = False,
                 deterministic: bool = True):
        emb = BatchNorm(name="input_bn", dtype=self.dtype)(
            emb, use_running_average=not train)
        tokens = TokenProjection(self.n_tokens, self.emb_dim, self.dtype,
                                 name="token_proj")(emb)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.n_tokens, self.emb_dim), jnp.float32)
        x = tokens + pos.astype(tokens.dtype)
        x = Transformer(self.emb_dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim, self.dropout, self.dtype,
                        self.use_pallas, name="corr_transformer")(
                            x, deterministic=deterministic)
        logits = TokenLogits(self.n_tokens, self.dtype, name="token_logits")(x)
        return logits, x


class VAFormerHead(nn.Module):
    """reference VA_former (heads.py:341-372): 2-token V/A correlation."""
    input_dim: int = 512
    emb_dim: int = 128
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, emb, *, train: bool = False,
                 deterministic: bool = True):
        emb = BatchNorm(name="input_bn", dtype=self.dtype)(
            emb, use_running_average=not train)
        tokens = TokenProjection(2, self.emb_dim, self.dtype,
                                 name="token_proj")(emb)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, 2, self.emb_dim), jnp.float32)
        x = tokens + pos.astype(tokens.dtype)
        x = Transformer(self.emb_dim, 2, 8, 32, 128, self.dropout,
                        self.dtype, self.use_pallas,
                        name="corr_transformer")(
                            x, deterministic=deterministic)
        logits = TokenLogits(2, self.dtype, name="token_logits")(x)
        return logits, x


class FormerAUHead(nn.Module):
    """Reconstruction of the missing ``former_AU_head`` (SURVEY.md §2.4-1):
    tformer_AU_head (tformer.py:362-403) at emb_dim 256. Input: (B, 12, E)
    fused AU tokens; output: (B, 12) AU logits."""
    emb_dim: int = 256
    dropout: float = 0.0
    depth: int = 3
    heads: int = 8
    dim_head: int = 32
    mlp_dim: int = 256
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, tokens, *, deterministic: bool = True):
        b = tokens.shape[0]
        tokens = tokens.reshape(b, 12, -1)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, 12, self.emb_dim), jnp.float32)
        x = tokens + pos.astype(tokens.dtype)
        x = Transformer(self.emb_dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim, self.dropout, self.dtype,
                        self.use_pallas, name="corr_transformer")(
                            x, deterministic=deterministic)
        return TokenLogits(12, self.dtype, name="token_logits")(x)


class AUMultihead(nn.Module):
    """reference AU_multihead (heads.py:11-90): per-AU MLP logits without the
    correlation transformer; optional 64-dim inter-task embedding."""
    input_dim: int = 512
    emb_dim: int = 16
    inter: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, *, train: bool = False):
        emb = BatchNorm(name="input_bn", dtype=self.dtype)(
            emb, use_running_average=not train)
        tokens = TokenProjection(12, self.emb_dim, self.dtype,
                                 name="token_proj")(emb)
        logits = TokenLogits(12, self.dtype, name="token_logits")(tokens)
        if not self.inter:
            return logits
        flat = tokens.reshape(tokens.shape[0], 12 * self.emb_dim)
        inter = nn.Dense(64, dtype=self.dtype, name="inter")(flat)
        return logits, inter


class EXPHead(nn.Module):
    """reference EXP_head intent (heads.py:92-119): BN -> 64 -> relu ->
    BN -> 7 logits; inter mode concatenates a 64-dim AU embedding."""
    input_dim: int = 512
    inter: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, inter_emb: Optional[jax.Array] = None, *,
                 train: bool = False):
        h = BatchNorm(name="bn1", dtype=self.dtype)(
            emb, use_running_average=not train)
        h = nn.relu(nn.Dense(64, dtype=self.dtype, name="fc1")(h))
        out_inter = None
        if self.inter:
            assert inter_emb is not None
            h = jnp.concatenate([inter_emb, h], axis=1)
            out_inter = nn.Dense(64, dtype=self.dtype, name="inter")(h)
        h = BatchNorm(name="bn2", dtype=self.dtype)(
            h, use_running_average=not train)
        out = nn.Dense(7, dtype=self.dtype, name="fc2")(h)
        return (out, out_inter) if self.inter else out


class VAHead(nn.Module):
    """reference VA_head intent (heads.py:121-148)."""
    input_dim: int = 512
    inter: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, inter_emb: Optional[jax.Array] = None, *,
                 train: bool = False):
        h = BatchNorm(name="bn1", dtype=self.dtype)(
            emb, use_running_average=not train)
        h = nn.relu(nn.Dense(64, dtype=self.dtype, name="fc1")(h))
        if self.inter:
            assert inter_emb is not None
            h = jnp.concatenate([inter_emb, h], axis=1)
        h = BatchNorm(name="bn2", dtype=self.dtype)(
            h, use_running_average=not train)
        return nn.Dense(2, dtype=self.dtype, name="fc2")(h)


class MultiTaskHead(nn.Module):
    """reference MultiTask_head (heads.py:150-162): AU -> EX -> VA chained
    through 64-dim inter embeddings."""
    input_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, *, train: bool = False):
        au_out, au_inter = AUMultihead(self.input_dim, inter=True,
                                       dtype=self.dtype, name="au_head")(
                                           emb, train=train)
        ex_out, ex_inter = EXPHead(self.input_dim, inter=True,
                                   dtype=self.dtype, name="exp_head")(
                                       emb, au_inter, train=train)
        va_out = VAHead(self.input_dim, inter=True, dtype=self.dtype,
                        name="va_head")(emb, ex_inter, train=train)
        return au_out, ex_out, va_out
