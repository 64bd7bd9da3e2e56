"""Reproducibility utilities (reference utils.py:14-19 equivalent).

JAX PRNG is functional; there is no global torch/cuda seed to set. We seed
numpy + python random (host-side augmentation and samplers) and hand out a
root jax PRNG key. XLA:TPU is deterministic for a fixed program + seed, so no
cudnn.deterministic analog is needed.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root device PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class key_seq:
    """Infinite PRNG key sequence: ``ks = key_seq(key); k1 = ks(); k2 = ks()``."""

    def __init__(self, key: jax.Array):
        self._key = key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub
