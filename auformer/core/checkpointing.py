"""Checkpointing (reference utils.py:7-11 / train.py:247,273-276 semantics,
Orbax-backed).

latest/ is written every epoch, best/ by the early stopper; --resume loads
latest with missing-key tolerance like the reference's strict=False
(train.py:323-326). The .pth converter lives in core/torch_import.py.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(checkpoint_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def save_checkpoint(checkpoint_dir: str, tree: Any,
                    name: str = "latest") -> None:
    """Save a pytree (params/batch_stats/step) under {dir}/{name}."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _path(checkpoint_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(tree), force=True)


def load_checkpoint(checkpoint_dir: str, name: str = "latest",
                    target: Optional[Any] = None) -> Optional[Any]:
    """Load a checkpoint; returns None when absent. With ``target``,
    restores into its structure (missing subtrees keep target values —
    torch load_state_dict(strict=False) tolerance, train.py:326)."""
    path = _path(checkpoint_dir, name)
    if not os.path.isdir(path):
        return None
    with ocp.StandardCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        restored = ckptr.restore(path)

    def merge(tgt, src):
        if isinstance(tgt, dict):
            out = {}
            for k, v in tgt.items():
                out[k] = merge(v, src[k]) if isinstance(src, dict) and k in src else v
            return out
        if src is None:
            return tgt
        src = np.asarray(src)
        return src if src.shape == np.shape(tgt) else tgt

    return merge(target, restored)


class EarlyStopper:
    """Best-score tracking + patience (reference train.py:84-103)."""

    def __init__(self, num_trials: int, checkpoint_dir: str):
        self.num_trials = num_trials
        self.trial_counter = 0
        self.best_accuracy = 0.0
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def is_continuable(self, tree: Any, accuracy: float) -> bool:
        if accuracy > self.best_accuracy:
            self.best_accuracy = accuracy
            self.trial_counter = 0
            save_checkpoint(self.checkpoint_dir, tree, name="best")
            return True
        if self.trial_counter + 1 < self.num_trials:
            self.trial_counter += 1
            return True
        return False
