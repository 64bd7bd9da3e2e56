"""Observability: step timing, profiler traces, training-curve recording.

The reference's observability is manual wall-clock in tqdm postfix plus a
never-instantiated RecorderMeter (train.py:22-82, SURVEY.md §5). Here:

  * ``StepTimer`` — per-step host timing with data-fetch/compute split (the
    t1/t2 pattern of train.py:197-205 as a reusable object);
  * ``profile`` — context manager around ``jax.profiler`` writing an XPlane
    trace dir for xprof/tensorboard;
  * ``RecorderMeter`` — epoch-indexed loss/accuracy curves with the
    reference's plot (matplotlib) and a JSON dump for headless runs.
"""
from __future__ import annotations

import contextlib
import json
import time

import numpy as np


class StepTimer:
    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self._t = time.perf_counter()

    def mark_data(self):
        now = time.perf_counter()
        self.data_time = now - self._t
        self._t = now

    def mark_step(self):
        now = time.perf_counter()
        self.step_time = now - self._t
        self._t = now


@contextlib.contextmanager
def profile(trace_dir: str | None):
    """jax.profiler trace scope; no-op when trace_dir is None."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RecorderMeter:
    """Epoch loss/accuracy recorder (reference train.py:22-82)."""

    def __init__(self, total_epoch: int):
        self.reset(total_epoch)

    def reset(self, total_epoch: int):
        self.total_epoch = total_epoch
        self.current_epoch = 0
        self.epoch_losses = np.zeros((total_epoch, 2), np.float32)
        self.epoch_accuracy = np.zeros((total_epoch, 2), np.float32)

    def update(self, idx, train_loss, train_acc, val_loss, val_acc):
        self.epoch_losses[idx, 0] = train_loss * 50
        self.epoch_losses[idx, 1] = val_loss * 50
        self.epoch_accuracy[idx, 0] = train_acc
        self.epoch_accuracy[idx, 1] = val_acc
        self.current_epoch = idx + 1

    def save_json(self, path: str):
        with open(path, "w") as f:
            json.dump({"losses_x50": self.epoch_losses.tolist(),
                       "accuracy": self.epoch_accuracy.tolist(),
                       "current_epoch": self.current_epoch}, f)

    def plot_curve(self, save_path: str):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(20, 10), dpi=80)
        x = np.arange(self.total_epoch)
        plt.xlim(0, self.total_epoch)
        plt.ylim(0, 100)
        plt.grid()
        plt.title("the accuracy/loss curve of train/val", fontsize=20)
        plt.xlabel("the training epoch", fontsize=16)
        plt.ylabel("accuracy", fontsize=16)
        for col, color, style, label in [
                (0, "g", "-", "train-accuracy"),
                (1, "y", "-", "valid-accuracy")]:
            plt.plot(x, self.epoch_accuracy[:, col], color=color,
                     linestyle=style, label=label, lw=2)
        for col, color, style, label in [
                (0, "g", ":", "train-loss-x50"),
                (1, "y", ":", "valid-loss-x50")]:
            plt.plot(x, self.epoch_losses[:, col], color=color,
                     linestyle=style, label=label, lw=2)
        plt.legend(loc=4, fontsize=10)
        if save_path:
            fig.savefig(save_path, dpi=80, bbox_inches="tight")
        plt.close(fig)
