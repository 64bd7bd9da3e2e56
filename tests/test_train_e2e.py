"""End-to-end slice (SURVEY.md §7.2-4): synthetic store -> decode -> device
preprocess -> jitted SPMD step on the 8-device CPU mesh -> masked loss ->
metrics -> checkpoint. Uses vformer, visual-only, task=AU on tiny shapes.
"""
import os

import jax
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.core.checkpointing import load_checkpoint
from auformer.data.fixtures import generate_synthetic_dataset
from auformer import train_lib


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    root = str(base / "root")
    label = str(base / "labels")
    generate_synthetic_dataset(root, label, n_videos=3, frames_per_video=40,
                               image_size=32, audio_secs=2.0)
    return Config(root=root, lmdb_label_dir=label,
                  cache_dir=str(base / "cache"),
                  exp_dir=str(base / "exp"),
                  model_name="vformer", modality="V", task="AU",
                  n_frames=2, dilation=2, image_size=32,
                  batch_size=8, downsample_rate=1, epochs=2,
                  learning_rate=1e-3, compute_dtype="float32",
                  use_pallas=False, host_threads=2, early_stop_step=30)


def test_train_two_epochs(cfg):
    assert jax.device_count() == 8  # virtual CPU mesh (conftest)
    state, history = train_lib.train(cfg, max_steps_per_epoch=4)
    assert len(history) == 2
    assert np.isfinite(history[-1]["loss"])
    # checkpoints written
    assert os.path.isdir(os.path.join(cfg.exp_dir, "pretrain", "latest"))
    assert os.path.isdir(os.path.join(cfg.exp_dir, "pretrain", "best"))
    # scores present for all tasks
    s = history[-1]["scores"]
    assert set(s) >= {"EX", "AU", "VA", "loss"}
    # restore roundtrip
    restored = load_checkpoint(os.path.join(cfg.exp_dir, "pretrain"),
                               "latest")
    assert restored is not None
    lhs = jax.tree_util.tree_leaves(restored["params"])
    rhs = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert len(lhs) == len(rhs)
    np.testing.assert_allclose(np.asarray(lhs[0]), np.asarray(rhs[0]))


def test_loss_decreases_on_overfit(cfg):
    """A few steps on a fixed tiny subset should reduce the loss."""
    import copy
    c = copy.deepcopy(cfg)
    c.exp_dir = cfg.exp_dir + "_overfit"
    c.learning_rate = 3e-3
    c.lr_schedule = False
    state, history = train_lib.train(c, max_steps_per_epoch=6, epochs=3)
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0]


def test_training_determinism(cfg):
    """Same seed -> identical first-epoch losses (setup_seed + functional
    PRNG; utils.py:14-19 reproducibility contract)."""
    import copy
    losses = []
    for run in range(2):
        c = copy.deepcopy(cfg)
        c.exp_dir = cfg.exp_dir + f"_det{run}"
        _, history = train_lib.train(c, max_steps_per_epoch=3, epochs=1)
        losses.append(history[0]["loss"])
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)


def test_train_steps_per_dispatch(cfg):
    """steps_per_dispatch=2 (K scanned steps per device program) trains the
    same number of steps and finishes with a finite loss; the epoch tail
    shorter than K falls back to the single-step program."""
    import copy
    c = copy.deepcopy(cfg)
    c.exp_dir = cfg.exp_dir + "_spd"
    c.steps_per_dispatch = 2
    state, history = train_lib.train(c, max_steps_per_epoch=3, epochs=1)
    assert np.isfinite(history[0]["loss"])
    # 3 loader batches: one K=2 dispatch + a 1-batch tail
    assert int(state.step) >= 3


def test_train_device_audio_arena(cfg):
    """train() with device_audio on an A;V model auto-builds the wav arena
    (fixture audio fits the cap), feeds int32 offset batches through the
    sharded step, and finishes with a finite loss."""
    import copy
    c = copy.deepcopy(cfg)
    c.exp_dir = cfg.exp_dir + "_arena"
    c.model_name = "avformer"
    c.modality = "A;V"
    c.device_audio = True
    state, history = train_lib.train(c, max_steps_per_epoch=2, epochs=1)
    assert np.isfinite(history[0]["loss"])
    assert int(state.step) >= 2


def test_train_frame_dedup_locality(cfg):
    """The production TPU input path: BlockShuffleSampler runs +
    frame-dedup batches (unique-frame pool + device-side clip expand) +
    device AutoAugment, through train() AND the per-epoch eval — finite
    loss, steps taken, scores produced."""
    import copy
    c = copy.deepcopy(cfg)
    c.exp_dir = cfg.exp_dir + "_dedup"
    c.device_augment = True
    c.frame_dedup = True
    c.locality_run = 8
    c.steps_per_dispatch = 2
    state, history = train_lib.train(c, max_steps_per_epoch=4, epochs=1)
    assert np.isfinite(history[0]["loss"])
    assert int(state.step) >= 4
    assert set(history[0]["scores"]) >= {"EX", "AU", "VA", "loss"}
