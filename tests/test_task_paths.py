"""Task-specific model paths: sformer AU/VA head overrides, EX/VA losses
through the step builder."""
import jax
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.nn import build_model, example_batch, init_model, loss_suite
from auformer.parallel import create_train_state, make_train_step


def cfg_for(name, task, modality="V"):
    return Config(model_name=name, modality=modality, task=task,
                  n_frames=1 if name in ("sformer", "dsformer", "van",
                                         "emonet", "resnet") else 2,
                  image_size=64, batch_size=4, compute_dtype="float32",
                  use_pallas=False, lr_schedule=False)


def test_sformer_va_head_overrides_slice():
    """task='VA': VA_former output replaces out[:, -2:]
    (sformer.py:378-380)."""
    cfg_au = cfg_for("sformer", "AU")
    cfg_va = cfg_for("sformer", "VA")
    x = example_batch(cfg_au, batch_size=2)
    m_au, v_au = init_model(cfg_au)
    m_va, v_va = init_model(cfg_va)
    out_au = np.asarray(m_au.apply(v_au, x, train=False))
    out_va = np.asarray(m_va.apply(v_va, x, train=False))
    assert out_au.shape == out_va.shape == (2, 21)
    # different heads drive the respective slices; both finite
    assert np.isfinite(out_au).all() and np.isfinite(out_va).all()


@pytest.mark.parametrize("task", ["EX", "VA"])
def test_train_step_runs_for_task(task):
    cfg = cfg_for("vformer", task)
    model, variables = init_model(cfg)
    state = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, loss_suite(model), donate=False)
    rs = np.random.RandomState(0)
    batch = {"clip": rs.randint(0, 256, (4, 2, 64, 64, 3)).astype(np.uint8),
             "AU": rs.randint(0, 2, (4, 12)).astype(np.float32),
             "EX": np.array([[0], [3], [-1], [6]], np.int32),
             "VA": rs.uniform(-1, 1, (4, 2)).astype(np.float32)}
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_ex_sentinel_remap_in_step():
    """EX = -1 rows must not blow up the CE (remapped to ignore 7,
    train.py:126,208)."""
    cfg = cfg_for("vformer", "EX")
    model, variables = init_model(cfg)
    state = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, loss_suite(model), donate=False)
    rs = np.random.RandomState(0)
    batch = {"clip": rs.randint(0, 256, (4, 2, 64, 64, 3)).astype(np.uint8),
             "AU": -np.ones((4, 12), np.float32),
             "EX": -np.ones((4, 1), np.int32),      # ALL sentinels
             "VA": np.full((4, 2), -5.0, np.float32)}
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert float(metrics["loss"]) == 0.0  # every row ignored
