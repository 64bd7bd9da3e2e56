"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md §4: multi-chip tests are
simulated with xla_force_host_platform_device_count=8).
"""
import os

# Env var alone is not enough: the axon TPU PJRT plugin in this image ignores
# JAX_PLATFORMS, so also force the platform through jax.config before any
# computation runs.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Fast tier (VERDICT r4 item 6): `pytest -m "not slow"` must finish in
# minutes so the pre-snapshot gate (scripts/pre_snapshot_check.sh) is
# cheap to run before EVERY end-of-round commit. Modules here compile
# full models, run e2e pipelines, or spawn processes — everything else is
# the quick tier.
_SLOW_MODULES = {
    "test_attention", "test_augment_device", "test_device_audio",
    "test_graft_entry", "test_inference", "test_models",
    "test_multihost", "test_multiprocess", "test_optimizer",
    "test_packed", "test_parallel", "test_phase_mel",
    "test_pth_roundtrip", "test_serve", "test_sweep",
    "test_sweep_sharded", "test_torch_import", "test_torch_import_zoo",
    "test_train_all_tasks", "test_train_e2e",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
