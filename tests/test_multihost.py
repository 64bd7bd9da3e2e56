"""Per-host input sharding wiring (VERDICT.md round-1 item 6).

train_lib must feed each process a disjoint stride of the epoch's indices
(SURVEY.md §2.2 TPU-native table, last row). Simulated by faking
jax.process_index/process_count and spying on the samplers train_lib
builds; single-host behavior is the identity.
"""
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.data.fixtures import generate_synthetic_dataset
from auformer.data.samplers import shard_indices


def test_shard_indices_identity_single_host():
    idx = list(range(10))
    assert shard_indices(idx, 0, 1) == idx


def test_shard_indices_disjoint_cover():
    idx = list(range(23))
    shards = [shard_indices(idx, h, 4) for h in range(4)]
    flat = sorted(i for s in shards for i in s)
    assert flat == idx
    for a in range(4):
        for b in range(a + 1, 4):
            assert not set(shards[a]) & set(shards[b])


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    base = tmp_path_factory.mktemp("multihost")
    root, label = str(base / "root"), str(base / "labels")
    generate_synthetic_dataset(root, label, n_videos=4,
                               frames_per_video=64, image_size=32,
                               audio_secs=1.0)
    return Config(root=root, lmdb_label_dir=label,
                  cache_dir=str(base / "cache"),
                  exp_dir=str(base / "exp"),
                  model_name="vformer", modality="V", task="AU",
                  n_frames=2, dilation=2, image_size=32, batch_size=8,
                  downsample_rate=1, compute_dtype="float32",
                  use_pallas=False, host_threads=2, early_stop_step=99)


def _run_host(monkeypatch, cfg, host_id, num_hosts, seen):
    from auformer import train_lib

    monkeypatch.setattr("jax.process_index", lambda: host_id)
    monkeypatch.setattr("jax.process_count", lambda: num_hosts)
    # orbax refuses to save when process_count > 1 without a real
    # distributed runtime; checkpointing is not under test here
    monkeypatch.setattr(train_lib, "save_checkpoint", lambda *a, **k: None)
    monkeypatch.setattr("auformer.core.checkpointing.save_checkpoint",
                        lambda *a, **k: None)
    real_loader = train_lib.DataLoader

    class SpyLoader(real_loader):
        def __init__(self, dataset, batch_size, sampler, **kw):
            seen.append(np.sort(np.asarray(list(iter(sampler)))))
            super().__init__(dataset, batch_size, sampler, **kw)

    monkeypatch.setattr(train_lib, "DataLoader", SpyLoader)
    train_lib.train(cfg, max_steps_per_epoch=1, epochs=1)


def test_train_lib_hosts_see_disjoint_indices(tiny_cfg, monkeypatch):
    np.random.seed(0)
    seen0, seen1 = [], []
    _run_host(monkeypatch, tiny_cfg, 0, 2, seen0)
    _run_host(monkeypatch, tiny_cfg, 1, 2, seen1)
    # loader 0 of each run is the train loader, loader 1 the val loader
    assert len(seen0) >= 2 and len(seen1) >= 2
    for a, b in zip(seen0, seen1):
        assert not set(a.tolist()) & set(b.tolist()), \
            "hosts fed overlapping indices"
        assert len(a) + len(b) > 0


def test_maybe_init_distributed_env_branch(monkeypatch):
    """The coordinator env var triggers jax.distributed.initialize;
    absent -> no-op (SURVEY §2.2 DCN row)."""
    import jax

    from auformer.core.mesh import maybe_init_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_init_distributed() is False
    assert not calls
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    assert maybe_init_distributed() is True
    assert calls == [1]
