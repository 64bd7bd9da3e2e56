"""Per-host input sharding (SURVEY.md §2.2 TPU-native table, last row).

Proper multi-host DP keeps the GLOBAL batch at cfg.batch_size: each host
loads a disjoint equal-length shard at batch_size/num_hosts and
shard_batch assembles the global array (make_array_from_process_local_data).
host_shard is tested directly across fake host ids (no process mocking —
running the real train loop under a mocked process_count would hand
single-process jax a multi-process code path); a spy run checks the
single-host identity wiring end to end.
"""
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.data.fixtures import generate_synthetic_dataset
from auformer.data.samplers import shard_indices
from auformer.train_lib import host_shard


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


def test_host_shard_single_host_identity():
    ids = list(range(37))
    local, bs = host_shard(ids, 64, host_id=0, num_hosts=1)
    assert local == ids and bs == 64


def test_host_shard_equal_disjoint_and_local_batch():
    ids = list(range(23))
    shards = [host_shard(ids, 64, host_id=h, num_hosts=4) for h in range(4)]
    lens = {len(s) for s, _ in shards}
    assert lens == {23 // 4}, "shards must be equal length (step parity)"
    assert all(bs == 16 for _, bs in shards)
    seen = set()
    for s, _ in shards:
        assert not seen & set(s)
        seen |= set(s)


def test_host_shard_rejects_indivisible_batch():
    with pytest.raises(AssertionError):
        host_shard(list(range(8)), 10, host_id=0, num_hosts=4)


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


def test_train_lib_single_host_sees_all_indices(tiny_cfg, monkeypatch):
    """Single-host wiring: the train sampler receives exactly the epoch's
    full (downsampled) train index set at the full batch size."""
    from auformer import train_lib
    from auformer.data.dataset import Aff2CompDataset

    np.random.seed(0)
    seen = []
    real_loader = train_lib.DataLoader

    class SpyLoader(real_loader):
        def __init__(self, dataset, batch_size, sampler, **kw):
            seen.append((batch_size,
                         np.sort(np.asarray(list(iter(sampler))))))
            super().__init__(dataset, batch_size, sampler, **kw)

    monkeypatch.setattr(train_lib, "DataLoader", SpyLoader)
    train_lib.train(tiny_cfg, max_steps_per_epoch=1, epochs=1)

    ds = Aff2CompDataset(tiny_cfg)
    bs, train_seen = seen[0]
    assert bs == tiny_cfg.batch_size
    expected = np.nonzero(ds.train_ids)[0]          # downsample_rate=1
    assert set(train_seen.tolist()) <= set(expected.tolist())
    assert len(train_seen) >= len(expected) - 1     # downsample mask edge


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
