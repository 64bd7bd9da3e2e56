"""Multi-chip semantics on the virtual 8-device mesh: GSPMD must make the
sharded train step numerically equal to the single-device step — including
the cross-replica BatchNorm statistics (SURVEY.md §7.3-2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.core.mesh import data_sharding, make_mesh, shard_batch
from auformer.nn import init_model, loss_suite
from auformer.parallel import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model_name="vformer", modality="V", task="AU", n_frames=2,
                 image_size=32, batch_size=16, compute_dtype="float32",
                 use_pallas=False, lr_schedule=False)
    model, variables = init_model(cfg)
    suite = loss_suite(model)
    rs = np.random.RandomState(0)
    batch = {"clip": rs.randint(0, 256, (16, 2, 32, 32, 3)).astype(np.uint8),
             "AU": rs.randint(0, 2, (16, 12)).astype(np.float32),
             "EX": rs.randint(0, 7, (16, 1)).astype(np.int32),
             "VA": rs.uniform(-1, 1, (16, 2)).astype(np.float32)}
    return cfg, model, variables, suite, batch


def test_sharded_step_matches_single_device(setup):
    """Loss, gradients, and BN batch statistics of the sharded global
    program must equal the single-device run (up to reduction-order float
    noise). Post-Adam parameters are NOT compared: at step one Adam's
    update is ~sign(g)*lr, which amplifies reassociation noise on
    near-zero gradients."""
    cfg, model, variables, suite, batch = setup
    key = jax.random.PRNGKey(7)

    # single device
    state1 = create_train_state(cfg, model, variables)
    step1 = make_train_step(cfg, model, suite, donate=False)
    state1, m1 = step1(state1, batch, key)

    # 8-device mesh, batch sharded
    mesh = make_mesh("data:-1")
    assert mesh.shape["data"] == 8
    state8 = create_train_state(cfg, model, variables)
    step8 = make_train_step(cfg, model, suite, mesh, donate=False)
    state8, m8 = step8(state8, shard_batch(mesh, batch), key)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)

    # gradients: first Adam moment after one step IS the (decayed) gradient
    def first_moment(state):
        for entry in jax.tree_util.tree_leaves(
                state.opt_state, is_leaf=lambda x: hasattr(x, "mu")):
            if hasattr(entry, "mu"):
                return jax.device_get(entry.mu)
        raise AssertionError("no adam state found")

    g1 = jax.tree_util.tree_leaves(first_moment(state1))
    g8 = jax.tree_util.tree_leaves(first_moment(state8))
    for a, b in zip(g1, g8):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)

    # BatchNorm running stats identical: the sharded step computed GLOBAL
    # batch statistics (cross-replica BN), not per-shard ones
    s1 = jax.tree_util.tree_leaves(jax.device_get(state1.batch_stats))
    s8 = jax.tree_util.tree_leaves(jax.device_get(state8.batch_stats))
    worst = max(float(np.abs(a - b).max()) for a, b in zip(s1, s8))
    assert worst < 1e-4, f"batch-stat divergence {worst}"


def test_batch_sharding_layout(setup):
    cfg, model, variables, suite, batch = setup
    mesh = make_mesh("data:-1")
    dev = shard_batch(mesh, batch)
    sh = dev["clip"].sharding
    assert sh == data_sharding(mesh, dev["clip"].ndim)
    # each device holds batch/8 rows
    shard_shapes = {s.data.shape for s in dev["clip"].addressable_shards}
    assert shard_shapes == {(2, 2, 32, 32, 3)}


def test_multi_train_step_matches_sequential(setup):
    """K steps scanned inside ONE device program (make_multi_train_step)
    must equal K sequential make_train_step dispatches — same rng stream
    (fold_in(rng, i)), same BN stat evolution, same final params."""
    from auformer.parallel import (make_device_stacker,
                                   make_multi_train_step, stack_batches)

    cfg, model, variables, suite, batch = setup
    rng = jax.random.PRNGKey(11)
    rs = np.random.RandomState(1)
    k = 3
    batches = []
    for i in range(k):
        b = dict(batch)
        b["clip"] = rs.randint(0, 256, batch["clip"].shape).astype(np.uint8)
        batches.append(b)

    mesh = make_mesh("data:-1")
    state_seq = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, suite, mesh, donate=False)
    seq_losses = []
    for i, b in enumerate(batches):
        state_seq, m = step(state_seq, shard_batch(mesh, b),
                            jax.random.fold_in(rng, i))
        seq_losses.append(float(m["loss"]))

    state_k = create_train_state(cfg, model, variables)
    multi = make_multi_train_step(cfg, model, suite, mesh, donate=False)
    stacked = shard_batch(mesh, stack_batches(batches), batch_dim=1)
    assert stacked["clip"].shape == (k,) + batch["clip"].shape

    # the device-side stacker (K async per-batch H2D puts + one in-HBM
    # stack — the production K-dispatch input path) must build the same
    # (K, B, ...) pytree with the same (None, 'data') sharding
    stacker = make_device_stacker(mesh)
    dev_stacked = stacker(*[shard_batch(mesh, {kk: v for kk, v in b.items()
                                               if kk in stacked})
                            for b in batches])
    for kk in stacked:
        np.testing.assert_array_equal(np.asarray(dev_stacked[kk]),
                                      np.asarray(stacked[kk]))
        assert dev_stacked[kk].sharding.is_equivalent_to(
            stacked[kk].sharding, stacked[kk].ndim)

    state_k, mk = multi(state_k, stacked, rng)

    # step-0 losses agree exactly; later steps see reduction-order float
    # noise amplified through Adam (~sign(g)*lr on near-zero grads), the
    # same reason test_sharded_step_matches_single_device skips post-Adam
    # params — the loss SEQUENCE matching proves the scanned state threads
    # (params/opt/BN updated between steps feed the next step's loss)
    assert float(np.asarray(mk["loss"])[0]) == pytest.approx(
        seq_losses[0], rel=1e-6)
    np.testing.assert_allclose(np.asarray(mk["loss"]), seq_losses,
                               rtol=1e-3)
    assert int(state_k.step) == int(state_seq.step) == k
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(
            state_seq.batch_stats)), jax.tree_util.tree_leaves(
            jax.device_get(state_k.batch_stats))):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)


def test_clip_expander_dedup_step_matches_dense(setup):
    """Frame-dedup input path on the mesh: expand(frames, clip_idx) feeds
    the train step the same clips as the dense path -> identical loss."""
    from auformer.parallel import expand_dedup_batch, make_clip_expander

    cfg, model, variables, suite, batch = setup
    mesh = make_mesh("data:-1")
    key = jax.random.PRNGKey(11)

    # synthesize a dedup batch from the dense clips: unique frames pooled,
    # one frame shared by every sample (slot collisions exercised), slot 0
    # black for two windows
    clips = batch["clip"]
    b, t = clips.shape[:2]
    flat = clips.reshape(b * t, *clips.shape[2:]).copy()
    flat[1::t] = flat[1]                      # share one frame everywhere
    u_pad = 64
    frames = np.zeros((u_pad,) + flat.shape[1:], np.uint8)
    clip_idx = np.zeros((b, t), np.int32)
    pool: dict[bytes, int] = {}
    nxt = 1
    for i in range(b * t):
        key_b = flat[i].tobytes()
        if key_b not in pool:
            pool[key_b] = nxt
            frames[nxt] = flat[i]
            nxt += 1
        clip_idx[i // t, i % t] = pool[key_b]
    clip_idx[0, 0] = 0                        # black sentinel frames
    clip_idx[3, 1] = 0
    dense = frames[clip_idx]

    state = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, suite, mesh, donate=False)
    dense_batch = dict(batch, clip=dense)
    _, m_dense = step(state, shard_batch(mesh, dense_batch), key)

    expander = make_clip_expander(mesh)
    dd = dict(batch)
    del dd["clip"]
    dd["frames"], dd["clip_idx"] = frames, clip_idx
    sharded = shard_batch(mesh, dd, replicate_keys=("frames",))
    assert sharded["frames"].sharding.is_fully_replicated
    expanded = expand_dedup_batch(sharded, expander)
    assert "frames" not in expanded and "clip_idx" not in expanded
    np.testing.assert_array_equal(np.asarray(expanded["clip"]), dense)
    _, m_dd = step(state, expanded, key)
    assert float(m_dd["loss"]) == pytest.approx(float(m_dense["loss"]),
                                                rel=1e-6)
