"""Model-zoo forward tests: shapes, dtypes, determinism, gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.nn import build_model, example_batch, init_model, loss_suite


def tiny_cfg(model_name, modality="V", task="AU", **kw):
    return Config(model_name=model_name, modality=modality, task=task,
                  n_frames=4, image_size=64, batch_size=2,
                  compute_dtype="float32", use_pallas=False, **kw)


def run_forward(cfg, train=False):
    model, variables = init_model(cfg)
    x = example_batch(cfg, batch_size=2)
    if train:
        out, mut = model.apply(variables, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(0)},
                               mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, train=False)
    return model, variables, np.asarray(out)


@pytest.mark.parametrize("name,modality", [
    ("vformer", "V"),
    ("avformer", "A;V"),
    ("audio", "A"),
    ("sformer", "V"),
    ("tformer", "V"),
    ("dsformer", "V;M"),
    ("resnet", "V"),
    ("van", "V"),
    ("i3d", "V"),
    ("mc3d", "V"),
    ("vggformer", "V"),
    ("emonet", "V"),
])
def test_forward_shapes(name, modality):
    cfg = tiny_cfg(name, modality)
    _, _, out = run_forward(cfg)
    assert out.shape == (2, 21)
    assert np.isfinite(out).all()


def test_tsav_forward_22():
    """tsav outputs 22 = 12 AU + 8 EX + 2 VA (tsav.py:71-74)."""
    cfg = tiny_cfg("tsav", "A;V")
    _, _, out = run_forward(cfg)
    assert out.shape == (2, 22)
    assert np.isfinite(out).all()


def test_avformer_au_task_layout():
    """AU task fills only the AU slice (avformer.py:102-106)."""
    cfg = tiny_cfg("avformer", "A;V")
    _, _, out = run_forward(cfg)
    assert not np.allclose(out[:, :12], 0)
    assert np.allclose(out[:, 12:], 0)


def test_vformer_train_mode_updates_batch_stats():
    cfg = tiny_cfg("vformer")
    model, variables = init_model(cfg)
    x = example_batch(cfg, batch_size=2)
    out, mut = model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)},
                           mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed


def test_vformer_grad_flow():
    cfg = tiny_cfg("vformer")
    model, variables = init_model(cfg)
    x = example_batch(cfg, batch_size=2)
    suite = loss_suite(model)
    labels = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0],
                       [0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1]], np.float32)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return suite.get_au_loss(out, labels)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    norms = [float(jnp.abs(t).sum()) for t in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.5


def test_forward_deterministic_eval():
    cfg = tiny_cfg("avformer", "A;V")
    model, variables = init_model(cfg)
    x = example_batch(cfg, batch_size=2)
    o1 = model.apply(variables, x, train=False)
    o2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_param_count_sanity():
    """avformer should be in the tens of millions of params (two resnet18
    trunks + heads), per SURVEY.md §2.2 (~11-35M)."""
    cfg = tiny_cfg("avformer", "A;V")
    _, variables = init_model(cfg)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 20e6 < n < 60e6, f"param count {n/1e6:.1f}M out of range"


@pytest.mark.parametrize("name,modality,t", [
    ("van", "V", 1),
    ("mc3d", "V", 4),
])
def test_backbone_grad_flow(name, modality, t):
    """Training-path smoke for the non-resnet backbones: gradients exist
    and are finite through VAN's LKA blocks / MC3's 3D convs."""
    cfg = tiny_cfg(name, modality)
    model, variables = init_model(cfg)
    x = example_batch(cfg, batch_size=2)
    suite = loss_suite(model)
    labels = np.tile(np.array([[1, 0] * 6], np.float32), (2, 1))

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return suite.get_au_loss(out, labels)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    norms = [float(jnp.abs(l).sum()) for l in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.4


import pytest as _pytest


@_pytest.mark.parametrize("name,modality", [("vformer", "V"),
                                            ("avformer", "A;V")])
def test_bf16_train_step_grads(name, modality):
    """bf16 (the production default) must differentiate: round-2 verify
    caught StemConv's preferred_element_type breaking the conv AD
    transpose rule under compute_dtype=bfloat16 — every other test pins
    f32, so this is the only bf16-gradient coverage. avformer adds the
    TokenProjection/TokenLogits dots and the audio stream."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from auformer.core.config import Config
    from auformer.nn import init_model, loss_suite
    from auformer.parallel import create_train_state, make_train_step

    cfg = Config(model_name=name, modality=modality, task="AU",
                 n_frames=2, image_size=32, batch_size=8,
                 compute_dtype="bfloat16", use_pallas=False)
    model, variables = init_model(cfg)
    state = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, loss_suite(model), mesh=None)
    rs = np.random.RandomState(0)
    batch = {
        "clip": rs.randint(0, 256, (8, 2, 32, 32, 3)).astype(np.uint8),
        "audio_features": rs.randn(8, 1, 64, 101).astype(np.float32),
        "AU": rs.randint(0, 2, (8, 12)).astype(np.float32),
        "EX": rs.randint(0, 7, (8, 1)).astype(np.int32),
        "VA": rs.uniform(-1, 1, (8, 2)).astype(np.float32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_jit_init_matches_eager_init():
    """init_model takes a jitted-init path on accelerator backends (one
    compiled program instead of thousands of eager tunnel dispatches —
    registry.init_model). The jitted init must produce the identical
    variable tree as flax's eager init."""
    import functools

    cfg = Config(model_name="vformer", modality="V", task="AU",
                 n_frames=2, image_size=32, batch_size=2,
                 compute_dtype="float32", use_pallas=False)
    model = build_model(cfg)
    x = example_batch(cfg, batch_size=2)
    rngs = {"params": jax.random.PRNGKey(cfg.seed),
            "dropout": jax.random.PRNGKey(1)}
    eager = model.init(rngs, x, train=False)
    jitted = jax.jit(functools.partial(model.init, train=False))(rngs, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        eager, jitted)
