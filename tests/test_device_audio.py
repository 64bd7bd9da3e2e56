"""On-device mel frontend for training (cfg.device_audio).

The reference computes a 10 s log-mel on the HOST inside every
``__getitem__`` (aff2compdataset.py:227-238) — ~6 ms/clip of the input
pipeline the TPU rebuild moves into the jitted step. These tests pin the
device path (dataset raw-window production -> prep_batch reflect patch +
left-aligned frontend) to the exact host reference features.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.data.dataset import Aff2CompDataset
from auformer.data.fixtures import generate_synthetic_dataset
from auformer.data.samplers import collate
from auformer.ops import audio_host
from auformer.ops.audio import (HOP_LENGTH, audio_frontend,
                                reflect_end_patch)
from auformer.parallel.step import prep_batch


@pytest.fixture(scope="module")
def dataset_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("aff2da")
    root = str(base / "root")
    label = str(base / "labels")
    generate_synthetic_dataset(root, label, n_videos=2, frames_per_video=40,
                               image_size=64, audio_secs=3.0)
    return root, label, str(base / "cache")


def make_cfg(dataset_dirs, **kw):
    root, label, cache = dataset_dirs
    defaults = dict(root=root, lmdb_label_dir=label, cache_dir=cache,
                    image_size=64, n_frames=4, dilation=3, modality="A;V",
                    task="AU")
    defaults.update(kw)
    return Config(**defaults)


def _device_feats(audio_1xn: np.ndarray, slen: int = 441000) -> np.ndarray:
    """Run the prep_batch device pipeline on one left-aligned raw window."""
    n_valid = audio_1xn.shape[1]
    buf = np.zeros((1, slen), np.float32)
    buf[:, :n_valid] = audio_1xn
    raw = reflect_end_patch(jnp.asarray(buf), jnp.asarray([n_valid]))
    out = audio_frontend(raw,
                         feature_len=jnp.asarray([1 + n_valid // HOP_LENGTH]),
                         left_aligned=True)
    return np.asarray(out[0])


@pytest.mark.parametrize("n_valid", [441000,          # full 10 s window
                                     44100 * 3 + 17,  # short (video start)
                                     882,             # single STFT frame pair
                                     600])            # just above the 513 min
def test_frontend_matches_host_reference(n_valid):
    rs = np.random.RandomState(7)
    audio = (rs.randn(1, n_valid) * 0.1).astype(np.float32)
    ref, _ = audio_host.reference_audio_features(audio)
    got = _device_feats(audio)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_full_window_unchanged_by_patch():
    rs = np.random.RandomState(3)
    buf = (rs.randn(2, 441000) * 0.1).astype(np.float32)
    out = np.asarray(reflect_end_patch(jnp.asarray(buf),
                                       jnp.asarray([441000, 441000])))
    np.testing.assert_array_equal(out, buf)


def test_dataset_device_audio_items(dataset_dirs):
    cfg = make_cfg(dataset_dirs, device_audio=True)
    ds = Aff2CompDataset(cfg)
    ds.set_modes(["clip", "audio_features"])
    s = ds[0]
    assert "audio_features" not in s
    assert s["audio"].shape == (1, 441000)
    assert s["audio"].dtype == np.float32
    assert int(s["audio_len"]) >= 882
    # the raw window is LEFT-aligned: zeros after audio_len
    assert np.all(s["audio"][0, int(s["audio_len"]):] == 0)


def test_prep_batch_matches_host_dataset(dataset_dirs):
    """End-to-end: device_audio batch through prep_batch equals the host
    dataset's audio_features for the same indices."""
    cfg_h = make_cfg(dataset_dirs)
    cfg_d = make_cfg(dataset_dirs, device_audio=True)
    ds_h = Aff2CompDataset(cfg_h)
    ds_d = Aff2CompDataset(cfg_d)
    for ds in (ds_h, ds_d):
        ds.set_modes(["clip", "audio_features"])
    idx = [0, 5, len(ds_h) - 1]  # includes a short start-of-video window
    batch = collate([ds_d[i] for i in idx])
    x = prep_batch({k: jnp.asarray(v) for k, v in batch.items()
                    if k in ("audio", "audio_len")},
                   train=False, device_audio=True)
    want = np.stack([ds_h[i]["audio_features"] for i in idx])
    np.testing.assert_allclose(np.asarray(x["audio_features"]), want,
                               rtol=2e-4, atol=2e-4)
    assert "audio" not in x or x["audio"].shape  # raw entries may remain


def test_train_step_device_audio(dataset_dirs):
    """One jitted train step consumes the raw-audio batch (mel computed
    inside the step) and matches the host-frontend step's loss."""
    from auformer.nn import init_model, loss_suite
    from auformer.parallel import create_train_state, make_train_step

    cfg = make_cfg(dataset_dirs, device_audio=True, batch_size=2,
                   model_name="avformer")
    model, variables = init_model(cfg)
    suite = loss_suite(model)
    ds = Aff2CompDataset(cfg)
    ds.set_modes(list(model.modes))
    batch = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, (list, tuple)) or not isinstance(v[0], str)}
    state = create_train_state(cfg, model, variables)
    step = make_train_step(cfg, model, suite, mesh=None, donate=False)
    rng = jax.random.PRNGKey(0)
    new_state, metrics = step(state, batch, rng)
    loss_d = float(metrics["loss"])
    assert np.isfinite(loss_d)

    # host-frontend reference: same clips, host-computed mels
    cfg_h = make_cfg(dataset_dirs, batch_size=2, model_name="avformer")
    ds_h = Aff2CompDataset(cfg_h)
    ds_h.set_modes(list(model.modes))
    batch_h = collate([ds_h[0], ds_h[1]])
    batch_h = {k: jnp.asarray(v) for k, v in batch_h.items()
               if not isinstance(v, (list, tuple))
               or not isinstance(v[0], str)}
    step_h = make_train_step(cfg_h, model, suite, mesh=None, donate=False)
    _, metrics_h = step_h(state, batch_h, rng)
    np.testing.assert_allclose(loss_d, float(metrics_h["loss"]),
                               rtol=1e-4, atol=1e-4)


def test_wav_arena_windows_bitwise(dataset_dirs):
    """Arena-gathered windows equal the host get_audio_window buffers
    bitwise (same offsets/valid counts, zero tail), incl. the missing-wav
    fallback onto the zero region."""
    from auformer.data.wav_arena import build_wav_arena
    from auformer.parallel.step import gather_arena_windows

    cfg = make_cfg(dataset_dirs, device_audio=True)
    ds = Aff2CompDataset(cfg)
    ds.set_modes(["clip", "audio_features"])
    plan = build_wav_arena(ds, cap_mb=256)
    assert plan is not None and len(plan.table) == 2
    # zero region really is zero
    assert np.all(plan.arena[plan.zero_ofs:plan.zero_ofs
                             + plan.sample_len] == 0)

    idx = [0, 5, len(ds) - 1]
    want, ofs, ln = [], [], []
    for i in idx:
        vid = os.path.dirname(ds.image_path[i])
        buf, n = ds.get_audio_window(vid, i)
        o, nv = plan.window(vid, ds.time_stamps[i], ds.sample_rate,
                            ds.audio_shift_samples)
        assert nv == n
        want.append(buf[0])
        ofs.append(o)
        ln.append(nv)
    got = gather_arena_windows(jnp.asarray(plan.arena),
                               jnp.asarray(ofs, jnp.int32),
                               jnp.asarray(ln, jnp.int32),
                               ds.sample_len_frames)
    np.testing.assert_array_equal(np.asarray(got), np.stack(want))

    # missing wav -> full zero window, like the host zero-buffer substitute
    o, nv = plan.window("no_such_video", 500.0, ds.sample_rate,
                        ds.audio_shift_samples)
    assert (o, nv) == (plan.zero_ofs, plan.sample_len)


def test_dataset_arena_items(dataset_dirs):
    cfg = make_cfg(dataset_dirs, device_audio=True)
    ds = Aff2CompDataset(cfg)
    ds.set_modes(["clip", "audio_features"])
    from auformer.data.wav_arena import build_wav_arena
    ds.set_audio_arena(build_wav_arena(ds, cap_mb=256))
    s = ds[0]
    assert "audio" not in s and "audio_features" not in s
    assert s["audio_ofs"].dtype == np.int32
    assert int(s["audio_len"]) >= 882


def test_train_step_arena_matches_window(dataset_dirs):
    """A train step fed arena offsets equals the raw-window step exactly
    (the gathered buffers are bitwise identical, so the f32 program is
    too)."""
    from auformer.data.wav_arena import build_wav_arena
    from auformer.nn import init_model, loss_suite
    from auformer.parallel import create_train_state, make_train_step

    cfg = make_cfg(dataset_dirs, device_audio=True, batch_size=2,
                   model_name="avformer")
    model, variables = init_model(cfg)
    suite = loss_suite(model)
    ds = Aff2CompDataset(cfg)
    ds.set_modes(list(model.modes))

    def dev(b):
        return {k: jnp.asarray(v) for k, v in b.items()
                if not isinstance(v, (list, tuple))
                or not isinstance(v[0], str)}

    batch_w = dev(collate([ds[0], ds[1]]))
    plan = build_wav_arena(ds, cap_mb=256)
    ds.set_audio_arena(plan)
    batch_a = dev(collate([ds[0], ds[1]]))
    assert "audio" not in batch_a and "audio_ofs" in batch_a

    state = create_train_state(cfg, model, variables)
    rng = jax.random.PRNGKey(0)
    step_w = make_train_step(cfg, model, suite, mesh=None, donate=False)
    _, m_w = step_w(state, batch_w, rng)
    step_a = make_train_step(cfg, model, suite, mesh=None, donate=False,
                             with_arena=True)
    _, m_a = step_a(state, batch_a, rng, jnp.asarray(plan.arena))
    assert float(m_a["loss"]) == pytest.approx(float(m_w["loss"]),
                                               rel=1e-6, abs=1e-6)


def test_run_inference_device_audio_matches_host(dataset_dirs):
    """run_inference under --device_audio (mel inside the jitted forward)
    equals the host-frontend run."""
    from auformer.infer import run_inference
    from auformer.nn import init_model
    import tempfile

    cfg_h = make_cfg(dataset_dirs, batch_size=4, model_name="avformer")
    model, variables = init_model(cfg_h)
    with tempfile.TemporaryDirectory() as td:
        ref = run_inference(cfg_h, variables, result_path=td + "/r1")
        cfg_d = make_cfg(dataset_dirs, batch_size=4, model_name="avformer",
                         device_audio=True)
        got = run_inference(cfg_d, variables, result_path=td + "/r2")
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
