"""Short e2e: multi-task (ALL) training and the audio-visual path."""
import numpy as np
import pytest

from auformer.core.config import Config
from auformer.data.fixtures import generate_synthetic_dataset
from auformer import train_lib


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("mt")
    root = str(base / "root")
    label = str(base / "labels")
    generate_synthetic_dataset(root, label, n_videos=3, frames_per_video=24,
                               image_size=32, audio_secs=1.5)
    return base, root, label


def test_all_task_vformer(dirs):
    base, root, label = dirs
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(base / "cache"), exp_dir=str(base / "exp1"),
                 model_name="vformer", modality="V", task="ALL",
                 n_frames=2, dilation=2, image_size=32, batch_size=8,
                 downsample_rate=1, compute_dtype="float32",
                 use_pallas=False, host_threads=2, eval_batch_mult=1)
    state, history = train_lib.train(cfg, max_steps_per_epoch=2, epochs=1)
    h = history[0]
    # multi-task: per-task losses recorded, composite = sum of task scores
    assert np.isfinite(h["loss"])
    s = h["scores"]
    assert h["score"] == pytest.approx(
        s["EX"]["score"] + s["AU"]["score"] + s["VA"]["score"])


def test_audio_visual_avformer_step(dirs):
    """A/V avformer through the real dataset audio pipeline (frozen streams:
    only the fusion head trains)."""
    import jax
    base, root, label = dirs
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(base / "cache"), exp_dir=str(base / "exp2"),
                 model_name="avformer", modality="A;V", task="AU",
                 n_frames=2, dilation=2, image_size=32, batch_size=8,
                 downsample_rate=1, compute_dtype="float32",
                 use_pallas=False, host_threads=2, eval_batch_mult=1)
    state, history = train_lib.train(cfg, max_steps_per_epoch=2, epochs=1)
    assert np.isfinite(history[0]["loss"])
    # frozen streams: audio/video params unchanged after the step
    from auformer.nn import init_model
    _, init_vars = init_model(cfg)
    for stream in ("audio_model", "video_model"):
        a = jax.tree_util.tree_leaves(init_vars["params"][stream])
        b = jax.tree_util.tree_leaves(
            jax.device_get(state.params)[stream])
        assert all(np.allclose(x, y) for x, y in zip(a, b)), stream
    # the fusion head DID move
    a = jax.tree_util.tree_leaves(init_vars["params"]["au_head"])
    b = jax.tree_util.tree_leaves(jax.device_get(state.params)["au_head"])
    assert any(not np.allclose(x, y) for x, y in zip(a, b))


def test_mask_modality_dsformer_step(dirs):
    """V;M training through the real dataset (4-channel clips, mask
    normalization constants, dual-trunk dsformer)."""
    base, root, label = dirs
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(base / "cache"), exp_dir=str(base / "exp3"),
                 model_name="dsformer", modality="V;M", task="AU",
                 n_frames=1, dilation=1, image_size=32, batch_size=8,
                 downsample_rate=1, compute_dtype="float32",
                 use_pallas=False, host_threads=2, eval_batch_mult=1)
    state, history = train_lib.train(cfg, max_steps_per_epoch=2, epochs=1)
    assert np.isfinite(history[0]["loss"])
