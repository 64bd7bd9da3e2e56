"""Data-parallel sharded sweep == single-device sweep (virtual 8-dev mesh).

The production-serving form of the dense sweep: weights replicated over a
``jax.sharding.Mesh``, each bucket's frames/audio/window-rows committed
with leading-dim 'data' sharding, one GSPMD program per bucket (XLA
inserts the (N+1, 512) feature all-gather that cross-shard window gathers
need). The reference's inference path is single-GPU batch-1
(test_aff2.py:82-117); scaling it is mesh-native here, not NCCL code.
"""
import numpy as np

import jax

from auformer.core.config import Config
from auformer.core.mesh import make_mesh
from auformer.nn import init_model
from auformer.sweep import make_sweep


def _cfg(model_name, modality):
    return Config(model_name=model_name, modality=modality, task="AU",
                  n_frames=4, dilation=2, image_size=32,
                  compute_dtype="float32", use_pallas=False)


def test_avformer_sweep_sharded_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must provision 8 CPU devices"
    cfg = _cfg("avformer", "A;V")
    model, variables = init_model(cfg)

    rs = np.random.RandomState(0)
    n = 21  # not a bucket multiple: exercises padding + uneven frames chunk
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    audio = rs.randn(n, 1, 64, 1001).astype(np.float32)

    ref = make_sweep(cfg, variables).sweep_video(frames, audio, batch=12)
    mesh = make_mesh("data:-1")
    got = make_sweep(cfg, variables, mesh=mesh).sweep_video(
        frames, audio, batch=12)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_vformer_sweep_sharded_matches_single_device():
    cfg = _cfg("vformer", "V")
    model, variables = init_model(cfg)

    rs = np.random.RandomState(1)
    n = 13
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)

    ref = make_sweep(cfg, variables).sweep_video(frames, batch=6)
    mesh = make_mesh("data:-1")
    got = make_sweep(cfg, variables, mesh=mesh).sweep_video(frames, batch=6)
    assert got.shape == (n, 21)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_device_audio_sweep_sharded_matches_single_device():
    """The production serving path (whole-video wav on device, per-window
    mel in the fused program) sharded over the mesh == single-device."""
    cfg = _cfg("avformer", "A;V")
    model, variables = init_model(cfg)

    rs = np.random.RandomState(2)
    n = 13
    frames = rs.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
    wav = (rs.randn(2 * 44100) * 0.1).astype(np.float32)
    ts = (np.arange(n) * 1000.0 / 30.0)

    ref = make_sweep(cfg, variables).sweep_video_device_audio(
        frames, wav, ts, batch=8)
    mesh = make_mesh("data:-1")
    got = make_sweep(cfg, variables, mesh=mesh).sweep_video_device_audio(
        frames, wav, ts, batch=8)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
