"""Benchmark: clips/sec/chip for 16-frame A/V AU inference (BASELINE.md).

Primary metric: the dense-sweep path (auformer/sweep.py) — every video
frame scored, exactly the reference's test+val submission workload
(test_aff2.py:93-117, "5+ hours" at batch 1 on a 2080 Ti). The sweep
computes bit-identical clip logits while running the visual trunk once per
frame instead of once per window; the on-device mel frontend is included.
A secondary field reports the plain clip-batch path (independent windows,
no frame reuse — the fair number for random-access inference).

One JSON line:
    {"metric": "clips_per_sec_per_chip", "value": N, "unit": "clips/s",
     "vs_baseline": R, "mode": "dense_sweep",
     "clip_batch_clips_per_sec": M}

Measurement notes: the attached chip sits behind an RPC tunnel with ~30 ms
dispatch round-trip and a block_until_ready that returns early, so timed
regions loop inside ONE jitted lax.fori_loop (inputs perturbed per
iteration against loop hoisting) and fetch a single scalar.

vs_baseline: the reference's sweep rate is estimated at ~39 clips/s
(~700k test+val frames / 5 h, test_aff2.py:82).
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_CLIPS_PER_SEC = 39.0  # see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from auformer.core.config import Config
    from auformer.nn import init_model
    from auformer.ops.audio import audio_frontend
    from auformer.ops.preprocess import normalize_clip
    from auformer.sweep import AvformerSweep

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=16, image_size=112,
                 compute_dtype="bfloat16" if on_tpu else "float32",
                 use_pallas=on_tpu)
    model, variables = init_model(cfg)
    rs = np.random.RandomState(0)
    cdt = jnp.bfloat16 if on_tpu else jnp.float32

    # ---- clip-batch path (independent windows) ----
    batch = 128 if on_tpu else 4
    steps = 20 if on_tpu else 2

    def one_clip_step(variables, clip_u8, audio_raw):
        feats = audio_frontend(audio_raw)
        x = {"clip": normalize_clip(clip_u8, dtype=cdt),
             "audio_features": feats}
        out = model.apply(variables, x, train=False)
        return jnp.sum(out[:, :12].astype(jnp.float32))

    @jax.jit
    def run_clip(variables, clip_u8, audio_raw, n):
        def body(i, acc):
            c = clip_u8.at[0, 0, 0, 0, 0].set((i % 255).astype(jnp.uint8))
            a = audio_raw.at[0, 0].set(i.astype(jnp.float32) * 1e-6)
            return acc + one_clip_step(variables, c, a)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    clip = jax.device_put(
        rs.randint(0, 256, (batch, 16, 112, 112, 3)).astype(np.uint8))
    audio = jax.device_put(
        (rs.randn(batch, 441000) * 0.1).astype(np.float32))
    np.asarray(run_clip(variables, clip, audio, 2))
    t0 = time.perf_counter()
    np.asarray(run_clip(variables, clip, audio, steps))
    clip_rate = batch * steps / (time.perf_counter() - t0)

    # ---- dense-sweep path (frame-feature reuse) ----
    bucket = 512 if on_tpu else 8
    sweep_steps = 10 if on_tpu else 1
    sw = AvformerSweep(cfg, variables)
    lf = cfg.label_frame
    t_clip = cfg.n_frames
    frames = jax.device_put(rs.randint(
        0, 256, (bucket + lf, cfg.image_size, cfg.image_size, 3)
    ).astype(np.uint8))
    audio_raw = jax.device_put(
        (rs.randn(bucket, 441000) * 0.1).astype(np.float32))
    idx = jax.device_put(np.clip(
        np.arange(bucket)[:, None]
        + np.arange(0, lf, cfg.dilation)[None, :], 0,
        bucket + lf).astype(np.int32))

    @jax.jit
    def run_sweep(frames, audio_raw, idx, n):
        def body(i, acc):
            f = frames.at[0, 0, 0, 0].set((i % 255).astype(jnp.uint8))
            a = audio_raw.at[0, 0].set(i.astype(jnp.float32) * 1e-6)
            feats = audio_frontend(a)
            out = sw.fused_sweep(f, feats, idx)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    np.asarray(run_sweep(frames, audio_raw, idx, 2))
    t0 = time.perf_counter()
    np.asarray(run_sweep(frames, audio_raw, idx, sweep_steps))
    sweep_rate = bucket * sweep_steps / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "clips_per_sec_per_chip",
        "value": round(sweep_rate, 2),
        "unit": "clips/s",
        "vs_baseline": round(sweep_rate / BASELINE_CLIPS_PER_SEC, 2),
        "mode": "dense_sweep",
        "clip_batch_clips_per_sec": round(clip_rate, 2),
    }))


if __name__ == "__main__":
    main()
