"""Benchmark: clips/sec/chip for 16-frame A/V AU inference (BASELINE.md).

Measures the flagship fused path on the attached TPU chip: uint8 clips +
raw 10 s audio in -> on-device normalize + mel frontend + avformer forward
-> 12-AU logits out. One JSON line:

    {"metric": "clips_per_sec_per_chip", "value": N, "unit": "clips/s",
     "vs_baseline": R}

Measurement notes: the attached chip sits behind an RPC tunnel with ~30 ms
dispatch round-trip and a block_until_ready that returns early, so the
timed region runs STEPS inference iterations inside ONE jitted
lax.fori_loop (inputs perturbed per iteration to prevent loop hoisting) and
fetches a single scalar — amortizing the tunnel to <1 ms/step.

vs_baseline: the reference runs batch-1 A/V inference on a 2080 Ti at an
estimated ~39 clips/s ("takes 5+ hours for test and val", test_aff2.py:82,
over the ~700k-frame test+val sweep). That estimate is the denominator.
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

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=16, image_size=112,
                 compute_dtype="bfloat16" if on_tpu else "float32",
                 use_pallas=on_tpu)
    model, variables = init_model(cfg)

    batch = 128 if on_tpu else 4
    steps = 30 if on_tpu else 2
    cdt = jnp.bfloat16 if on_tpu else jnp.float32

    def one_step(variables, clip_u8, audio_raw):
        feats = audio_frontend(audio_raw)
        x = {"clip": normalize_clip(clip_u8, dtype=cdt),
             "audio_features": feats}
        out = model.apply(variables, x, train=False)
        return jnp.sum(out[:, :12].astype(jnp.float32))

    @jax.jit
    def run(variables, clip_u8, audio_raw, n):
        def body(i, acc):
            # perturb both inputs per iteration so XLA cannot hoist any
            # loop-invariant branch (clip path OR the audio frontend)
            c = clip_u8.at[0, 0, 0, 0, 0].set((i % 255).astype(jnp.uint8))
            a = audio_raw.at[0, 0].set(i.astype(jnp.float32) * 1e-6)
            return acc + one_step(variables, c, a)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    rs = np.random.RandomState(0)
    clip = jax.device_put(
        rs.randint(0, 256, (batch, 16, 112, 112, 3)).astype(np.uint8))
    audio = jax.device_put(
        (rs.randn(batch, 441000) * 0.1).astype(np.float32))

    np.asarray(run(variables, clip, audio, 2))  # compile + warmup
    t0 = time.perf_counter()
    np.asarray(run(variables, clip, audio, steps))
    dt = time.perf_counter() - t0

    clips_per_sec = batch * steps / dt
    print(json.dumps({
        "metric": "clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
