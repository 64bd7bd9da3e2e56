"""Benchmark: clips/sec/chip for 16-frame A/V AU inference (BASELINE.md).

Measures the flagship fused path on the attached TPU chip: uint8 clips +
raw 10 s audio in -> on-device normalize + mel frontend + avformer forward
-> 12-AU logits out. One JSON line:

    {"metric": "clips_per_sec_per_chip", "value": N, "unit": "clips/s",
     "vs_baseline": R}

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

    batch = 128 if on_tpu else 8
    steps = 20 if on_tpu else 2

    @jax.jit
    def infer(variables, clip_u8, audio_raw):
        feats = audio_frontend(audio_raw)                 # (B,1,64,1001)
        x = {"clip": normalize_clip(clip_u8, dtype=jnp.bfloat16)
             if on_tpu else normalize_clip(clip_u8),
             "audio_features": feats}
        out = model.apply(variables, x, train=False)
        return out[:, :12]

    rs = np.random.RandomState(0)
    clip = rs.randint(0, 256, (batch, 16, 112, 112, 3)).astype(np.uint8)
    audio = (rs.randn(batch, 441000) * 0.1).astype(np.float32)
    clip_d = jax.device_put(clip)
    audio_d = jax.device_put(audio)

    # warmup/compile (twice: the tunneled backend can lazily re-specialize)
    np.asarray(infer(variables, clip_d, audio_d))
    np.asarray(infer(variables, clip_d, audio_d))

    # fetch the (tiny) output to host every step: on the axon-tunneled
    # backend block_until_ready returns before execution finishes, so a D2H
    # copy is the only reliable completion barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        np.asarray(infer(variables, clip_d, audio_d))
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
