"""Capture a real-chip profiler trace of the dense sweep and derive
measured per-op timings + MFU (VERDICT round-2 item 4).

Runs the fused dense-sweep program (the BASELINE.md headline workload)
under ``jax.profiler.trace``, saves the trace under ``.cache/profile/``,
then parses the xplane.pb in a subprocess (``scripts/xplane_stats.py`` —
TF import + pure-python protobuf stay out of the TPU-holding process)
and prints the top time sinks by device self-time plus the MEASURED MFU
(analytic FLOPs from XLA cost analysis / profiler device busy time).

    python scripts/profile_trace.py [--bucket 512] [--iters 8]

The trace directory is kept on disk so the numbers quoted in
docs/DESIGN.md can be re-derived: each run writes
``.cache/profile/<timestamp>/plugins/profile/...``.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRACE_DIR = os.path.join(REPO, ".cache", "profile")

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 49e12


def _op_stats_from_trace(trace_dir: str, top: int = 15):
    """Parse the newest xplane.pb via the subprocess parser."""
    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "xplane_stats.py"),
         trace_dir, "--top", str(top), "--json"],
        capture_output=True, text=True, timeout=600, env=env)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        rows = json.loads(line)
    except (json.JSONDecodeError, ValueError):
        return None, (f"xplane_stats rc={proc.returncode}: "
                      f"{(proc.stderr or proc.stdout)[-400:]}")
    if "error" in rows:
        return None, rows["error"]
    return rows, rows["xplane"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bucket", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--mode", choices=["window", "phase", "packed", "train"],
                   default="window",
                   help="window: per-window mel (strict per-window "
                        "semantics); phase: the EXACT shared-spectrogram "
                        "route production serving dispatches "
                        "(sweep.py::dispatch_video_device_audio); packed: "
                        "the cross-video packed-bucket program "
                        "(sweep.py::fused_sweep_packed) on a synthetic "
                        "single-video bucket mirroring "
                        "packed.PackedAssembler._prepare_packed/"
                        "_upload_packed payloads; train: the device-front "
                        "B=64 train step (device AutoAugment + arena mel "
                        "+ fwd/bwd — what bench train_e2e dispatches)")
    p.add_argument("--trace_dir", default=TRACE_DIR)
    p.add_argument("--gflops-per-clip", type=float, default=7.24,
                   help="fallback analytic GFLOP/clip when the backend's "
                        "cost analysis is unavailable (default: "
                        "scripts/flops_report.py dense-sweep @ bucket 512)")
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
    idx = jax.device_put(np.clip(
        np.arange(bucket)[:, None]
        + np.arange(0, lf, cfg.dilation)[None, :], 0,
        bucket + lf).astype(np.int32))

    # sw.v enters as an ARGUMENT — closing over the weights would embed
    # them as HLO constants (see auformer/sweep.py)
    if args.mode == "train":
        import dataclasses as _dc

        from auformer.nn import loss_suite
        from auformer.parallel import create_train_state, make_train_step
        b = 64 if on_tpu else 4
        bucket = b  # clips per traced call, for the rate prints
        tcfg = _dc.replace(cfg, batch_size=b, device_augment=True,
                           device_audio=True)
        suite = loss_suite(model)
        state = create_train_state(tcfg, model, variables)
        step = make_train_step(tcfg, model, suite, mesh=None, donate=False,
                               with_arena=True)
        u = 256  # dedup pool size (~what locality-run batches produce)
        pool = jax.device_put(rs.randint(
            0, 256, (u, cfg.image_size, cfg.image_size, 3)).astype(np.uint8))
        clip_idx = jax.device_put(
            rs.randint(0, u, (b, cfg.n_frames)).astype(np.int32))
        slen = cfg.sample_len_frames
        arena_dev = jax.device_put(
            (rs.randn(4 * slen + slen) * 0.05).astype(np.float32))
        ofs = jax.device_put(
            rs.randint(0, 4 * slen, (b,)).astype(np.int32))
        alen = jax.device_put(np.full((b,), slen, np.int32))
        au = jax.device_put(rs.randint(0, 2, (b, 12)).astype(np.float32))
        ex = jax.device_put(rs.randint(0, 7, (b, 1)).astype(np.int32))
        va = jax.device_put(
            rs.uniform(-1, 1, (b, 2)).astype(np.float32))
        rngk = jax.random.PRNGKey(0)

        @jax.jit
        def one(state, pool, clip_idx, ofs, alen, au, ex, va, arena):
            # device half of the dedup input path + the full train step:
            # exactly the per-batch device work bench train_e2e dispatches
            batch = {"clip": jnp.take(pool, clip_idx, axis=0),
                     "audio_ofs": ofs, "audio_len": alen,
                     "AU": au, "EX": ex, "VA": va}
            _, m = step(state, batch, rngk, arena)
            return m["loss"]

        args_tuple = (state, pool, clip_idx, ofs, alen, au, ex, va,
                      arena_dev)
    elif args.mode == "packed":
        from auformer.packed import (MAX_PHASES, PACK_PRE, PACK_TAIL,
                                     WAV_QUANTUM)
        from auformer.ops.phase_mel import HOP_LENGTH
        # one synthetic 30 fps video filling the bucket: stride-1470 window
        # offsets -> 3 hop-grid phases {0, 147, 294}
        slen = cfg.sample_len_frames
        off = (np.arange(bucket, dtype=np.int64) * 1470)
        seg_hi = int(off.max() + slen + 512)
        content = -(-(seg_hi + 512) // WAV_QUANTUM) * WAV_QUANTUM
        wav_buf = np.zeros(PACK_PRE + content + PACK_TAIL, np.float32)
        wav_buf[PACK_PRE:PACK_PRE + seg_hi] = \
            (rs.randn(seg_hi) * 0.1).astype(np.float32)
        starts_np = (PACK_PRE + off).astype(np.int32)
        nv_np = np.full(bucket, slen, np.int32)
        base_np = (off // HOP_LENGTH).astype(np.int32)
        uniq = np.unique(off % HOP_LENGTH)
        n_ph = min(1 << max(0, int(uniq.size - 1).bit_length()), MAX_PHASES)
        phases_np = np.concatenate(
            [uniq, np.full(n_ph - uniq.size, uniq[0])]).astype(np.int32)
        psel_np = np.searchsorted(uniq, off % HOP_LENGTH).astype(np.int32)
        wav_dev = jax.device_put(jnp.asarray(wav_buf))
        st, nv = jax.device_put(starts_np), jax.device_put(nv_np)
        bs, ps = jax.device_put(base_np), jax.device_put(psel_np)
        phases = jax.device_put(phases_np)
        # rows: interior dilated windows into the (bucket+lf)-frame chunk,
        # black slot at bucket+lf (mirrors packed.py:316-339 for one video
        # with frame_base=0, lo=0)
        i = np.arange(bucket)[:, None]
        k = np.arange(cfg.n_frames)[None, :]
        ridx = i - lf + cfg.dilation * (k + 1) + lf  # lo = s - lf
        rows_np = np.where((ridx < 0) | (ridx >= bucket + lf),
                           bucket + lf, ridx).astype(np.int32)
        idx = jax.device_put(rows_np)

        @jax.jit
        def one(v, frames, wav_buf, idx):
            return jnp.sum(sw.fused_sweep_packed_fn(
                v, frames, wav_buf, phases, st, nv, bs, ps, idx)
                .astype(jnp.float32))

        args_tuple = (sw.v, frames, wav_dev, idx)
    elif args.mode == "phase":
        from auformer.ops.phase_mel import phase_mel_table, phase_plan
        slen = cfg.sample_len_frames
        ts_ms = 10_000.0 + np.arange(bucket) * (1000.0 / 30.0)
        total_samples = 60 * cfg.sample_rate
        starts_np, nv_np = sw.audio_window_plan(ts_ms, total_samples)
        phases_np, base_np, psel_np = phase_plan(
            starts_np.astype(np.int64) - slen, nv_np)
        wav_ext = jax.device_put(np.concatenate([
            np.zeros(slen, np.float32),
            (rs.randn(total_samples) * 0.1).astype(np.float32),
            np.zeros(slen + 512, np.float32)]))
        st, nv = jax.device_put(starts_np), jax.device_put(nv_np)
        bs, ps = jax.device_put(base_np), jax.device_put(psel_np)
        phases = jax.device_put(phases_np)

        @jax.jit
        def one(v, frames, wav_ext, idx):
            pm = phase_mel_table(wav_ext, phases)
            return jnp.sum(sw.fused_sweep_phase_audio_fn(
                v, frames, wav_ext, pm, st, nv, bs, ps, idx)
                .astype(jnp.float32))

        args_tuple = (sw.v, frames, wav_ext, idx)
    else:
        audio_raw = jax.device_put(
            (rs.randn(bucket, 441000) * 0.1).astype(np.float32))

        @jax.jit
        def one(v, frames, audio_raw, idx):
            feats = audio_frontend(audio_raw)
            return jnp.sum(sw.fused_sweep_fn(v, frames, feats, idx)
                           .astype(jnp.float32))

        args_tuple = (sw.v, frames, audio_raw, idx)

    # warm (compile outside the trace)
    np.asarray(one(*args_tuple))

    # analytic FLOPs of the traced program (unoptimized-HLO cost analysis;
    # the axon backend returns None from lowered cost_analysis, so fall
    # back to the compiled analysis, then to --gflops-per-clip which
    # defaults to scripts/flops_report.py's number at bucket=512)
    flops_per_call = None
    lowered = jax.jit(one).lower(*args_tuple)
    for get in (lowered.cost_analysis,
                lambda: lowered.compile().cost_analysis()):
        try:
            cost = get()
            if isinstance(cost, list):
                cost = cost[0]
            flops_per_call = float(cost["flops"])
            break
        except Exception:
            continue
    if flops_per_call is None and args.gflops_per_clip \
            and args.mode != "train":
        # the per-clip fallback is calibrated for the SWEEP programs only
        flops_per_call = args.gflops_per_clip * 1e9 * bucket
        print(f"NOTE: XLA cost analysis unavailable; using "
              f"--gflops-per-clip={args.gflops_per_clip} "
              "(analytic, scripts/flops_report.py)")

    os.makedirs(args.trace_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        futs = [one(*args_tuple) for _ in range(args.iters)]
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
    busy_s = rows["device_busy_us"] / 1e6
    dev_rate = bucket * args.iters / busy_s if busy_s > 0 else 0.0
    print(f"\nper-op device stats from {src} (plane {rows['plane']}):")
    print(f"device busy: {busy_s * 1e3:.1f} ms for {args.iters} buckets "
          f"-> {busy_s * 1e3 / args.iters:.1f} ms/bucket, "
          f"{dev_rate:.0f} clips/s device-bound")
    print(f"{'HLO op':<52} {'ms':>9} {'%':>6}")
    for r in rows["top_ops"]:
        print(f"{r['name'][:52]:<52} {r['us'] / 1e3:9.3f} {r['pct']:5.1f}%")
    print("by category:")
    for r in rows["categories"]:
        print(f"  {r['name'][:50]:<50} {r['us'] / 1e3:9.3f} {r['pct']:5.1f}%")
    if flops_per_call and busy_s > 0:
        tfs = flops_per_call * args.iters / busy_s / 1e12
        print(f"\nMEASURED MFU (profiler device time): "
              f"{flops_per_call / bucket / 1e9:.2f} GFLOP/clip @ "
              f"{dev_rate:.0f} clips/s device-bound -> {tfs:.1f} TF/s = "
              f"{tfs * 1e12 / V5E_BF16_PEAK * 100:.1f}% of v5e bf16 peak "
              f"({tfs * 1e12 / V5E_F32_PEAK * 100:.1f}% of f32 peak)")


if __name__ == "__main__":
    main()
