"""Standalone end-to-end decode->fused-infer benchmark.

Runs the same ``sweep_serve_benchmark`` workload as bench.py's e2e
section (cold pass + N steady-state passes over the synthetic 8-video
10,240-clip FrameStore fixture) without the bench ladder around it —
for profiling and A/B work on the serving pipeline. Must be a real file on disk: the
process-isolated DecodeWorker uses the ``spawn`` start method, which
re-imports __main__ (a heredoc/stdin __main__ makes the worker fail and
silently falls back to the slower thread pipeline).

Usage: python scripts/e2e_bench.py [--passes 3] [--max_clips 5120]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--max_clips", type=int, default=10240)
    ap.add_argument("--bucket", type=int, default=None,
                    help="bucket cap (default: serve.default_sweep_bucket)")
    ap.add_argument("--no_worker", action="store_true",
                    help="force the thread-fallback decode pipeline")
    args = ap.parse_args()

    import jax

    cache = os.path.join(REPO, ".cache", "jax_compile")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import _ensure_e2e_dataset
    from auformer.core.config import Config
    from auformer.data.testset import Aff2TestDataset
    from auformer.nn import init_model
    from auformer.serve import sweep_serve_benchmark

    root, labels, cache_dir = _ensure_e2e_dataset()
    cfg = Config(root=root, lmdb_label_dir=labels, cache_dir=cache_dir,
                 exp_dir=os.path.join(os.path.dirname(root), "exp"),
                 model_name="avformer", modality="A;V", task="AU",
                 n_frames=16, image_size=112, compute_dtype="bfloat16",
                 use_pallas=True, host_threads=4)
    model, variables = init_model(cfg)
    ds = Aff2TestDataset(cfg)

    def report(tag: str, r: dict) -> None:
        print(f"{tag}: {r['clips_per_sec']:.0f} clips/s  "
              f"decode={r['decode_seconds']:.1f}s "
              f"sweep={r['sweep_seconds']:.1f}s wall={r['seconds']:.1f}s "
              f"worker={'yes' if r.get('decode_worker') else 'no'}",
              flush=True)

    worker = False if args.no_worker else None
    r = sweep_serve_benchmark(cfg, variables, dataset=ds, bucket=args.bucket,
                              warmup=False, max_clips=args.max_clips,
                              decode_worker=worker)
    report("cold", r)
    worker = False if args.no_worker else r.get("decode_worker")
    for p in range(args.passes):
        s = sweep_serve_benchmark(cfg, variables, dataset=ds,
                                  bucket=args.bucket, warmup=False,
                                  max_clips=args.max_clips,
                                  sweep=r["sweep"], decode_worker=worker)
        if not args.no_worker:
            worker = s.get("decode_worker")
        report(f"steady{p}", s)
    if worker is not None:
        worker.close()


if __name__ == "__main__":
    main()
