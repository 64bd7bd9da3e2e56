"""Fused decode->infer serving pipeline.

The production-path counterpart of test_aff2: a host pipeline (native C++
batched JPEG decode + wav windows) streams fixed-shape uint8/audio batches
into a double-buffered jitted forward; predictions demux to per-video rows
on host. Decoded-frame reuse across overlapping clip windows (stride-1
frames x 16-frame clips — SURVEY.md §7.3-6) comes from sweeping each video
contiguously so the OS page cache and the store's mmap serve repeat frames
without re-reads; JPEG re-decode is bounded by the native thread pool.

This module is also the end-to-end throughput benchmark:
``serve_benchmark`` reports clips/s including host decode.
"""
from __future__ import annotations

import time
from typing import Iterator

import numpy as np

from .core.config import Config
from .data import DataLoader, SubsetSequentialSampler
from .data.testset import Aff2TestDataset
from .infer import make_infer_fn
from .nn import build_model


def stream_predictions(cfg: Config, variables,
                       dataset: Aff2TestDataset | None = None,
                       batch_size: int | None = None
                       ) -> Iterator[tuple[np.ndarray, np.ndarray, list]]:
    """Yield (indices, (B,21) logits, video_ids) over the test split with
    host decode overlapped against device compute."""
    model = build_model(cfg)
    dataset = dataset or Aff2TestDataset(cfg)
    dataset.set_modes(list(model.modes))
    batch_size = batch_size or cfg.batch_size
    ids = np.nonzero(dataset.test_ids)[0]
    loader = DataLoader(dataset, batch_size, SubsetSequentialSampler(ids),
                        num_threads=cfg.host_threads, drop_last=False,
                        prefetch_batches=cfg.prefetch_depth)
    infer = make_infer_fn(cfg, model)
    pending = None
    for batch in loader:
        x = {k: batch[k] for k in model.modes if k in batch}
        fut = infer(variables, x)  # async dispatch; next decode overlaps
        if pending is not None:
            pb, pf = pending
            yield pb["Index"], np.asarray(pf), list(pb.get("video_id", []))
        pending = (batch, fut)
    if pending is not None:
        pb, pf = pending
        yield pb["Index"], np.asarray(pf), list(pb.get("video_id", []))


def serve_benchmark(cfg: Config, variables, dataset=None,
                    batch_size: int | None = None,
                    max_clips: int | None = None) -> dict:
    """End-to-end decode->infer clips/s (host pipeline included)."""
    n = 0
    t0 = time.perf_counter()
    for idxs, logits, _vids in stream_predictions(cfg, variables, dataset,
                                                  batch_size):
        n += len(idxs)
        if max_clips is not None and n >= max_clips:
            break
    dt = time.perf_counter() - t0
    return {"clips": n, "seconds": dt,
            "clips_per_sec": n / dt if dt > 0 else 0.0}
