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

import os
import sys
import threading
import time
from typing import Iterator

import numpy as np

from .core.config import Config
from .data import DataLoader, SubsetSequentialSampler
from .data.testset import Aff2TestDataset
from .infer import make_infer_fn
from .nn import build_model


def decode_video_frames(dataset, vid_idx, h: int, w: int) -> np.ndarray:
    """(N, h, w, 3) uint8 frames for the given dataset rows: native batched
    JPEG decode with the per-key python fallback (missing/undecodable keys
    stay black, matching the datasets' black-frame semantics)."""
    keys = [dataset._store_key(dataset.image_path[i]) for i in vid_idx]
    frames = np.zeros((len(keys), h, w, 3), np.uint8)
    if dataset.native_image is not None:
        decoded, ok = dataset.native_image.decode_batch(keys, h, w, 3)
        frames[ok] = decoded[ok]
    else:
        for j, k in enumerate(keys):
            img = dataset._get_image_by_key(k)
            if img is not None and img.shape[:2] == (h, w):
                frames[j] = img
    return frames


def read_video_wav(audio_dir: str, video_id: str) -> np.ndarray:
    """Mono float32 wav for a video id (position suffix stripped), zeros(1)
    on any read failure — the zero-audio fallback the reference applies
    (aff2compdataset.py:227-232)."""
    from .data.testset import strip_position
    from .ops import audio_host

    try:
        wav, _sr = audio_host.load_wav(
            os.path.join(audio_dir, strip_position(video_id) + ".wav"))
        return wav[0]
    except (OSError, EOFError, ValueError):
        return np.zeros(1, np.float32)


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


def _decode_worker_main(conn, cfg: Config) -> None:
    """Decode-worker child: serve (vid_idx, frames, wav, ts, decode_s) per
    requested video db-nr until a ``None`` request.

    A separate PROCESS, not a thread: the axon tunnel client spin-waits
    while the parent blocks on a device fetch, starving sibling threads of
    both CPU and GIL (measured 36x decode slowdown on the 1-CPU box,
    2026-08-17). A child process owns its GIL and gets its own scheduler
    share, so decode throughput is independent of the parent's fetch state
    — the same isolation torch's DataLoader workers give the reference
    pipeline (SURVEY.md L1).

    On a 1-CPU host the parent's spin-waiting fetch still time-slices
    50/50 against this process, inflating decode wall time ~4.5x over the
    raw decoder rate (measured 2026-08-17: 14.6 s in-pipeline vs 3.2 s
    standalone for 5,120 frames). Decode is the pipeline's critical path
    while the fetch spin does no useful work, so the worker raises its
    scheduler priority when it can (root / CAP_SYS_NICE); the parent's
    dispatch thread only needs the CPU in short bursts between fetches."""
    import time as _time

    try:
        os.setpriority(os.PRIO_PROCESS, 0, -10)
    except (OSError, AttributeError):
        pass  # unprivileged: keep default priority

    from .data.testset import Aff2TestDataset

    ds = Aff2TestDataset(cfg)
    test_idx = np.nonzero(ds.test_ids)[0]
    audio_dir = getattr(ds, "audio_dir", cfg.root)
    h = w = cfg.image_size
    arena = None  # mmap'd shared frame ring (packed pipeline)
    conn.send("ready")  # startup handshake: imports + dataset ctor done
    while True:
        req = conn.recv()
        if req is None:
            conn.close()
            return
        if isinstance(req, tuple) and req and req[0] == "arena":
            # attach the parent's frame ring: a plain mmap'd file (under
            # /dev/shm when available) — no multiprocessing.shared_memory,
            # whose child-side resource tracker unlinks attached segments
            _tag, path, cap, ah, aw = req
            arena = np.memmap(path, np.uint8, mode="r+",
                              shape=(cap, ah, aw, 3))
            conn.send("arena_ok")
            continue
        if isinstance(req, tuple) and req and req[0] == "slice":
            # decode rows [a, b) of one video DIRECTLY into the shared
            # ring at `base` — frames cross the process boundary zero-copy
            # (the whole-video pipe reply below pays a pickle+pipe copy
            # per 49 MB video; measured as a main dispatch-thread cost in
            # the round-4 e2e breakdown)
            _tag, video_nr, a, b, base, want_wav = req
            t0 = _time.perf_counter()
            c0 = _time.process_time()
            vid_idx = test_idx[ds.video_db_nr[test_idx] == video_nr]
            rows = vid_idx[a:b]
            arena[base:base + len(rows)] = \
                decode_video_frames(ds, rows, h, w)
            wav = None
            if want_wav:
                video_id = os.path.dirname(ds.image_path[vid_idx[0]])
                wav = read_video_wav(audio_dir, video_id)
            dsec = _time.perf_counter() - t0
            if os.environ.get("AUFORMER_DEBUG_DECODE"):
                print(f"[decode-child] slice v{video_nr} [{a},{b}) "
                      f"wall {dsec:.3f}s cpu "
                      f"{_time.process_time() - c0:.3f}s",
                      file=sys.stderr, flush=True)
            conn.send((wav, dsec))
            continue
        video_nr = req
        t0 = _time.perf_counter()
        vid_idx = test_idx[ds.video_db_nr[test_idx] == video_nr]
        video_id = os.path.dirname(ds.image_path[vid_idx[0]])
        frames = decode_video_frames(ds, vid_idx, h, w)
        if "A" in cfg.modality:
            wav = read_video_wav(audio_dir, video_id)
        else:
            # visual-only sweeps ignore wav: skip the read + pipe transfer
            wav = np.zeros(1, np.float32)
        ts = np.asarray(ds.time_stamps)[vid_idx]
        conn.send((vid_idx, frames, wav, ts, _time.perf_counter() - t0))


class DecodeWorker:
    """Process-isolated video decoder (see _decode_worker_main). ``spawn``
    start method: never forks an initialized TPU client. The child is
    forced onto the CPU backend and never queries devices anyway."""

    def __init__(self, cfg: Config):
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self._conn, child = ctx.Pipe()
        saved = os.environ.get("JAX_PLATFORMS")
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            self._proc = ctx.Process(target=_decode_worker_main,
                                     args=(child, cfg), daemon=True)
            self._proc.start()
        finally:
            if saved is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = saved
        child.close()
        # bounded startup handshake (child imports + dataset ctor; ~10-30 s
        # on the 1-CPU box). On death/hang: clean up and raise so the
        # caller falls back to the thread pipeline.
        if not self._conn.poll(timeout=180) or self._conn.recv() != "ready":
            self._proc.terminate()
            self._conn.close()
            raise RuntimeError("decode worker failed to start")

    def request(self, video_nr) -> None:
        self._conn.send(video_nr)

    def result(self):
        return self._conn.recv()

    # -- packed-pipeline slice protocol (auformer/packed.py) ----------------
    def attach_arena(self, arena) -> bool:
        """Point the worker at a FrameArena backed by an mmap'd file;
        returns False when the arena has no shareable backing (the caller
        then decodes through its thread fallback)."""
        path = getattr(arena, "mmap_path", None)
        if path is None:
            return False
        cap, h, w = arena.buf.shape[0], arena.buf.shape[1], arena.buf.shape[2]
        self._conn.send(("arena", path, cap, h, w))
        return self._conn.recv() == "arena_ok"

    def request_slice(self, video_nr, a: int, b: int, base: int,
                      want_wav: bool) -> None:
        self._conn.send(("slice", video_nr, int(a), int(b), int(base),
                         bool(want_wav)))

    def slice_result(self):
        """(wav or None, decode_seconds) for the oldest in-flight slice."""
        return self._conn.recv()

    def close(self) -> None:
        try:
            self._conn.send(None)
            self._proc.join(timeout=5)
        except (OSError, ValueError):
            pass
        if self._proc.is_alive():
            self._proc.terminate()
        self._conn.close()


def default_sweep_bucket() -> int:
    """Serving bucket default: 2048 on TPU (with the phase-mel audio route
    device compute no longer penalizes big buckets, and fewer dispatches
    mean less per-call tunnel overhead — steady e2e 465-670 -> 738-766
    clips/s in the round-3 probe), 512 on CPU where compile time and
    memory for the big fused program dominate."""
    import jax

    return 2048 if jax.default_backend() == "tpu" else 512


def sweep_stream(cfg: Config, variables, dataset=None, bucket: int | None = None,
                 max_clips: int | None = None, sweep=None,
                 decode_worker=None, mesh=None,
                 fetch_group_clips: int = 16384,
                 stats: dict | None = None
                 ) -> Iterator[tuple[np.ndarray, str, np.ndarray]]:
    """Dense-sweep serving pipeline over the test split: yields
    ``(vid_idx, video_id, (N, out_dim) logits)`` per video, in video order.

    The production counterpart of the reference's batch-1 submission loop
    (test_aff2.py:93-117, "5+ hours"): per video, every test frame is
    decoded once (process-isolated DecodeWorker with a thread fallback —
    see _decode_worker_main), the trunk runs once per frame, and windows
    are feature gathers on device (auformer/sweep.py). Audio-bearing
    sweeps ship one wav per video and run the per-window mel fused on
    device. Works for any ``make_sweep`` model (avformer, vformer).

    Tunnel-shaped behavior: video *i+1* decodes while the device sweeps
    video *i*; result fetches are DEFERRED, GROUPED and ASYNC — one
    concatenated D2H per ``fetch_group_clips`` in-flight clips (each
    queued bucket pins its uint8 frame upload until it executes,
    ~37 KB/clip at 112px), issued from a dedicated fetch thread so the
    tunnel's 1-11 s per-fetch sync overlaps later videos' decode +
    dispatch instead of serializing at the end of the pass. Grouping
    makes yields arrive in bursts, in video order. On the attached-chip
    tunnel the large default means one drain per pass — smaller groups
    measured WORSE there (the fetch thread's spin-wait contends with
    dispatch on a 1-CPU host); multi-core production hosts can lower it
    for smoother yield latency.

    ``stats`` (optional dict) accumulates ``decode_seconds`` /
    ``sweep_seconds`` / ``clips`` in place and exposes the ``sweep`` and
    ``decode_worker`` instances for reuse across passes (a fresh executor
    re-pays ~20 s of serialized-executable load per process even on a
    compile-cache hit). ``decode_worker=False`` forces the thread
    fallback. ``max_clips`` cuts the video list upfront (whole videos
    until the cumulative clip count reaches the cap) so the pipeline
    never decodes a video the cut would discard."""
    from concurrent.futures import ThreadPoolExecutor

    from .data.testset import Aff2TestDataset
    from .sweep import make_sweep

    dataset = dataset or Aff2TestDataset(cfg)
    sweep = sweep or make_sweep(cfg, variables, mesh=mesh)
    bucket = bucket or default_sweep_bucket()
    h = w = cfg.image_size
    test_idx = np.nonzero(dataset.test_ids)[0]
    audio_dir = getattr(dataset, "audio_dir", cfg.root)
    videos = list(np.unique(dataset.video_db_nr[test_idx]))
    counts = [int(np.sum(dataset.video_db_nr[test_idx] == v))
              for v in videos]
    if max_clips is not None:
        k, acc = 0, 0
        while k < len(videos) and acc < max_clips:
            acc += counts[k]
            k += 1
        videos, counts = videos[:k], counts[:k]

    st = stats if stats is not None else {}
    st.setdefault("decode_seconds", 0.0)
    st.setdefault("sweep_seconds", 0.0)
    st.setdefault("clips", 0)
    st["sweep"] = sweep

    def load_video(video_nr):
        vid_idx = test_idx[dataset.video_db_nr[test_idx] == video_nr]
        video_id = os.path.dirname(dataset.image_path[vid_idx[0]])
        td = time.perf_counter()
        frames = decode_video_frames(dataset, vid_idx, h, w)
        if sweep.needs_audio:
            wav = read_video_wav(audio_dir, video_id)
        else:
            wav = np.zeros(1, np.float32)
        st["decode_seconds"] += time.perf_counter() - td
        ts = np.asarray(dataset.time_stamps)[vid_idx]
        return vid_idx, frames, wav, ts

    worker = decode_worker or None  # False = forced thread fallback
    owns_worker = False
    if worker is None and decode_worker is not False and videos \
            and sum(counts) >= 2000:
        # the spawned child pays 10-30 s of imports + dataset ctor on the
        # 1-CPU box — only worth it past a few thousand clips (same
        # threshold as infer.run_inference_sweep)
        try:
            worker = DecodeWorker(cfg)
            owns_worker = True
        except Exception:
            worker = None
    st["decode_worker"] = worker

    pending: list[tuple[np.ndarray, str, object]] = []
    pending_clips = 0
    # fetches run on a dedicated thread so their 1-11 s tunnel syncs
    # overlap later videos' decode + dispatch instead of serializing at
    # the end of the pass (device busy was only ~12% of the sweep phase
    # in the round-3 e2e trace); futures are consumed IN ORDER so yields
    # stay in video order
    fetch_ex = ThreadPoolExecutor(max_workers=1)
    fetch_futs: list = []
    st_lock = threading.Lock()

    def _drain_async():
        nonlocal pending_clips
        if not pending:
            return
        group = list(pending)
        pending.clear()
        pending_clips = 0

        def work():
            td = time.perf_counter()
            outs = sweep.fetch_many([(len(vi), h_) for vi, _, h_ in group])
            with st_lock:
                st["clips"] += sum(len(vi) for vi, _, _ in group)
                st["sweep_seconds"] += time.perf_counter() - td
            return [(vi, vid, o) for (vi, vid, _), o in zip(group, outs)]

        fetch_futs.append(fetch_ex.submit(work))

    def _ready():
        while fetch_futs and fetch_futs[0].done():
            yield from fetch_futs.pop(0).result()

    def _dispatch(vid_idx, frames, wav, ts):
        nonlocal pending_clips
        video_id = os.path.dirname(dataset.image_path[vid_idx[0]])
        td = time.perf_counter()
        handle = sweep.dispatch_video(frames, wav=wav, timestamps_ms=ts,
                                      batch=bucket)
        with st_lock:
            st["sweep_seconds"] += time.perf_counter() - td
        # handle = (n_padded, buckets); keep the true vid_idx for demux
        pending.append((vid_idx, video_id, handle[1]))
        pending_clips += len(vid_idx)

    def _decoded_videos():
        """One-ahead decode of every video: the worker process when
        available, the thread fallback otherwise — same overlap shape."""
        if worker is not None:
            worker.request(videos[0])
            for i, _video_nr in enumerate(videos):
                vid_idx, frames, wav, ts, dsec = worker.result()
                st["decode_seconds"] += dsec
                if i + 1 < len(videos):
                    worker.request(videos[i + 1])
                yield vid_idx, frames, wav, ts
        else:
            with ThreadPoolExecutor(max_workers=1) as ex:
                nxt = ex.submit(load_video, videos[0])
                for i, _video_nr in enumerate(videos):
                    item = nxt.result()
                    if i + 1 < len(videos):
                        nxt = ex.submit(load_video, videos[i + 1])
                    yield item

    try:
        if videos:
            for vid_idx, frames, wav, ts in _decoded_videos():
                _dispatch(vid_idx, frames, wav, ts)
                if pending_clips >= fetch_group_clips:
                    _drain_async()
                yield from _ready()
        _drain_async()
        for f in fetch_futs:
            yield from f.result()
        fetch_futs.clear()
    finally:
        fetch_ex.shutdown(wait=True)
        if owns_worker and worker is not None:
            # workers passed in by the caller are reused across passes
            # (sweep_serve_benchmark); internally-created ones would leak
            # a -10-niced child per call otherwise
            worker.close()
            st["decode_worker"] = None


def sweep_serve_benchmark(cfg: Config, variables, dataset=None,
                          bucket: int | None = None,
                          max_clips: int | None = None,
                          warmup: bool = True, sweep=None,
                          decode_worker=None, packed: bool = False) -> dict:
    """End-to-end decode->FUSED inference clips/s via :func:`sweep_stream`
    (BASELINE.md throughput row: includes host store reads + JPEG decode +
    wav read). Returns clip counts + rate, plus the ``sweep`` executor and
    ``decode_worker`` for reuse across steady-state passes (callers that
    don't reuse the worker should ``.close()`` it — a daemon process
    either way, so it can't outlive the interpreter).

    ``packed=True`` drives the cross-video packed-bucket pipeline
    (auformer/packed.py) instead of the per-video route: one device
    execution per fixed-size bucket regardless of video boundaries, with
    the phase-mel tables fused inside the bucket program — the round-4
    answer to the per-video tunnel dispatch/fetch overhead.

    ``warmup=True`` compiles the fused sweep program on dummy zeros BEFORE
    the clock starts — consistent with the other bench sections, which all
    time steady state; XLA compilation (~2-3 min via the tunnel) is a
    one-time cost a production sweep amortizes over ~700k frames.
    """
    import wave as _wave

    from .data.testset import Aff2TestDataset, strip_position
    from .sweep import make_sweep

    dataset = dataset or Aff2TestDataset(cfg)
    sweep = sweep or make_sweep(cfg, variables)
    bucket = bucket or default_sweep_bucket()
    h = w = cfg.image_size
    test_idx = np.nonzero(dataset.test_ids)[0]
    audio_dir = getattr(dataset, "audio_dir", cfg.root)
    videos = list(np.unique(dataset.video_db_nr[test_idx]))

    if warmup and videos and sweep.needs_audio:
        from .data.testset import strip_position
        vid_idx0 = test_idx[dataset.video_db_nr[test_idx] == videos[0]]
        video_id0 = os.path.dirname(dataset.image_path[vid_idx0[0]])
        try:
            with _wave.open(os.path.join(
                    audio_dir, strip_position(video_id0) + ".wav")) as f:
                wav_len = f.getnframes()
        except (OSError, EOFError):
            wav_len = 1
        # warm with the FIRST VIDEO's clip count, not the bucket cap: the
        # adaptive bucket size compiles per quantized video length
        n0 = len(vid_idx0)
        sweep.sweep_video_device_audio(
            np.zeros((n0, h, w, 3), np.uint8),
            np.zeros(wav_len, np.float32),
            np.zeros(n0), batch=bucket)
    elif warmup and videos:
        n0 = int(np.sum(dataset.video_db_nr[test_idx] == videos[0]))
        sweep.sweep_video(np.zeros((n0, h, w, 3), np.uint8),
                          batch=bucket)

    # worker startup (child imports + dataset ctor, ~10-30 s on the 1-CPU
    # box) happens BEFORE the clock — one-time setup like XLA compile, not
    # decode work; per-video decode is always billed inside the clock.
    # Same >=2000-clip threshold as sweep_stream: below it the thread
    # fallback wins and tiny CPU fixtures shouldn't pay the spawn cost
    if decode_worker is None and videos \
            and int(dataset.test_ids.sum()) >= 2000:
        try:
            decode_worker = DecodeWorker(cfg)
        except Exception:
            decode_worker = False  # don't retry inside the clock

    stream_fn = sweep_stream
    if packed:
        from .packed import packed_sweep_stream
        stream_fn = packed_sweep_stream
    stats: dict = {}
    t0 = time.perf_counter()
    for _vid_idx, _video_id, _logits in stream_fn(
            cfg, variables, dataset=dataset, bucket=bucket,
            max_clips=max_clips, sweep=sweep, decode_worker=decode_worker,
            stats=stats):
        pass
    dt = time.perf_counter() - t0
    return {"clips": stats["clips"], "seconds": dt,
            "decode_seconds": stats["decode_seconds"],
            "sweep_seconds": stats["sweep_seconds"], "sweep": sweep,
            "decode_worker": stats.get("decode_worker"),
            "clips_per_sec": stats["clips"] / dt if dt > 0 else 0.0}
