"""Cross-video PACKED serving pipeline (round-4 headline work).

The per-video serving loop (serve.py::sweep_stream) pays fixed tunnel
costs per video — wav upload, a ~90 ms phase-table execution, bucket
dispatches at whatever size the video happens to be — so on the e2e
benchmark the device was busy ~12% of the sweep phase and steady
throughput sat at ~7% of the device-bound rate (VERDICT round 3). This
module packs the SAME math into fixed-size buckets of clips drawn from
several consecutive videos:

* frames stream into a shared ring (``FrameArena``) — written once by the
  decode worker, sliced as zero-copy views for upload;
* each bucket is ONE device execution (``AvformerSweep.
  fused_sweep_packed``): the per-video phase-mel tables are recomputed
  inside the program from a bucket-local packed wav buffer (table matmul
  ~1-3 ms vs ~90 ms of tunnel overhead for a separate execution);
* per-video audio segments sit at 441-aligned offsets of the packed
  buffer, so every window's hop-grid phase — and therefore the SAMPLES
  each of its STFT frames reads — is identical to the per-video route
  (logits match to float-reassociation noise, ~1e-5: the trunk batch and
  table grid-length differ, so XLA tiles reductions differently; tested
  in tests/test_packed.py);
* history margins at video joins come from the window rows themselves:
  out-of-range rows point at the black slot exactly as the reference's
  window math pads short clips (aff2compdataset.py:126-131), so no
  cross-video leakage is possible by construction.

Reference anchor: this replaces the "5+ hours" batch-1 submission loop
(test_aff2.py:82-117) end to end.
"""
from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np

from .ops.phase_mel import HOP_LENGTH, MAX_PHASES

#: packed wav buffer layout: [zeros(PACK_PRE) | content | zeros(PACK_TAIL)]
#: PRE >= 441 so phase-table row 0 and start-edge reads never clamp;
#: TAIL >= sample_len + 512 so the longest window slice from the last
#: valid sample stays in bounds (sweep.fused_sweep_device_audio's margin).
PACK_PRE = HOP_LENGTH
PACK_TAIL = 441000 + 512
#: content length quantum: bounds compiled wav shapes (one per multiple)
WAV_QUANTUM = 30 * 44100


class FrameArena:
    """Ring of decoded frames addressed by GLOBAL frame index.

    The decode worker writes video slices directly into the (optionally
    shared-memory) buffer; bucket assembly slices contiguous views out of
    it, so frames cross process/host boundaries exactly once. Consumption
    is FIFO (buckets dispatch in global clip order): the live region is
    one contiguous ring interval, freed by ``release_below``.
    """

    def __init__(self, capacity: int, h: int, w: int, buffer=None,
                 shm: bool = False):
        self.cap = capacity
        self.mmap_path: str | None = None
        if shm:
            # plain mmap'd file (tmpfs when available) — shareable with the
            # decode worker by path; NOT multiprocessing.shared_memory,
            # whose child-side resource tracker unlinks attached segments
            import tempfile
            d = "/dev/shm" if os.path.isdir("/dev/shm") else None
            fd, path = tempfile.mkstemp(prefix="auformer_arena_", dir=d)
            os.ftruncate(fd, capacity * h * w * 3)
            os.close(fd)
            self.mmap_path = path
            self.buf = np.memmap(path, np.uint8, mode="r+",
                                 shape=(capacity, h, w, 3))
        else:
            self.buf = (np.frombuffer(buffer, np.uint8)
                        .reshape(capacity, h, w, 3) if buffer is not None
                        else np.zeros((capacity, h, w, 3), np.uint8))
        self._segs: list[tuple[int, int, int]] = []  # (g_lo, g_hi, base)
        self._cursor = 0
        self._free_g = 0     # frames with g < _free_g are released

    def close(self) -> None:
        if self.mmap_path is not None:
            try:
                os.unlink(self.mmap_path)
            except OSError:
                pass
            self.mmap_path = None

    def alloc(self, g_lo: int, n: int) -> int:
        """Reserve ring space for global frames [g_lo, g_lo+n); returns the
        ring base the writer must use. Raises if the live region would be
        overwritten (size the arena >= backlog + 2 slices)."""
        if n > self.cap:
            raise ValueError(f"slice {n} exceeds arena capacity {self.cap}")
        if self._cursor + n > self.cap:
            self._cursor = 0
        base = self._cursor
        # live ring interval check: any unreleased segment overlapping
        # [base, base+n) means the pipeline outran release_below
        for s_lo, s_hi, s_base in self._segs:
            if s_hi <= self._free_g:
                continue
            lo = s_base + max(self._free_g - s_lo, 0)
            hi = s_base + (s_hi - s_lo)
            if lo < hi and lo < base + n and base < hi:
                raise RuntimeError(
                    "FrameArena overflow: undispatched backlog "
                    f"[{self._free_g}, {s_hi}) still occupies the ring")
        self._segs.append((g_lo, g_lo + n, base))
        self._cursor = base + n
        return base

    def release_below(self, g: int) -> None:
        self._free_g = max(self._free_g, g)
        while self._segs and self._segs[0][1] <= self._free_g:
            self._segs.pop(0)

    def chunk(self, g_lo: int, g_hi: int, pad_to: int | None = None
              ) -> np.ndarray:
        """Frames [g_lo, g_hi) as one contiguous array — a zero-copy view
        when the range is ring-contiguous (the overwhelmingly common
        case), otherwise an assembled copy (ring wrap, final pad)."""
        n = g_hi - g_lo
        out_n = pad_to if pad_to is not None else n
        view = self._find_view(g_lo, g_hi)
        if view is not None and out_n == n:
            return view
        out = np.zeros((out_n,) + self.buf.shape[1:], np.uint8)
        if view is not None:
            out[:n] = view
            return out
        g = g_lo
        for s_lo, s_hi, base in self._segs:
            lo, hi = max(g, s_lo), min(g_hi, s_hi)
            if lo < hi:
                out[lo - g_lo:hi - g_lo] = \
                    self.buf[base + lo - s_lo:base + hi - s_lo]
                g = hi
        if g < g_hi:
            raise KeyError(f"frames [{g}, {g_hi}) not in arena")
        return out

    def _find_view(self, g_lo: int, g_hi: int):
        """Contiguous ring view covering [g_lo, g_hi), else None."""
        run_base = run_lo = run_hi = None
        for s_lo, s_hi, base in self._segs:
            if s_hi <= g_lo or s_lo >= g_hi:
                if run_hi is not None and run_hi >= g_hi:
                    break
                continue
            if run_hi is None:
                run_base, run_lo, run_hi = base, s_lo, s_hi
            elif s_lo == run_hi and base == run_base + (run_hi - run_lo):
                run_hi = s_hi
            else:
                return None  # ring discontinuity inside the range
        if run_hi is None or run_lo > g_lo or run_hi < g_hi:
            return None
        o = run_base + (g_lo - run_lo)
        return self.buf[o:o + (g_hi - g_lo)]


class _VideoPlan:
    """Host-side per-video bookkeeping the assembler consumes."""

    __slots__ = ("video_nr", "video_id", "vid_idx", "n", "frame_base",
                 "off_c", "n_valid", "phase", "wav", "wav_len", "_ts",
                 "out", "done_rows", "fallback")

    def __init__(self, video_nr, video_id, vid_idx, frame_base):
        self.video_nr = video_nr
        self.video_id = video_id
        self.vid_idx = vid_idx
        self.n = len(vid_idx)
        self.frame_base = frame_base
        self.wav = None
        self.out = None
        self.done_rows = 0
        self.fallback = False


class PackedAssembler:
    """Packs decoded videos into fixed-size dispatch buckets.

    Feed ``register_video`` (metadata + timestamps upfront), ``set_wav``
    (when the worker delivers audio), and ``frames_ready`` (decode
    progress in global frame coords); collect dispatch handles from
    ``drain``. Videos whose own timestamps need more than MAX_PHASES
    hop-grid phases fall back to the per-video device-audio route; a
    bucket closes early (padded) when adding the next video's clips would
    push the phase UNION past MAX_PHASES.
    """

    def __init__(self, sweep, arena: FrameArena, bucket: int,
                 quantum: int = 256):
        self.sweep = sweep
        self.arena = arena
        self.bucket = bucket
        self.quantum = quantum
        self.cfg = sweep.cfg
        self.videos: list[_VideoPlan] = []
        self._g_decoded = 0       # frames [0, g) written to the arena
        self._g_dispatched = 0    # clips [0, g) handed to a device program
        self._total = 0
        # (chunk_dev, release_g) for dispatched buckets whose async H2D
        # still reads the ring (see upload_dispatch)
        self._deferred: list = []

    # ---- registration -----------------------------------------------------
    def register_video(self, video_nr, video_id, vid_idx,
                       timestamps_ms) -> None:
        vp = _VideoPlan(video_nr, video_id, np.asarray(vid_idx),
                        frame_base=self._total)
        self._total += vp.n
        self.videos.append(vp)
        vp.off_c = None
        vp._ts = np.asarray(timestamps_ms)

    def set_wav(self, video_nr, wav: np.ndarray) -> None:
        vp = self._vp(video_nr)
        wav = np.asarray(wav, np.float32).reshape(-1)
        vp.wav = wav
        vp.wav_len = wav.shape[0]
        off_c, n_valid = self.sweep.audio_window_offsets(vp._ts, vp.wav_len)
        vp.off_c, vp.n_valid = off_c, n_valid
        vp.phase = (off_c % HOP_LENGTH).astype(np.int64)
        live_ph = np.unique(vp.phase[n_valid > 0])
        vp.fallback = live_ph.size > MAX_PHASES

    def frames_ready(self, g_hi: int) -> None:
        self._g_decoded = max(self._g_decoded, g_hi)

    def _vp(self, video_nr) -> _VideoPlan:
        for vp in self.videos:
            if vp.video_nr == video_nr:
                return vp
        raise KeyError(video_nr)

    # ---- dispatch ---------------------------------------------------------
    def drain(self, flush: bool = False):
        """Yield a host-side bucket PLAN for every bucket that is ready:
        frames decoded, wavs present. ``flush`` pads the final partial
        bucket. Plans hold numpy payloads (and arena chunk VIEWS — the
        owning rows stay live until :meth:`upload_dispatch` releases
        them); no tunnel RPC happens here. The split matters on a 1-core
        host: the axon tunnel client spin-waits inside device_put/fetch,
        so doing H2D inline while the decode child is hot starves decode
        AND stretches each put 10-30x (round-4 probe: 0.05s idle vs
        1-3.9s in-pipeline per 77 MB bucket). Callers buffer plans and
        run the RPC stage after decode quiesces (or on arena pressure)."""
        while True:
            item = self._next_bucket(flush)
            if item is None:
                return
            yield item

    def upload_dispatch(self, plan):
        """RPC stage of a drained plan: H2D puts + device dispatch ->
        (handle, demux). The plan's arena rows are released only after the
        async H2D transfer that reads them is observed complete (ADVICE
        r4: the chunk is a zero-copy ring view and device_put returns
        before the copy — releasing at dispatch time would let the decode
        worker overwrite rows an in-flight transfer still reads)."""
        release_g = max(plan["e"] - self.cfg.label_frame, 0)
        if plan["kind"] == "fallback":
            vp = plan["vp"]
            # rare route (>MAX_PHASES videos): decouple by COPY — the
            # frames view feeds dispatch_video's internal device_put,
            # whose array we cannot track for deferred release
            handle = self.sweep.dispatch_video(
                np.array(plan["frames"]), wav=vp.wav, timestamps_ms=vp._ts,
                batch=self.bucket)
            demux = plan["demux"]
            self.arena.release_below(release_g)
        else:
            handle, demux, chunk_dev = self._upload_packed(plan)
            self._deferred.append((chunk_dev, release_g))
            self.reap_releases()
        return handle, demux

    def reap_releases(self, block: bool = False) -> None:
        """Release arena rows whose H2D transfer has completed. With
        ``block=True`` wait for the OLDEST in-flight transfer first (the
        arena-pressure path: alloc needs ring space back now)."""
        import jax
        while self._deferred:
            arr, g = self._deferred[0]
            try:
                ready = bool(arr.is_ready())
            except Exception:
                ready = True
            if not ready:
                if not block:
                    return
                jax.block_until_ready(arr)
                block = False  # only force-wait the oldest
            self._deferred.pop(0)
            self.arena.release_below(g)

    def _ready_hi(self) -> int:
        """Global clip frontier that is dispatchable: frames decoded AND
        owning video's wav known (wav arrives with the first slice)."""
        hi = self._g_decoded
        for vp in self.videos:
            if vp.frame_base >= hi:
                break
            if vp.wav is None:
                return min(hi, vp.frame_base)
        return hi

    def _next_bucket(self, flush: bool):
        s = self._g_dispatched
        hi = self._ready_hi()
        if hi - s <= 0:
            return None
        # fallback videos dispatch alone through the per-video route
        vp0 = self._video_at(s)
        if vp0.fallback:
            if hi < vp0.frame_base + vp0.n:
                return None  # wait for the whole video
            return self._dispatch_fallback(vp0)
        # grow the bucket clip range [s, e): stop at capacity, at a
        # fallback video, or where the phase union would exceed MAX_PHASES
        e = s
        union: set = set()
        while e < hi and e - s < self.bucket:
            vp = self._video_at(e)
            if vp.fallback:
                break
            take_hi = min(vp.frame_base + vp.n, hi, s + self.bucket)
            a, b = e - vp.frame_base, take_hi - vp.frame_base
            ph = set(np.unique(vp.phase[a:b][vp.n_valid[a:b] > 0]).tolist())
            if union and len(union | ph) > MAX_PHASES:
                break
            union |= ph
            e = take_hi
            if len(union) > MAX_PHASES:  # single range over budget: split
                raise AssertionError("per-range phases exceed MAX_PHASES "
                                     "for a non-fallback video")
        if e == s:
            return None
        full = (e - s) == self.bucket
        at_break = e < hi and (self._video_at(e).fallback or not full)
        if not full and not flush and not at_break:
            return None  # keep filling
        return self._prepare_packed(s, e)

    def _video_at(self, g: int) -> _VideoPlan:
        for vp in self.videos:
            if vp.frame_base <= g < vp.frame_base + vp.n:
                return vp
        raise KeyError(g)

    def _bsize(self, cur: int) -> int:
        q = self.quantum
        return min(max(-(-cur // q) * q, q), self.bucket)

    def _prepare_packed(self, s: int, e: int) -> dict:
        """Host stage: window rows, packed wav buffer, phase table inputs,
        and the arena chunk view for clips [s, e) — pure numpy, no RPC."""
        _dbg = os.environ.get("AUFORMER_PACK_DEBUG")
        _t0 = time.perf_counter()
        cfg = self.cfg
        lf = cfg.label_frame
        cur = e - s
        bsize = self._bsize(cur)
        lo = max(s - lf, 0)

        # window rows in chunk-local coords, black slot at bsize + lf
        black = bsize + lf
        rows = np.full((bsize, cfg.n_frames), black, np.int64)
        starts = np.zeros(bsize, np.int64)
        n_valid = np.zeros(bsize, np.int32)
        base = np.zeros(bsize, np.int64)
        phase_vals = np.zeros(bsize, np.int64)
        demux = []

        # packed wav: per-video segments at 441-aligned offsets
        segs = []  # (vp, a, b, seg_lo, pos)
        cursor = 0
        g = s
        k = np.arange(cfg.n_frames)[None, :]
        while g < e:
            vp = self._video_at(g)
            b_hi = min(vp.frame_base + vp.n, e)
            a, b = g - vp.frame_base, b_hi - vp.frame_base
            i = np.arange(a, b)[:, None]
            idx = i - lf + cfg.dilation * (k + 1)
            oob = (idx < 0) | (idx >= vp.n)
            gidx = np.where(oob, -1, idx + vp.frame_base - lo)
            r = np.where((gidx < 0), black, gidx)
            rows[g - s:b_hi - s] = r

            off = vp.off_c[a:b]
            nv = vp.n_valid[a:b]
            seg_lo = int((off.min() // HOP_LENGTH) * HOP_LENGTH)
            seg_hi = int(min(off.max() + cfg.sample_len_frames + 512,
                             vp.wav_len))
            pos = cursor
            segs.append((vp, a, b, seg_lo, pos, seg_hi))
            # +512 zero guard between segments: table frames of a
            # file-length-clamped window can read ~512 samples past its
            # content (FFT support), which the per-video layout satisfies
            # with its zero tail — the guard keeps that read in zeros
            # instead of the next video's samples (bit-parity)
            cursor = -(-(pos + max(seg_hi - seg_lo, 0) + 512)
                       // HOP_LENGTH) * HOP_LENGTH
            starts[g - s:b_hi - s] = PACK_PRE + pos + (off - seg_lo)
            n_valid[g - s:b_hi - s] = nv
            base[g - s:b_hi - s] = (pos + off - seg_lo) // HOP_LENGTH
            phase_vals[g - s:b_hi - s] = (off - seg_lo) % HOP_LENGTH
            demux.append((vp, g - s, b_hi - s, a))
            g = b_hi

        content = -(-max(cursor, 1) // WAV_QUANTUM) * WAV_QUANTUM
        wav_buf = np.zeros(PACK_PRE + content + PACK_TAIL, np.float32)
        for vp, a, b, seg_lo, pos, seg_hi in segs:
            if seg_hi > seg_lo:
                wav_buf[PACK_PRE + pos:PACK_PRE + pos + seg_hi - seg_lo] \
                    = vp.wav[seg_lo:seg_hi]

        live = n_valid[:cur] > 0
        uniq = np.unique(phase_vals[:cur][live])
        if uniq.size == 0:
            uniq = np.zeros(1, np.int64)
        # pad the phase axis to the next power of two, NOT always
        # MAX_PHASES: each pad slot recomputes a full (t_g, M) mel table
        # inside the program (~1.3 ms f32 DFT matmul per slot at bucket
        # 2048), so an 8-slot table for 3 live phases wasted ~6 ms/bucket
        # of device time. {1,2,4,8} keeps the compile-shape count bounded.
        n_ph = min(1 << max(0, int(uniq.size - 1).bit_length()), MAX_PHASES)
        phases = np.concatenate(
            [uniq, np.full(n_ph - uniq.size, uniq[0])]).astype(np.int32)
        psel = np.searchsorted(uniq, phase_vals).astype(np.int32)
        psel = np.where(np.arange(bsize) < cur, psel, 0)
        psel = np.where(
            np.concatenate([live, np.zeros(bsize - cur, bool)]), psel,
            0).astype(np.int32)

        _t1 = time.perf_counter()
        chunk = self.arena.chunk(lo, e, pad_to=bsize + lf)
        if _dbg:
            print(f"    [pack] asm={_t1-_t0:.2f}s "
                  f"chunk={time.perf_counter()-_t1:.2f}s", flush=True)
        self._g_dispatched = e
        return {"kind": "packed", "e": e, "cur": cur, "chunk": chunk,
                "st": starts.astype(np.int32), "nv": n_valid,
                "bs": base.astype(np.int32), "ps": psel,
                "rw": rows.astype(np.int32), "wav_buf": wav_buf,
                "phases": phases, "demux": demux}

    def _upload_packed(self, plan: dict):
        """RPC stage of a packed plan: H2D puts + fused dispatch."""
        _dbg = os.environ.get("AUFORMER_PACK_DEBUG")
        _t0 = time.perf_counter()
        _c0 = time.process_time()
        sw = self.sweep
        chunk, st, nv, bs2, ps, rw = sw._shard_data(
            plan["chunk"], plan["st"], plan["nv"], plan["bs"],
            plan["ps"], plan["rw"])
        _t1 = time.perf_counter()
        _c1 = time.process_time()
        import jax
        if sw.mesh is None:
            # async H2D: never let the jit call block inline on the
            # transfer (see sweep._shard_data single-device note)
            wav_dev = jax.device_put(plan["wav_buf"])
            ph_dev = jax.device_put(plan["phases"])
        else:
            from .core.mesh import replicated_sharding
            wav_dev = jax.device_put(plan["wav_buf"],
                                     replicated_sharding(sw.mesh))
            ph_dev = jax.device_put(plan["phases"],
                                    replicated_sharding(sw.mesh))
        _t2 = time.perf_counter()
        fut = sw.fused_sweep_packed(chunk, wav_dev, ph_dev, st, nv, bs2,
                                    ps, rw)
        if _dbg:
            print(f"    [pack] shard={_t1-_t0:.2f}s (cpu {_c1-_c0:.2f}s) "
                  f"wavput={_t2-_t1:.2f}s "
                  f"call={time.perf_counter()-_t2:.2f}s", flush=True)
        cur = plan["cur"]
        return (cur, [(0, cur, fut)]), plan["demux"], chunk

    def _dispatch_fallback(self, vp: _VideoPlan):
        """Per-video device-audio route plan for >MAX_PHASES videos — the
        RPC stage (upload_dispatch) runs serve.sweep_stream's dispatch
        (sweep.dispatch_video)."""
        frames = self.arena.chunk(vp.frame_base, vp.frame_base + vp.n)
        e = vp.frame_base + vp.n
        self._g_dispatched = e
        return {"kind": "fallback", "e": e, "vp": vp, "frames": frames,
                "demux": [(vp, 0, vp.n, 0)]}


def packed_sweep_stream(cfg, variables, dataset=None, bucket=None,
                        max_clips=None, sweep=None, decode_worker=None,
                        mesh=None, fetch_group_clips: int = 16384,
                        stats: dict | None = None, arena_frames: int = 16384
                        ) -> Iterator[tuple[np.ndarray, str, np.ndarray]]:
    """Packed-bucket serving pipeline: same contract as serve.sweep_stream
    (yields ``(vid_idx, video_id, (N, out_dim) logits)`` per video, in
    video order) at a fraction of the per-video tunnel overhead.

    Decode slices (<= one bucket of frames) stream into the FrameArena —
    through shared memory when the process-isolated worker is available —
    and buckets dispatch as soon as their clip span is decoded, so H2D
    upload and device compute overlap decode of later videos."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from .data.testset import Aff2TestDataset
    from .serve import (DecodeWorker, decode_video_frames, read_video_wav,
                        default_sweep_bucket)
    from .sweep import make_sweep

    dataset = dataset or Aff2TestDataset(cfg)
    sweep = sweep or make_sweep(cfg, variables, mesh=mesh)
    if not hasattr(sweep, "fused_sweep_packed"):
        raise ValueError(
            "packed_sweep_stream requires an audio-bearing sweep with a "
            "fused packed program (AvformerSweep); use serve.sweep_stream "
            f"for {type(sweep).__name__}")
    bucket = bucket or default_sweep_bucket()
    h = w = cfg.image_size
    test_idx = np.nonzero(dataset.test_ids)[0]
    audio_dir = getattr(dataset, "audio_dir", cfg.root)
    videos = list(np.unique(dataset.video_db_nr[test_idx]))
    vid_rows = {v: test_idx[dataset.video_db_nr[test_idx] == v]
                for v in videos}
    if max_clips is not None:
        k, acc = 0, 0
        while k < len(videos) and acc < max_clips:
            acc += len(vid_rows[videos[k]])
            k += 1
        videos = videos[:k]

    st = stats if stats is not None else {}
    st.setdefault("decode_seconds", 0.0)
    st.setdefault("sweep_seconds", 0.0)
    st.setdefault("clips", 0)
    st["sweep"] = sweep
    st["decode_worker"] = decode_worker if decode_worker else None

    worker = decode_worker or None
    if worker is None and decode_worker is not False and videos \
            and sum(len(vid_rows[v]) for v in videos) >= 2000:
        try:
            worker = DecodeWorker(cfg)
            st["decode_worker"] = worker
        except Exception:
            worker = None

    arena_frames = max(arena_frames, 4 * bucket + 2 * cfg.label_frame)
    arena = FrameArena(arena_frames, h, w, shm=worker is not None)
    use_shm = worker is not None and worker.attach_arena(arena)
    asm = PackedAssembler(sweep, arena, bucket)
    ts_all = np.asarray(dataset.time_stamps)
    for v in videos:
        vi = vid_rows[v]
        video_id = os.path.dirname(dataset.image_path[vi[0]])
        asm.register_video(v, video_id, vi, ts_all[vi])

    # ---- slice-decode plan -------------------------------------------------
    slice_frames = bucket
    slices = []  # (video_nr, a, b, g_lo, first)
    g = 0
    for v in videos:
        n = len(vid_rows[v])
        for a in range(0, n, slice_frames):
            b = min(a + slice_frames, n)
            slices.append((v, a, b, g + a, a == 0))
        g += n

    fetch_ex = ThreadPoolExecutor(max_workers=1)
    fetch_futs: list = []
    pending: list = []   # (handle, demux)
    pending_clips = 0
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
            outs = sweep.fetch_many([h_ for h_, _ in group])
            with st_lock:
                st["clips"] += sum(h_[0] for h_, _ in group)
                st["sweep_seconds"] += time.perf_counter() - td
            return list(zip(outs, [d for _, d in group]))

        fetch_futs.append(fetch_ex.submit(work))

    def _completed():
        """Yield finished videos (in order) from resolved fetches."""
        while fetch_futs and fetch_futs[0].done():
            for out, demux in fetch_futs.pop(0).result():
                for vp, r_lo, r_hi, clip_lo in demux:
                    if vp.out is None:
                        vp.out = np.zeros((vp.n, out.shape[1]), np.float32)
                    nrow = r_hi - r_lo
                    vp.out[clip_lo:clip_lo + nrow] = out[r_lo:r_hi]
                    vp.done_rows += nrow
                    if vp.done_rows == vp.n:
                        yield vp.vid_idx, vp.video_id, vp.out

    plans: list = []  # prepared buckets awaiting the RPC stage
    # On a multi-core host the RPC stage overlaps decode (the decode child
    # owns its own core), so upload inline and keep the decode/H2D/compute
    # pipeline; buffer-until-quiesce exists for 1-core hosts where the
    # tunnel client's spin-wait starves decode AND stretches each put
    # 10-30x (ADVICE r4: the deferral must not cost multi-core hosts
    # their overlap)
    inline_upload = (os.cpu_count() or 1) >= 2

    def _on_slice(video_nr, a, b, g_lo, wav, dsec):
        st["decode_seconds"] += dsec
        if wav is not None:
            asm.set_wav(video_nr, wav)
        asm.frames_ready(g_lo + (b - a))
        td = time.perf_counter()
        # host stage only: bucket plans buffer until decode quiesces (or
        # arena pressure forces an upload) — see PackedAssembler.drain
        plans.extend(asm.drain())
        with st_lock:
            st["sweep_seconds"] += time.perf_counter() - td
        if inline_upload:
            _upload_plans()

    def _upload_plans():
        """RPC stage: H2D + dispatch every buffered plan (releases their
        arena rows), then group-fetch when past the fetch threshold."""
        nonlocal pending_clips
        if not plans:
            return
        td = time.perf_counter()
        for plan in plans:
            handle, demux = asm.upload_dispatch(plan)
            pending.append((handle, demux))
            pending_clips += handle[0]
        plans.clear()
        with st_lock:
            st["sweep_seconds"] += time.perf_counter() - td
        if pending_clips >= fetch_group_clips:
            _drain_async()

    def _decode_slice_local(v, a, b, base, first):
        vi = vid_rows[v][a:b]
        td = time.perf_counter()
        frames = decode_video_frames(dataset, vi, h, w)
        arena.buf[base:base + (b - a)] = frames
        wav = None
        if first and sweep.needs_audio:
            vp = asm._vp(v)
            wav = read_video_wav(audio_dir, vp.video_id)
        elif first:
            wav = np.zeros(1, np.float32)
        return wav, time.perf_counter() - td

    inflight = []  # (video_nr, a, b, g_lo, fut)
    local_ex = None if use_shm else ThreadPoolExecutor(max_workers=1)
    try:

        def _request(sl):
            v, a, b, g_lo, first = sl
            # arena pressure: the ring must hold every frame from the
            # oldest un-uploaded plan to this slice's end. The slack term
            # covers ring fragmentation — alloc's cursor wrap wastes up to
            # one slice of ring space, and releases retain label_frame
            # history rows — so the guard fires BEFORE alloc can overflow
            # at the minimum arena size (ADVICE r4).
            slack = (b - a) + asm.cfg.label_frame
            if plans and g_lo + (b - a) - arena._free_g \
                    > arena.cap - slack:
                _upload_plans()
            asm.reap_releases()
            try:
                base = arena.alloc(g_lo, b - a)
            except RuntimeError:
                # rows may still be pinned by an in-flight H2D transfer:
                # wait for the oldest, then retry once
                asm.reap_releases(block=True)
                base = arena.alloc(g_lo, b - a)
            if use_shm:
                worker.request_slice(v, a, b, base,
                                     first and sweep.needs_audio)
                inflight.append((v, a, b, g_lo, None))
            else:
                fut = local_ex.submit(_decode_slice_local, v, a, b, base,
                                      first)
                inflight.append((v, a, b, g_lo, fut))

        si = 0
        depth = 2
        while si < min(depth, len(slices)):
            _request(slices[si])
            si += 1
        while inflight:
            v, a, b, g_lo, fut = inflight.pop(0)
            if use_shm:
                wav, dsec = worker.slice_result()
            else:
                wav, dsec = fut.result()
            if si < len(slices):
                _request(slices[si])
                si += 1
            _on_slice(v, a, b, g_lo, wav, dsec)
            yield from _completed()
        # decode has quiesced: flush the final partial bucket, then run
        # the whole RPC stage on an uncontended core
        td = time.perf_counter()
        plans.extend(asm.drain(flush=True))
        with st_lock:
            st["sweep_seconds"] += time.perf_counter() - td
        _upload_plans()
        _drain_async()
        for f in fetch_futs:
            for out, demux in f.result():
                for vp, r_lo, r_hi, clip_lo in demux:
                    if vp.out is None:
                        vp.out = np.zeros((vp.n, out.shape[1]), np.float32)
                    nrow = r_hi - r_lo
                    vp.out[clip_lo:clip_lo + nrow] = out[r_lo:r_hi]
                    vp.done_rows += nrow
                    if vp.done_rows == vp.n:
                        yield vp.vid_idx, vp.video_id, vp.out
        fetch_futs.clear()
    finally:
        fetch_ex.shutdown(wait=True)
        if local_ex is not None:
            local_ex.shutdown(wait=True)
        if worker is not None and decode_worker is None:
            # internally-created workers would leak a child per call
            worker.close()
            st["decode_worker"] = None
        arena.close()
