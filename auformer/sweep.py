"""Dense-sweep inference with frame-feature reuse.

At submission time every frame of every video is scored
(test_aff2.py:93-117). Clip windows overlap heavily: the 16-frame dilated
window of label frame i shares 15 frames with the window of i+dilation, so
the clip-at-a-time forward recomputes the S-Former visual trunk ~16x per
frame (the reference pays this at batch 1 for "5+ hours", test_aff2.py:82).

This module restructures avformer inference *without changing its math*:

  1. the frame-level trunk (S-Former, ~70% of forward time) runs ONCE per
     video frame -> (N, 512) features;
  2. out-of-range / black frames use the precomputed trunk output of a
     black frame (identical arithmetic to the clip path's zero frames);
  3. clip windows become feature GATHERS feeding the temporal stack
     (T-Former -> AU_former -> fusion head) plus the per-frame audio
     stream.

Logits are bit-identical to the clip-at-a-time forward (tested) at ~16x
less trunk compute — on a v5e chip the sweep path sustains ~2.5-3x the
fused clip throughput.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .core.config import Config
from .nn.avformer import AudioModel
from .nn.heads import AUFormerHead, FormerAUHead
from .nn.resnet import ResFormerTrunk
from .nn.vformer import TFormer
from .ops.preprocess import normalize_clip


def _sub(variables, *path):
    p = variables["params"]
    s = variables.get("batch_stats", {})
    for k in path:
        p = p[k]
        s = s.get(k, {}) if isinstance(s, dict) else {}
    return {"params": p, "batch_stats": s}


def swap_conv_hw(tree):
    """Swap the H/W axes of every conv kernel (HWIO, ndim 4) in a variable
    tree. Running a trunk whose convs/pools are all H/W-symmetric (the
    audio resnet18) on spatially-transposed input with these weights gives
    the spatially-transposed activations — and identical pooled features —
    without ever materializing the input transpose on device."""
    return jax.tree.map(
        lambda a: jnp.swapaxes(a, 0, 1) if jnp.ndim(a) == 4 else a, tree)


def _fetch_concat(handles, out_dim: int) -> "list[np.ndarray]":
    """Block on several dispatch handles with ONE concatenated D2H fetch.

    The attached chip's RPC tunnel charges 1-11 s per device->host fetch
    regardless of size (round-3 e2e logs), so a serving loop that defers
    and groups per-video fetches pays that cost once per group instead of
    once per video."""
    futs = [f for _, pending in handles for _, _, f in pending]
    cat = np.asarray(jnp.concatenate(futs)) if futs else \
        np.zeros((0, out_dim), np.float32)
    outs = []
    o = 0
    for n, pending in handles:
        out = np.zeros((n, out_dim), np.float32)
        for ps, pcur, f in pending:
            out[ps:ps + pcur] = cat[o:o + pcur]
            o += f.shape[0]
        outs.append(out)
    return outs


class SweepBase:
    """Shared window/bucket machinery for frame-feature-cached sweeps.

    A concrete sweep supplies ``frame_features`` (per-frame trunk jit) and a
    ``fused_sweep*`` program; the base provides the reference window math
    (aff2compdataset.py:126-131), bucketed execution with cross-bucket
    history margins, and black-slot padding."""

    cfg: Config
    out_dim: int = 12          # logit columns produced per label frame
    needs_audio: bool = True   # whether sweep_video takes audio features
    mesh = None                # optional jax.sharding.Mesh (data-parallel)

    def _shard_data(self, *arrays):
        """Commit per-bucket payloads with leading-dim 'data' sharding when
        a mesh is configured (identity otherwise). Weights are replicated
        at construction; with committed input shardings the jitted sweep
        compiles as one GSPMD data-parallel program — the trunk runs on
        batch shards and XLA inserts the (tiny, (N+1)x512) feature
        all-gather the cross-shard window gather needs.

        ``device_put`` requires the sharded dim divisible by the axis size,
        so leading dims are padded to the next multiple by repeating the
        last row — window rows never reference pad rows (the black slot sits
        below them), and callers slice outputs by the true count, so pads
        are dead weight only. Padded shapes are constant per bucket shape:
        no extra compiles."""
        if self.mesh is None:
            # single-device: issue the H2D transfers ASYNCHRONOUSLY instead
            # of letting the jit call do them inline. A jitted call with
            # numpy args blocks the host until every argument transfer
            # completes — through the axon RPC tunnel that inline block
            # stretched to 1.5-4.5 s per bucket while executions were in
            # flight (round-4 packed-pipeline probe, 2026-08-19), whereas
            # device_put returns immediately and the transfer overlaps
            # decode of the next slice.
            placed = tuple(
                jax.device_put(np.ascontiguousarray(a)
                               if isinstance(a, np.ndarray) else a)
                for a in arrays)
            return placed if len(placed) > 1 else placed[0]
        from .core.mesh import data_sharding
        d = self.mesh.shape["data"]

        def _place(a):
            r = (-a.shape[0]) % d
            if r:
                a = np.concatenate([a, np.repeat(a[-1:], r, axis=0)])
            return jax.device_put(a, data_sharding(self.mesh, np.ndim(a)))

        placed = tuple(_place(np.asarray(a)) for a in arrays)
        return placed if len(placed) > 1 else placed[0]

    def _place_weights(self, tree):
        """Device-resident weights: replicated over the mesh when sharded
        dispatch is configured, default single-device placement otherwise."""
        if self.mesh is None:
            return jax.device_put(tree)
        from .core.mesh import replicated_sharding
        return jax.device_put(tree, replicated_sharding(self.mesh))

    def black_feature(self, image_size: int) -> np.ndarray:
        black = np.zeros((1, image_size, image_size, 3), np.uint8)
        return np.asarray(self.frame_features(black))[0]

    def window_indices(self, n_frames_video: int) -> np.ndarray:
        """(N, clip_len) gather indices into [0..N] where N = black slot.

        Row i mirrors the clip window of label frame i
        (aff2compdataset.py:126-131): range(i - L + d, i - L + d(T+1), d),
        out-of-range -> the black slot.
        """
        cfg = self.cfg
        t = cfg.n_frames
        d = cfg.dilation
        lf = cfg.label_frame
        i = np.arange(n_frames_video)[:, None]
        k = np.arange(t)[None, :]
        idx = i - lf + d * (k + 1)
        oob = (idx < 0) | (idx >= n_frames_video)
        return np.where(oob, n_frames_video, idx)

    #: bucket sizes quantize to this many label frames: bounds the number
    #: of compiled program shapes at batch/quantum while keeping pad waste
    #: under quantum-1 rows per bucket (a fixed ``batch`` bucket wasted up
    #: to 60% of device compute on short videos — round-3 e2e trace)
    bucket_quantum: int = 256

    def _bucket_size(self, n: int, batch: int) -> int:
        """Uniform per-bucket size for an n-clip video: the video splits
        into ceil(n/batch) buckets whose size is ceil-divided n quantized
        up to ``bucket_quantum``, so short videos don't pay full-``batch``
        padding and long videos still cap at ``batch`` rows/program."""
        if n <= 0:
            return batch
        q = self.bucket_quantum
        k = -(-n // batch)                  # buckets needed at the cap
        even = -(-n // k)                   # even split across them
        per = -(-even // q) * q             # quantized up
        return min(max(per, q), batch)

    def _buckets(self, n: int, frames_u8: np.ndarray, batch: int):
        """Yield (s, cur, bsize, frames_chunk, rows) per bucket of
        ``bsize`` label frames (video-adaptive, see ``_bucket_size``):
        frames padded to the static bsize+label_frame shape with a
        history margin for cross-bucket windows; window rows remapped to
        chunk-local coordinates with the black slot at bsize+label_frame.
        The shared machinery behind every sweep_video* variant — each
        variant only supplies its per-bucket payload (padded with
        ``_pad_rows`` to ``bsize``)."""
        lf = self.cfg.label_frame
        idx_full = self.window_indices(n)
        bsize = self._bucket_size(n, batch)
        for s in range(0, n, bsize):
            cur = min(bsize, n - s)
            lo = max(s - lf, 0)
            frames_chunk = frames_u8[lo:s + cur]
            rows = idx_full[s:s + cur].copy()
            black_slot = len(frames_chunk)
            rows = np.where(rows == n, -1, rows) - lo
            rows = np.where((rows < 0) | (rows >= black_slot),
                            black_slot, rows)
            fpad = bsize + lf - len(frames_chunk)
            if fpad:
                frames_chunk = np.concatenate(
                    [frames_chunk,
                     np.zeros((fpad,) + frames_chunk.shape[1:], np.uint8)])
            if cur < bsize:
                rows = np.concatenate(
                    [rows, np.full((bsize - cur, rows.shape[1]),
                                   black_slot)])
            rows = np.where(rows == black_slot, bsize + lf, rows)
            yield s, cur, bsize, frames_chunk, rows

    @staticmethod
    def _pad_rows(arr: np.ndarray, batch: int) -> np.ndarray:
        """Pad a per-bucket payload slice to ``batch`` rows by repeating
        the last row (static device shapes)."""
        if arr.shape[0] < batch:
            reps = np.repeat(arr[-1:], batch - arr.shape[0], axis=0)
            arr = np.concatenate([arr, reps])
        return arr

    # -- uniform serving surface (serve.py::sweep_stream) -------------------
    def dispatch_video(self, frames_u8: np.ndarray, wav=None,
                       timestamps_ms=None, batch: int = 512):
        """Dispatch one video's dense sweep asynchronously; returns an
        opaque handle for :meth:`fetch_many`. ``wav``/``timestamps_ms``
        are consumed by audio-bearing sweeps and ignored otherwise."""
        raise NotImplementedError

    def fetch_many(self, handles) -> "list[np.ndarray]":
        """Block on several :meth:`dispatch_video` handles with ONE
        concatenated D2H fetch -> [(N_i, out_dim)]."""
        return _fetch_concat(handles, self.out_dim)


class AvformerSweep(SweepBase):
    """Frame-feature-cached avformer executor (task='AU', modality 'A;V')."""

    out_dim = 12
    needs_audio = True

    def __init__(self, cfg: Config, variables, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        use_pallas = cfg.use_pallas

        trunk = ResFormerTrunk(dtype=dtype, use_pallas=use_pallas)
        tformer = TFormer(num_patches=cfg.n_frames, dtype=dtype,
                          use_pallas=use_pallas)
        v_au_head = AUFormerHead(input_dim=512, dtype=dtype,
                                 use_pallas=use_pallas)
        a_model = AudioModel(dtype)
        a_model_tm = AudioModel(dtype, time_major=True)
        a_au_head = AUFormerHead(dropout=cfg.dropout_rate, dtype=dtype,
                                 use_pallas=use_pallas)
        fusion = FormerAUHead(emb_dim=256, dropout=cfg.dropout_rate,
                              dtype=dtype, use_pallas=use_pallas)

        # Weights are SHIPPED ONCE as a device-resident pytree and every
        # jitted entry takes them as an ARGUMENT. Closing over them bakes
        # ~100 MB of parameters into the HLO as constants: trace-time D2H
        # fetches, a 325 MB serialized executable that must be pushed
        # through the RPC tunnel at every process start (observed as a
        # >600 s stall in the round-3 e2e bench), and value-keyed
        # compile-cache entries.
        self.v = self._place_weights({
            "trunk": _sub(variables, "video_model", "video_model",
                          "s_former"),
            "tf": _sub(variables, "video_model", "video_model", "t_former"),
            "v_head": _sub(variables, "video_model", "au_head"),
            "a_net": _sub(variables, "audio_model", "audio_model"),
            # HW-swapped copy for the transpose-free (time-major) audio
            # feature layout the phase/packed sweep programs use
            "a_net_tm": swap_conv_hw(
                _sub(variables, "audio_model", "audio_model")),
            "a_head": _sub(variables, "audio_model", "au_head"),
            "f_head": _sub(variables, "au_head"),
        })

        def _frame_features(v, frames_u8):
            x = normalize_clip(frames_u8, dtype=dtype)
            return trunk.apply(v["trunk"], x, train=False, deterministic=True)

        def _head_forward(v, gathered_feats, audio_features,
                          time_major=False):
            pooled = tformer.apply(v["tf"], gathered_feats,
                                   deterministic=True)
            _, v_tokens = v_au_head.apply(v["v_head"], pooled, train=False,
                                          deterministic=True)
            if time_major:  # (N, T, M, 1) features + HW-swapped trunk
                a_feat = a_model_tm.apply(v["a_net_tm"], audio_features,
                                          train=False)
            else:
                a_feat = a_model.apply(v["a_net"], audio_features,
                                       train=False)
            _, a_tokens = a_au_head.apply(v["a_head"], a_feat, train=False,
                                          deterministic=True)
            fused = jnp.concatenate([a_tokens, v_tokens], axis=2)
            return fusion.apply(v["f_head"], fused, deterministic=True)

        def _fused_sweep(v, frames_u8, audio_features, idx,
                         time_major=False):
            """Whole-bucket sweep in ONE device program: trunk once per
            frame, on-device window gather, temporal+audio heads. No
            intermediate host round-trips."""
            feats = _frame_features(v, frames_u8)           # (N, 512)
            black = _frame_features(
                v, jnp.zeros((1,) + frames_u8.shape[1:], jnp.uint8))
            feats = jnp.concatenate([feats, black])         # black slot = N
            gathered = feats[idx]                           # (N, T, 512)
            return _head_forward(v, gathered, audio_features, time_major)

        # vars-first jitted entries (for composition inside an outer jit —
        # pass ``self.v`` through the outer program's arguments) ...
        self.frame_features_fn = jax.jit(_frame_features)
        self.head_forward_fn = jax.jit(_head_forward)
        self.fused_sweep_fn = jax.jit(_fused_sweep)
        # ... and the bound convenience forms used by the host drivers
        self.frame_features = \
            lambda frames: self.frame_features_fn(self.v, frames)
        self.head_forward = \
            lambda g, a: self.head_forward_fn(self.v, g, a)
        self.fused_sweep = \
            lambda f, a, i: self.fused_sweep_fn(self.v, f, a, i)

        def fused_sweep_shared_audio(v, frames_u8, mel_shared, mel_cols,
                                     idx):
            """Sweep with shared-spectrogram audio (opt-in, approximate):
            one global mel power spectrogram per video; each label frame's
            (64, 1001) feature map is a column gather + per-window dB floor
            + normalize. Snapping window offsets to the 441-sample hop grid
            shifts the analysis grid <=5 ms vs the reference's per-window
            STFT — NOT bit-faithful (see docs/DESIGN.md), ~20x less mel
            compute.

            mel_shared: (n_mels, T_total) power mel of the whole video,
            LEFT-extended with zeros so early windows can reach back.
            mel_cols: (N, 1001) int32 column indices into mel_shared.
            """
            from .ops.audio import amplitude_to_db, normalize_spec
            mel_win = mel_shared[:, mel_cols]               # (M, N, 1001)
            mel_win = jnp.transpose(mel_win, (1, 0, 2))     # (N, M, 1001)
            feats = normalize_spec(amplitude_to_db(mel_win))[:, None]
            return _fused_sweep(v, frames_u8, feats, idx)

        self.fused_sweep_shared_audio_fn = jax.jit(fused_sweep_shared_audio)
        self.fused_sweep_shared_audio = \
            lambda f, m, c, i: self.fused_sweep_shared_audio_fn(
                self.v, f, m, c, i)

        def fused_sweep_device_audio(v, frames_u8, wav_ext, starts, n_valid,
                                     idx):
            """Sweep with per-video DEVICE-RESIDENT audio: each window is
            gathered from the whole-video waveform on device and the mel
            frontend runs fused with the sweep, so the host ships one wav
            per video instead of 441000 floats per clip.

            Windows are assembled LEFT-ALIGNED (valid samples at buffer
            position 0) so the STFT grid and the start reflect-pad anchor
            at the true signal start — exactly the grid the reference's
            mel-over-a-short-window uses (aff2compdataset.py:228-238 via
            audio_host.reference_audio_features); the end reflect-pad of a
            short window is emulated by writing reverse(signal tail) after
            the last valid sample. EXACT vs per-window host features for
            all window lengths >= 513 samples (tested); sub-513-sample
            windows (< 12 ms of audio, where torchaudio's own reflect pad
            would raise) stay zero after the signal.

            wav_ext: (L + 2*441000 + 512,) f32 = [zeros(441000) | wav |
                     zeros]; starts: (N,) int32 = 441000 + clamped window
                     offset (see audio_window_plan); n_valid: (N,) int32
                     true sample count of each window.
            """
            from .ops.audio import audio_frontend
            slen = self.cfg.sample_len_frames

            # contiguous dynamic_slice per window via lax.map — a fancy-
            # index gather of (N, 441000) runs at element granularity on
            # TPU and measured 40x slower (2.0s vs 0.05s per 512-window
            # bucket). The slice is 512 samples longer than the window so
            # the reflect patch of a nearly-full window never clamps.
            ext = slen + 512

            def _window(args):
                s, nv = args
                w = jax.lax.dynamic_slice(wav_ext, (s,), (ext,))
                w = jnp.where(jnp.arange(ext, dtype=jnp.int32) < nv, w, 0.0)
                # torchaudio center-pad reflects the signal end: position
                # nv+j takes sample nv-2-j (no edge repeat)
                r = jax.lax.dynamic_slice(
                    w, (jnp.maximum(nv - 513, 0),), (513,))[::-1]
                patched = jax.lax.dynamic_update_slice(w, r[1:513], (nv,))
                w = jnp.where(nv >= 513, patched, w)
                return w[:slen]

            win = jax.lax.map(_window, (starts, n_valid),
                              batch_size=64)                # (N, 441000)
            feats = audio_frontend(win, feature_len=1 + n_valid // 441,
                                   n_mels=self.cfg.n_mels,
                                   out_frames=self.cfg.mel_frames,
                                   mel_bf16=self.cfg.mel_bf16,
                                   left_aligned=True)
            return _fused_sweep(v, frames_u8, feats, idx)

        self.fused_sweep_device_audio_fn = jax.jit(fused_sweep_device_audio)
        self.fused_sweep_device_audio = \
            lambda f, w, s, nv, i: self.fused_sweep_device_audio_fn(
                self.v, f, w, s, nv, i)

        def fused_sweep_phase_audio(v, frames_u8, wav_ext, phase_mels,
                                    starts, n_valid, base, phase_sel, idx):
            """Sweep with EXACT shared-spectrogram audio (ops/phase_mel.py):
            window offsets fall on <= MAX_PHASES phase-shifted copies of the
            441-sample hop grid, so interior STFT frames gather from the
            per-video ``phase_mels`` tables (computed once, ~100x less DFT
            work than per-window) and only the two window-local reflect
            edge frames compute per window. Feature parity with the
            reference host path is ~1e-5 in normalized units
            (tests/test_phase_mel.py); the default device-audio route when
            the host plan finds few enough phases."""
            from .ops.phase_mel import phase_window_features
            feats = phase_window_features(wav_ext, phase_mels, starts,
                                          n_valid, base, phase_sel,
                                          out_frames=self.cfg.mel_frames,
                                          time_major=True)
            return _fused_sweep(v, frames_u8, feats, idx, time_major=True)

        self.fused_sweep_phase_audio_fn = jax.jit(fused_sweep_phase_audio)
        self.fused_sweep_phase_audio = \
            lambda f, w, pm, s, nv, b, ps, i: self.fused_sweep_phase_audio_fn(
                self.v, f, w, pm, s, nv, b, ps, i)

        def _phase_mel_table(wav_ext, phases):
            from .ops.phase_mel import phase_mel_table
            return phase_mel_table(wav_ext, phases, n_mels=cfg.n_mels)

        self.phase_mel_table_fn = jax.jit(_phase_mel_table)

        def fused_sweep_packed(v, frames_u8, wav_buf, phases, starts,
                               n_valid, base, phase_sel, idx):
            """Cross-video PACKED bucket: one device program per fixed-size
            bucket of clips drawn from SEVERAL videos (auformer/packed.py
            assembles the payloads). The phase-mel tables are computed
            INSIDE the program from the bucket's packed wav buffer — the
            table matmul is ~1-3 ms while a separate per-video table
            execution costs ~90 ms of tunnel overhead (round-4 probe), so
            fusing it deletes one execution per video from the serving
            critical path.

            wav_buf layout: [zeros(PACK_PRE) | per-video wav segments at
            441-aligned offsets | zeros(PACK_TAIL)] (packed.py); starts/
            base are buffer/grid coords in that layout, phases the union
            of the packed videos' hop-grid phases.
            """
            from .ops.phase_mel import (phase_mel_table_span,
                                        phase_window_features)
            from .packed import PACK_PRE, PACK_TAIL
            t_g = (wav_buf.shape[-1] - PACK_PRE - PACK_TAIL) // 441 + 2
            pm = phase_mel_table_span(wav_buf, phases, pre=PACK_PRE,
                                      t_g=t_g, n_mels=cfg.n_mels)
            feats = phase_window_features(wav_buf, pm, starts, n_valid,
                                          base, phase_sel,
                                          out_frames=cfg.mel_frames,
                                          time_major=True)
            return _fused_sweep(v, frames_u8, feats, idx, time_major=True)

        self.fused_sweep_packed_fn = jax.jit(fused_sweep_packed)
        self.fused_sweep_packed = \
            lambda f, w, ph, s, nv, b, ps, i: self.fused_sweep_packed_fn(
                self.v, f, w, ph, s, nv, b, ps, i)

    def shared_audio_plan(self, timestamps_ms: np.ndarray,
                          total_samples: int) -> np.ndarray:
        """Column-gather plan for shared-spectrogram audio.

        Returns (N, 1001) int32 indices into a padded global mel laid out
        as [1001 zero cols | global mel | 1001 zero cols]; window offsets
        are snapped to the 441-sample hop grid (<=5 ms shift vs the
        reference's per-window grid).
        """
        from .ops import audio_host
        cfg = self.cfg
        n = len(timestamps_ms)
        t_total = 1 + total_samples // 441
        cols = np.zeros((n, cfg.mel_frames), np.int32)
        k = np.arange(cfg.mel_frames)
        for i, ts in enumerate(np.asarray(timestamps_ms)):
            offset, nsamp = audio_host.audio_window_params(
                float(ts), cfg.sample_rate, cfg.sample_len_frames,
                cfg.audio_shift_samples)
            nsamp = min(nsamp, max(total_samples - offset, 0))
            g0 = int(round(offset / 441.0))
            t_i = 1 + nsamp // 441
            idx = g0 + t_i + k          # padded coords (see derivation)
            cols[i] = np.clip(idx, 0, t_total + 2 * cfg.mel_frames - 1)
        return cols

    def sweep_video_shared_audio(self, frames_u8: np.ndarray,
                                 wav: np.ndarray,
                                 timestamps_ms: np.ndarray,
                                 batch: int = 512) -> np.ndarray:
        """Dense sweep with the approximate shared-spectrogram audio mode:
        ONE global mel per video + per-window column gathers. frames_u8
        (N,H,W,3), wav (L,) float32 full-video mono audio."""
        from .ops.audio import mel_spectrogram
        n = frames_u8.shape[0]
        mel = np.asarray(mel_spectrogram(wav[None]))[0]     # (M, T_total)
        pad = np.zeros((mel.shape[0], self.cfg.mel_frames), np.float32)
        mel_padded = np.concatenate([pad, mel, pad], axis=1)
        cols = self.shared_audio_plan(timestamps_ms, wav.shape[-1])

        out = np.zeros((n, 12), np.float32)
        for s, cur, bsize, frames_chunk, rows in self._buckets(
                n, frames_u8, batch):
            cc = self._pad_rows(cols[s:s + cur], bsize)
            logits = np.asarray(self.fused_sweep_shared_audio(
                frames_chunk, mel_padded, cc, rows))
            out[s:s + cur] = logits[:cur]
        return out

    def audio_window_offsets(self, timestamps_ms: np.ndarray,
                             total_samples: int
                             ) -> tuple[np.ndarray, np.ndarray]:
        """(clamped offsets, n_valid) in UNPADDED video-wav coordinates.

        Window math mirrors the reference's torchaudio.load(offset,
        num_frames) call (aff2compdataset.py:218-226 via
        audio_host.audio_window_params), with the actual-file-length clamp
        load_wav applies. Layout-agnostic: callers add their buffer's
        prefix/segment offset to build device ``starts`` (the per-video
        plan below, the packed assembler in auformer/packed.py)."""
        from .ops import audio_host
        cfg = self.cfg
        offsets, want = audio_host.audio_window_params_batch(
            timestamps_ms, cfg.sample_rate, cfg.sample_len_frames,
            cfg.audio_shift_samples)
        off_c = np.minimum(offsets, total_samples)
        n_valid = np.maximum(
            np.minimum(want, total_samples - off_c), 0).astype(np.int32)
        return off_c.astype(np.int64), n_valid

    def audio_window_plan(self, timestamps_ms: np.ndarray,
                          total_samples: int
                          ) -> tuple[np.ndarray, np.ndarray]:
        """(starts, n_valid) int32 arrays for fused_sweep_device_audio.

        Windows are LEFT-ALIGNED: in the padded [zeros(441000) | wav |
        zeros] device buffer a window starts at 441000 + clamped offset,
        so its first valid sample sits at buffer position 0 of the slice
        (the STFT grid anchor)."""
        off_c, n_valid = self.audio_window_offsets(timestamps_ms,
                                                   total_samples)
        starts = (self.cfg.sample_len_frames + off_c).astype(np.int32)
        return starts, n_valid

    def dispatch_video_device_audio(self, frames_u8: np.ndarray,
                                    wav: np.ndarray,
                                    timestamps_ms: np.ndarray,
                                    batch: int = 512):
        """Dispatch a whole video's dense sweep asynchronously; returns an
        opaque handle for :meth:`fetch_video_device_audio`. Splitting
        dispatch from fetch lets a serving loop keep the device busy with
        video *i* while the host decodes video *i+1* and fetches *i-1*
        (serve.py::sweep_serve_benchmark)."""
        import jax as _jax
        cfg = self.cfg
        n = frames_u8.shape[0]
        slen = cfg.sample_len_frames
        wav = np.asarray(wav, np.float32).reshape(-1)
        # round the device buffer up to whole minutes: one compiled program
        # per minute-bucket of video length instead of one per video; +512
        # so the extended (slen+512) window slices never clamp
        bucket_samples = 60 * cfg.sample_rate
        l_pad = -(-max(wav.shape[0], 1) // bucket_samples) * bucket_samples
        wav_ext = np.zeros(l_pad + 2 * slen + 512, np.float32)
        wav_ext[slen:slen + wav.shape[0]] = wav
        if self.mesh is None:
            wav_dev = _jax.device_put(wav_ext)
        else:
            # whole-video waveform replicates; bucket payloads shard below
            from .core.mesh import replicated_sharding
            wav_dev = _jax.device_put(wav_ext, replicated_sharding(self.mesh))
        starts, n_valid = self.audio_window_plan(timestamps_ms, wav.shape[0])

        # EXACT shared-spectrogram route (ops/phase_mel.py) when the
        # video's window offsets land on few enough hop-grid phases
        # (always true for ~30 fps timestamps); per-window route otherwise
        from .ops.phase_mel import phase_plan
        pplan = phase_plan(starts.astype(np.int64) - slen, n_valid)
        phase_mels = None
        if pplan is not None:
            phases, base, phase_sel = pplan
            phase_mels = self.phase_mel_table_fn(wav_dev, phases)

        # dispatch every bucket asynchronously and fetch ONE concatenated
        # result per video: the attached chip's RPC tunnel charges >1s per
        # device->host fetch regardless of size, so per-bucket fetches
        # dominate the sweep (VERDICT round-2 e2e work)
        pending = []  # (s, cur, device future)
        for s, cur, bsize, frames_chunk, rows in self._buckets(
                n, frames_u8, batch):
            st = self._pad_rows(starts[s:s + cur], bsize)
            nv = self._pad_rows(n_valid[s:s + cur], bsize)
            if phase_mels is not None:
                bs = self._pad_rows(base[s:s + cur], bsize)
                ps = self._pad_rows(phase_sel[s:s + cur], bsize)
                frames_chunk, st, nv, bs, ps, rows = self._shard_data(
                    frames_chunk, st, nv, bs, ps, rows)
                fut = self.fused_sweep_phase_audio(
                    frames_chunk, wav_dev, phase_mels, st, nv, bs, ps, rows)
            else:
                frames_chunk, st, nv, rows = self._shard_data(
                    frames_chunk, st, nv, rows)
                fut = self.fused_sweep_device_audio(
                    frames_chunk, wav_dev, st, nv, rows)
            pending.append((s, cur, fut))
        return (n, pending)

    def dispatch_video(self, frames_u8: np.ndarray, wav=None,
                       timestamps_ms=None, batch: int = 512):
        """Uniform serving dispatch: the device-audio sweep (one wav upload
        per video, per-window gather + mel fused on device)."""
        return self.dispatch_video_device_audio(
            frames_u8, wav, timestamps_ms, batch=batch)

    @staticmethod
    def fetch_video_device_audio(handle) -> np.ndarray:
        """Block on a :meth:`dispatch_video_device_audio` handle -> (N,12)."""
        return _fetch_concat([handle], 12)[0]

    @staticmethod
    def fetch_many_device_audio(handles) -> "list[np.ndarray]":
        """Back-compat alias of :meth:`fetch_many` for device-audio
        handles (AU sweeps, out_dim 12)."""
        return _fetch_concat(handles, 12)

    def sweep_video_device_audio(self, frames_u8: np.ndarray,
                                 wav: np.ndarray,
                                 timestamps_ms: np.ndarray,
                                 batch: int = 512) -> np.ndarray:
        """Dense sweep shipping the video's audio to the device ONCE.

        frames_u8 (N,H,W,3) uint8, wav (L,) float32 full-video mono,
        timestamps_ms (N,). The per-window gather + mel run inside the
        fused device program (fused_sweep_device_audio)."""
        return self.fetch_video_device_audio(
            self.dispatch_video_device_audio(
                frames_u8, wav, timestamps_ms, batch=batch))

    def sweep_video(self, frames_u8: np.ndarray,
                    audio_features: np.ndarray,
                    batch: int = 512) -> np.ndarray:
        """frames_u8 (N,H,W,3) + audio_features (N,1,mels,T) -> (N,12).

        Buckets of up to ``batch`` frames run through ONE fused device
        program each (video-adaptive quantized bucket size — static
        compiled shapes, bounded pad waste; see ``_bucket_size``). The
        window gather crosses bucket boundaries through a history margin
        of label_frame frames prepended to each bucket.
        """
        n = frames_u8.shape[0]
        out = np.zeros((n, 12), np.float32)
        for s, cur, bsize, frames_chunk, rows in self._buckets(
                n, frames_u8, batch):
            af = self._pad_rows(audio_features[s:s + cur], bsize)
            frames_chunk, af, rows = self._shard_data(frames_chunk, af, rows)
            logits = np.asarray(self.fused_sweep(frames_chunk, af, rows))
            out[s:s + cur] = logits[:cur]
        return out


class VformerSweep(SweepBase):
    """Frame-feature-cached vformer executor (visual-only, all 21 logits).

    Same restructuring as AvformerSweep without the audio stream: the
    S-Former trunk (vformer.py:232-268, ~16x recomputed by the clip path)
    runs once per video frame; clip windows become feature gathers feeding
    the T-Former + BN-MLP head (vformer.py:279-293, 368-373). Bit-identical
    to the clip-at-a-time VisualFormer forward (tested). Serves the
    reference's full 21-logit inference output (test_aff2.py:117-119) —
    VERDICT round-2 item 8.
    """

    out_dim = 21
    needs_audio = False

    def __init__(self, cfg: Config, variables, mesh=None):
        if "M" in cfg.modality:
            raise NotImplementedError(
                "VformerSweep decodes RGB frames only (modality 'V')")
        self.cfg = cfg
        self.mesh = mesh
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32
        self.dtype = dtype
        use_pallas = cfg.use_pallas

        from .nn.vformer import MLPHead

        trunk = ResFormerTrunk(dtype=dtype, use_pallas=use_pallas)
        tformer = TFormer(num_patches=cfg.n_frames, dtype=dtype,
                          use_pallas=use_pallas)
        mlp = MLPHead(dtype=dtype)

        # weights as a device-resident ARGUMENT, not a closure constant —
        # see AvformerSweep.__init__
        self.v = self._place_weights({
            "trunk": _sub(variables, "video_model", "s_former"),
            "tf": _sub(variables, "video_model", "t_former"),
            "head": _sub(variables, "fc"),
        })

        def _frame_features(v, frames_u8):
            x = normalize_clip(frames_u8, dtype=dtype)
            return trunk.apply(v["trunk"], x, train=False,
                               deterministic=True)

        def _fused_sweep(v, frames_u8, idx):
            feats = _frame_features(v, frames_u8)           # (N, 512)
            black = _frame_features(
                v, jnp.zeros((1,) + frames_u8.shape[1:], jnp.uint8))
            feats = jnp.concatenate([feats, black])         # black slot = N
            gathered = feats[idx]                           # (N, T, 512)
            pooled = tformer.apply(v["tf"], gathered, deterministic=True)
            return mlp.apply(v["head"], pooled, train=False)

        self.frame_features_fn = jax.jit(_frame_features)
        self.fused_sweep_fn = jax.jit(_fused_sweep)
        self.frame_features = \
            lambda frames: self.frame_features_fn(self.v, frames)
        self.fused_sweep = lambda f, i: self.fused_sweep_fn(self.v, f, i)

    def dispatch_video(self, frames_u8: np.ndarray, wav=None,
                       timestamps_ms=None, batch: int = 512):
        """Uniform serving dispatch (visual-only: ``wav``/``timestamps_ms``
        are accepted and ignored); async per-bucket dispatch, fetch via
        :meth:`fetch_many`."""
        n = frames_u8.shape[0]
        pending = []
        for s, cur, _bsize, frames_chunk, rows in self._buckets(
                n, frames_u8, batch):
            frames_chunk, rows = self._shard_data(frames_chunk, rows)
            fut = self.fused_sweep(frames_chunk, rows)
            pending.append((s, cur, fut))
        return (n, pending)

    def sweep_video(self, frames_u8: np.ndarray,
                    batch: int = 512) -> np.ndarray:
        """frames_u8 (N,H,W,3) -> (N, 21) logits; async per-bucket dispatch
        with ONE concatenated fetch (the RPC tunnel charges >1s per
        device->host fetch regardless of size)."""
        return self.fetch_many(
            [self.dispatch_video(frames_u8, batch=batch)])[0]


#: RGB zoo models whose prediction depends on ONE frame: for them the
#: trunk-once-per-frame sweep IS the whole model, so dense serving is a
#: straight batched per-frame forward (no window gather, no history
#: margins). dsformer is also single-frame but consumes the V;M mask
#: channel the RGB-only serving decode path doesn't assemble.
SINGLE_FRAME_MODELS = ("sformer", "van", "vggformer", "emonet", "resnet")


class SingleFrameSweep(SweepBase):
    """Batched per-frame executor for the single-frame zoo models
    (reference sformer.py:368 single-frame assert and friends): each test
    frame forwards once through the full model at fixed bucket shapes —
    the universal fast submission path for models with no temporal window
    (VERDICT round-3 item 9)."""

    out_dim = 21
    needs_audio = False

    def __init__(self, cfg: Config, variables, mesh=None):
        if cfg.model_name not in SINGLE_FRAME_MODELS:
            raise ValueError(f"{cfg.model_name} is not single-frame")
        if "M" in cfg.modality:
            raise NotImplementedError(
                "serving decode assembles RGB frames only (modality 'V')")
        self.cfg = cfg
        self.mesh = mesh
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32
        self.dtype = dtype

        from .nn import build_model
        model = build_model(cfg)
        self.v = self._place_weights(variables)

        def _fused_sweep(v, frames_u8):
            x = {"clip": normalize_clip(frames_u8, dtype=dtype)[:, None]}
            return model.apply(v, x, train=False).astype(jnp.float32)

        self.fused_sweep_fn = jax.jit(_fused_sweep)
        self.fused_sweep = lambda f: self.fused_sweep_fn(self.v, f)

    def dispatch_video(self, frames_u8: np.ndarray, wav=None,
                       timestamps_ms=None, batch: int = 512):
        """Uniform serving dispatch (``wav``/``timestamps_ms`` accepted and
        ignored); buckets pad to fixed shapes so every video compiles to
        the same programs."""
        n = frames_u8.shape[0]
        pending = []
        for s in range(0, n, batch):
            cur = min(batch, n - s)
            bsize = min(batch, -(-cur // 256) * 256)
            chunk = frames_u8[s:s + cur]
            if cur < bsize:
                chunk = np.concatenate(
                    [chunk, np.zeros((bsize - cur,) + chunk.shape[1:],
                                     np.uint8)])
            chunk = self._shard_data(chunk)
            fut = self.fused_sweep(chunk)
            pending.append((s, cur, fut))
        return (n, pending)

    def sweep_video(self, frames_u8: np.ndarray,
                    batch: int = 512) -> np.ndarray:
        """frames_u8 (N,H,W,3) -> (N, 21) logits, one concatenated fetch."""
        return self.fetch_many(
            [self.dispatch_video(frames_u8, batch=batch)])[0]


def make_sweep(cfg: Config, variables, mesh=None) -> SweepBase:
    """Sweep executor for the configured model (the reference's inference
    path serves every model; dense-sweep acceleration covers the two
    transformer flagships plus every single-frame RGB zoo model).

    ``mesh``: optional ``jax.sharding.Mesh`` — weights replicate and each
    bucket's payload shards over the 'data' axis (one GSPMD program;
    sharded == single-device tested on a virtual 8-device mesh). Covers
    ``sweep_video`` and the device-audio serving path (whole-video wav
    replicated, per-bucket windows sharded); the opt-in shared-spectrogram
    variant accepts the mesh but runs its audio plumbing replicated."""
    if cfg.model_name == "avformer":
        return AvformerSweep(cfg, variables, mesh=mesh)
    if cfg.model_name == "vformer":
        return VformerSweep(cfg, variables, mesh=mesh)
    if cfg.model_name in SINGLE_FRAME_MODELS and "M" not in cfg.modality:
        return SingleFrameSweep(cfg, variables, mesh=mesh)
    raise NotImplementedError(
        f"no dense-sweep executor for model '{cfg.model_name}'; use "
        "run_inference (clip-batched) instead")
