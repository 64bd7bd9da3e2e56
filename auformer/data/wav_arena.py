"""HBM-resident wav arena for the on-device mel frontend.

With ``cfg.device_audio`` every loader sample ships its raw
(1, 441000) float32 audio window — 1.76 MB/clip, ~900 MB per
K=8 x B=64 multi-step dispatch through the host-device link, and a
per-sample wav file read on the host (dataset.py::get_audio_window;
reference aff2compdataset.py:218-247 pays the same read plus a ~6 ms
host STFT). Overlapping windows of the SAME video duplicate 99.9% of
those bytes.

The arena removes the duplication at the source: each video's waveform
is uploaded ONCE per run into a packed 1-D float32 device buffer, and
the batch carries two int32 scalars per clip — the window's global
arena offset and its valid sample count. The train/eval step gathers
the windows with a vmapped ``dynamic_slice`` and zero-masks the tail
(:func:`auformer.parallel.step.gather_arena_windows`), reproducing the
host-built left-aligned window buffer bitwise.

Capacity-gated: if the dataset's total audio exceeds ``cap_mb`` the
builder returns None and the caller keeps shipping windows (a full
AffWild2 train set is ~10 GB of f32 audio — more than a v5e chip's
spare HBM next to the model; the cap keeps the arena an automatic win
where it fits and a no-op where it doesn't).
"""
from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

import numpy as np

from ..ops import audio_host


@dataclass
class WavArena:
    """Packed per-video waveforms + lookup table.

    ``table`` maps video_id -> (base, n_samples); ``zero_ofs`` points at
    a guaranteed-zero region of >= sample_len samples (the fallback
    window for missing/empty/out-of-range audio, matching the zero
    buffer the host path substitutes)."""
    arena: np.ndarray                      # (L,) float32, packed
    table: dict = field(default_factory=dict)
    zero_ofs: int = 0
    sample_len: int = 441000

    @property
    def nbytes(self) -> int:
        return self.arena.nbytes

    def window(self, video_id: str, timestamp_ms: float,
               sample_rate: int, audio_shift_samples: int
               ) -> tuple[int, int]:
        """(global_ofs, n_valid) of the clip window ending at a frame
        timestamp — the arena-mode counterpart of
        ``Aff2CompDataset.get_audio_window``. Falls back to the zero
        region exactly where the host path substitutes a zero buffer
        (missing wav, empty read)."""
        entry = self.table.get(video_id)
        if entry is None:
            return self.zero_ofs, self.sample_len
        base, wav_n = entry
        offset, n = audio_host.audio_window_params(
            timestamp_ms, sample_rate, self.sample_len,
            audio_shift_samples)
        n_valid = min(n, wav_n - min(offset, wav_n))
        if n_valid <= 0:
            # load_wav returns an empty read -> host substitutes a full
            # zero window with n_valid = sample_len
            return self.zero_ofs, self.sample_len
        return base + offset, int(n_valid)


def build_wav_arena(dataset, cap_mb: float = 4096.0,
                    sample_len: int | None = None) -> WavArena | None:
    """Pack every dataset video's waveform (channel 0) into one float32
    buffer. Returns None — caller keeps the window-shipping path — when
    the total exceeds ``cap_mb`` or the dataset has no readable audio.

    Layout: [video wavs, back to back | zeros(sample_len)]. No inter-video
    padding is needed: the device gather zero-masks samples past each
    window's valid count, so a slice that runs over a region boundary
    never contributes neighbour samples.
    """
    sample_len = sample_len or getattr(dataset, "sample_len_frames", 441000)
    video_dir = getattr(dataset, "video_dir", None)
    if video_dir is None:
        return None
    paths = getattr(dataset, "image_path", [])
    videos: list[str] = []
    seen = set()
    for p in paths:
        vid = os.path.dirname(p)
        if vid not in seen:
            seen.add(vid)
            videos.append(vid)

    cap = int(cap_mb * (1 << 20) // 4)
    lengths: dict[str, int] = {}
    total = 0
    for vid in videos:
        f = os.path.join(video_dir, vid + ".wav")
        try:
            import wave
            with wave.open(f, "rb") as w:
                n = w.getnframes()
        except (OSError, EOFError, ValueError):
            continue
        lengths[vid] = n
        total += n
    if not lengths:
        return None
    if total + sample_len > cap:
        logging.info(
            f"wav arena: {total * 4 / 1e6:.0f} MB of audio exceeds the "
            f"{cap_mb:.0f} MB cap — shipping per-clip windows instead")
        return None

    arena = np.zeros(total + sample_len, np.float32)
    table: dict[str, tuple[int, int]] = {}
    base = 0
    for vid in videos:
        n = lengths.get(vid)
        if n is None:
            continue
        f = os.path.join(video_dir, vid + ".wav")
        try:
            wav, _sr = audio_host.load_wav(f)
        except (OSError, EOFError, ValueError):
            continue
        w0 = wav[0] if wav.shape[0] else np.zeros(0, np.float32)
        n = w0.shape[0]
        arena[base:base + n] = w0
        table[vid] = (base, n)
        base += n
    logging.info(f"wav arena: {len(table)} videos, "
                 f"{arena.nbytes / 1e6:.0f} MB resident")
    return WavArena(arena=arena[:base + sample_len], table=table,
                    zero_ofs=base, sample_len=sample_len)
