"""Aff2CompDataset: the training/val dataset
(reference dataloader/aff2compdataset.py:16-292).

Per sample: a 16-frame dilated uint8 face clip ending at the labeled frame,
the AU/EX/VA labels of that frame (sentinels -1/-1/-5.0 when missing), and —
when 'A' is in the modality — the 10 s log-mel window and raw audio.

TPU-first deltas from the reference:
  * clips stay uint8 (T, H, W, C) on host — /255 + Kinetics normalize fuses
    on device (ops/preprocess.py) so the PCIe/ICI transfer is 4x smaller;
  * the five LMDB envs become FrameStores (data/framestore.py) with the same
    ``video/frame.jpg`` key schema and graceful-missing behavior;
  * audio features are computed by the strict-parity numpy pipeline
    (ops/audio_host.py), or the raw window is shipped for the fused
    on-device frontend (``audio_on_device=True``).
"""
from __future__ import annotations

import os
import pickle

import cv2
import numpy as np

from ..core.config import Config
from ..ops import audio_host
from . import transforms
from .framestore import FrameStore, open_store
from .split import create_dataset_split

STORE_IMAGES = "croped_jpeg"
STORE_MASKS = "croped_mask"
STORE_AU = "label_au"
STORE_EX = "label_expr"
STORE_VA = "label_va"


def decode_jpeg(buf: bytes) -> np.ndarray | None:
    """JPEG bytes -> RGB uint8 (aff2compdataset.py:177-180)."""
    arr = np.frombuffer(buf, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if img is None:
        return None
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def decode_gray(buf: bytes) -> np.ndarray | None:
    arr = np.frombuffer(buf, np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_GRAYSCALE)


class Aff2CompDataset:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.task = cfg.task
        assert self.task in ("ALL", "EX", "AU", "VA")
        self.video_dir = cfg.root
        self.extracted_dir = os.path.join(cfg.root, "extracted")
        label_dir = cfg.lmdb_label_dir

        # every store is optional (reference wraps the env opens in
        # try/except, aff2compdataset.py:25-36); missing label stores
        # degrade to sentinel labels — the test-only-box case
        self.env_image = open_store(os.path.join(label_dir, STORE_IMAGES))
        self.env_mask = open_store(os.path.join(label_dir, STORE_MASKS))
        self.env_au = open_store(os.path.join(label_dir, STORE_AU))
        self.env_ex = open_store(os.path.join(label_dir, STORE_EX))
        self.env_va = open_store(os.path.join(label_dir, STORE_VA))

        # native C++ reader (mmap + off-GIL batched libjpeg decode); pure
        # Python path is the fallback (data/native)
        self.native_image = self.native_mask = None
        try:
            from .native import NativeFrameStore, available
            # strict_parity pins decode to cv2 (bundled libjpeg-turbo);
            # system libjpeg may differ by +-1 LSB in the IDCT
            if available() and not cfg.strict_parity:
                if self.env_image is not None:
                    self.native_image = NativeFrameStore(
                        os.path.join(label_dir, STORE_IMAGES),
                        n_threads=cfg.host_threads)
                if self.env_mask is not None:
                    self.native_mask = NativeFrameStore(
                        os.path.join(label_dir, STORE_MASKS),
                        n_threads=cfg.host_threads)
        except Exception:
            pass

        v2o = os.path.join(cfg.root, "video2orignal.pkl")
        if os.path.isfile(v2o):
            with open(v2o, "rb") as f:
                self.video2orignal = pickle.load(f)
        else:
            self.video2orignal = {}

        self.clip_len = cfg.n_frames
        self.input_size = (cfg.image_size, cfg.image_size)
        self.dilation = cfg.dilation
        self.label_frame = self.clip_len * self.dilation

        self.sample_rate = cfg.sample_rate
        self.sample_len_secs = cfg.audio_len_secs
        self.sample_len_frames = cfg.sample_len_frames
        self.audio_shift_samples = cfg.audio_shift_samples
        self.n_mels = cfg.n_mels
        self.audio_on_device = bool(getattr(cfg, "device_audio", False))
        # set via set_audio_arena(): samples then carry int32 window
        # (offset, n_valid) into the HBM-resident wav arena instead of the
        # raw (1, 441000) float32 window (data/wav_arena.py)
        self.wav_arena = None

        self._load_split()

        self.use_mask = "M" in cfg.modality
        self.use_audio = "A" in cfg.modality.split(";")
        self.modes = ["clip", "audio_features"]
        self.aug = False
        # frame-dedup batches: __getitem__ returns the window's store keys
        # instead of the assembled clip; DataLoader then calls
        # assemble_batch() once per batch (set_frame_dedup)
        self.frame_dedup = False
        # per-epoch augmentation seed: per-sample PRNGs keep augmentation
        # deterministic under the threaded loader (the reference is
        # single-threaded and uses global `random`)
        self.aug_seed = 0

        # decoded-frame LRU: overlapping dilated windows re-read each frame
        # up to clip_len times during sequential sweeps (SURVEY.md §7.3-6);
        # caching decoded RGB frames bounds JPEG decode to ~1x per frame
        import threading
        from collections import OrderedDict
        self._decode_cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._cache_lock = threading.Lock()
        self.decode_cache_size = 4096

    def _load_split(self) -> None:
        """Load (or build) the train/val split arrays. Aff2TestDataset
        overrides this to read the test pickle directly, so a test-only
        box never triggers the train-split bootstrap (reference
        testset.py:64-68 contract)."""
        cfg = self.cfg
        cache = os.path.join(cfg.cache_dir, f"split_dict_{self.task}.pkl")
        if not os.path.isfile(cache):
            split = create_dataset_split(cfg.root, save_dir=cfg.cache_dir)
            split = split[self.task]
        else:
            with open(cache, "rb") as f:
                split = pickle.load(f)
        self.time_stamps = split["timestamp"]
        self.image_path = list(split["image_path"])
        self.train_ids = np.asarray(split["train"])
        self.val_ids = np.asarray(split["val"])
        self.test_ids = np.asarray(split.get("test",
                                             np.zeros_like(self.train_ids)))
        self.video_db_nr = np.asarray(split["video_db_nr"])

    # -- reference setters (aff2compdataset.py:104-112) ----------------------
    def set_clip_len(self, clip_len):
        assert clip_len % 2 == 0
        self.clip_len = clip_len
        self.label_frame = self.clip_len * self.dilation

    def set_modes(self, modes):
        self.modes = list(modes)

    def set_aug(self, aug: bool):
        self.aug = aug

    def set_frame_dedup(self, on: bool):
        """Unique-frame batch mode: samples carry ``clip_keys`` and the
        loader assembles ``frames`` (U_pad, H, W, C) + ``clip_idx`` (B, T)
        per batch (assemble_batch); the device expands windows with one
        gather (parallel/step.py::make_clip_expander). Overlapping dilated
        windows (consecutive indices share clip_len-1 of clip_len frames)
        then cost ~1 JPEG decode and ~1 frame of H2D each instead of
        clip_len of both. Host augmentation is incompatible (it is
        per-sample, pre-dedup): callers gate this on cfg.device_augment."""
        self.frame_dedup = bool(on)

    # -- store access ---------------------------------------------------------
    def _store_key(self, video_frame: str) -> str:
        video_name = os.path.dirname(video_frame)
        frame_name = os.path.basename(video_frame)
        video_name = self.video2orignal.get(video_name, video_name)
        return video_name + "/" + frame_name

    def get_image(self, video_frame: str) -> np.ndarray | None:
        if self.env_image is None:
            p = os.path.join(self.extracted_dir, video_frame)
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB) if img is not None else None
        buf = self.env_image.get(self._store_key(video_frame))
        return decode_jpeg(buf) if buf is not None else None

    def get_mask(self, video_frame: str) -> np.ndarray | None:
        if self.env_mask is None:
            return None
        buf = self.env_mask.get(self._store_key(video_frame))
        return decode_gray(buf) if buf is not None else None

    def get_label(self, video_frame: str, task: str) -> np.ndarray:
        """Sentinels on miss: AU -1x12 int8, EX -1x1 int8, VA -5.0x2 f32
        (aff2compdataset.py:249-289)."""
        key = self._store_key(video_frame)
        if task == "au":
            buf = self.env_au.get(key) if self.env_au is not None else None
            return (np.frombuffer(buf, np.int8).copy() if buf is not None
                    else -1 * np.ones(12, np.int8))
        if task == "ex":
            buf = self.env_ex.get(key) if self.env_ex is not None else None
            return (np.frombuffer(buf, np.int8).copy() if buf is not None
                    else -1 * np.ones(1, np.int8))
        if task == "va":
            buf = self.env_va.get(key) if self.env_va is not None else None
            return (np.frombuffer(buf, np.float32).copy() if buf is not None
                    else -5.0 * np.ones(2, np.float32))
        raise ValueError(task)

    # -- clip assembly (aff2compdataset.py:114-175) ---------------------------
    def _clip_keys(self, index: int) -> list[str | None]:
        """Store keys of the dilated window ending at ``index``; None where
        the frame stays black (out of range / different video)."""
        video_db_nr = self.video_db_nr[index]
        lo = index - self.label_frame + self.dilation
        hi = index - self.label_frame + self.dilation * (self.clip_len + 1)
        keys: list[str | None] = []
        for all_i in range(lo, hi, self.dilation):
            if (all_i < 0 or all_i >= len(self)
                    or self.video_db_nr[all_i] != video_db_nr):
                keys.append(None)
            else:
                keys.append(self._store_key(self.image_path[all_i]))
        return keys

    def _cache_get(self, key: str) -> np.ndarray | None:
        with self._cache_lock:
            c = self._decode_cache
            frame = c.get(key)
            if frame is not None:
                c.move_to_end(key)
            return frame

    def _cache_put(self, key: str, frame: np.ndarray) -> None:
        with self._cache_lock:
            c = self._decode_cache
            c[key] = frame
            if len(c) > self.decode_cache_size:
                c.popitem(last=False)

    def get_clip(self, index: int) -> np.ndarray:
        channels = 4 if self.use_mask else 3
        h, w = self.input_size
        clip = np.zeros((self.clip_len, h, w, channels), np.uint8)
        keys = self._clip_keys(index)

        if self.native_image is not None:
            miss = [k if (k is not None and self._cache_get(k) is None)
                    else None for k in keys]
            if any(m is not None for m in miss):
                frames, ok = self.native_image.decode_batch(miss, h, w, 3)
                for i, (m, good) in enumerate(zip(miss, ok)):
                    if m is not None and good:
                        self._cache_put(m, frames[i])
            for i, k in enumerate(keys):
                if k is None:
                    continue
                cached = self._cache_get(k)
                if cached is not None:
                    clip[i, :, :, 0:3] = cached
            if self.use_mask and self.native_mask is not None:
                # mask decode rides the same LRU as the RGB path (namespaced
                # "m:" keys) so overlapping sweep windows reuse decoded
                # masks; missing keys (None / absent in the store) simply
                # leave the black frame (the C++ reader reports ok=False)
                mmiss = [k if (k is not None
                               and self._cache_get("m:" + k) is None)
                         else None for k in keys]
                if any(m is not None for m in mmiss):
                    masks, mok = self.native_mask.decode_batch(mmiss, h, w, 1)
                    for i, (m, good) in enumerate(zip(mmiss, mok)):
                        if m is not None and good:
                            self._cache_put("m:" + m, masks[i])
                for i, k in enumerate(keys):
                    if k is None:
                        continue
                    cm = self._cache_get("m:" + k)
                    if cm is not None:
                        clip[i, :, :, 3] = cm[:, :, 0]
            return clip

        for clip_i, key in enumerate(keys):
            if key is None:
                continue  # black frame (different video / out of range)
            img = self._get_image_by_key(key)
            if img is not None and img.shape[:2] == self.input_size:
                clip[clip_i, :, :, 0:3] = img
            if self.use_mask:
                m = self._get_mask_by_key(key)
                if m is not None and m.shape[:2] == self.input_size:
                    clip[clip_i, :, :, 3] = m
        return clip

    def _get_image_by_key(self, key: str) -> np.ndarray | None:
        if self.env_image is None:
            p = os.path.join(self.extracted_dir, key)
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            return (cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                    if img is not None else None)
        buf = self.env_image.get(key)
        return decode_jpeg(buf) if buf is not None else None

    def _get_mask_by_key(self, key: str) -> np.ndarray | None:
        if self.env_mask is None:
            return None
        buf = self.env_mask.get(key)
        return decode_gray(buf) if buf is not None else None

    # -- audio (aff2compdataset.py:214-247) -----------------------------------
    def get_audio_feature(self, video_id: str, index: int):
        audio_file = os.path.join(self.video_dir, video_id + ".wav")
        offset, n = audio_host.audio_window_params(
            self.time_stamps[index], self.sample_rate, self.sample_len_frames,
            self.audio_shift_samples)
        try:
            audio, _sr = audio_host.load_wav(audio_file, offset=offset,
                                             num_samples=n)
            if audio.shape[0] > 1:
                audio = audio[:1]
        except (OSError, EOFError, ValueError):
            audio = np.zeros((1, self.sample_len_frames), np.float32)
        if audio.shape[1] == 0:
            audio = np.zeros((1, self.sample_len_frames), np.float32)
        return audio_host.reference_audio_features(
            audio, self.sample_len_secs, self.cfg.window_stride,
            self.sample_len_frames, self.n_mels)

    def get_audio_window(self, video_id: str, index: int
                         ) -> tuple[np.ndarray, int]:
        """Raw audio window for the on-device mel frontend
        (``cfg.device_audio``): (1, sample_len_frames) float32 with the
        true samples LEFT-aligned (zeros after) plus the valid sample
        count. The train/eval step reconstructs the reference's
        right-aligned feature layout on device (parallel/step.prep_batch
        -> ops.audio.reflect_end_patch + audio_frontend(left_aligned)),
        replacing the ~6 ms/clip host STFT the reference pays per sample
        (aff2compdataset.py:227-238)."""
        audio_file = os.path.join(self.video_dir, video_id + ".wav")
        offset, n = audio_host.audio_window_params(
            self.time_stamps[index], self.sample_rate, self.sample_len_frames,
            self.audio_shift_samples)
        try:
            audio, _sr = audio_host.load_wav(audio_file, offset=offset,
                                             num_samples=n)
            if audio.shape[0] > 1:
                audio = audio[:1]
        except (OSError, EOFError, ValueError):
            audio = np.zeros((1, self.sample_len_frames), np.float32)
        if audio.shape[1] == 0:
            audio = np.zeros((1, self.sample_len_frames), np.float32)
        n_valid = audio.shape[1]
        buf = np.zeros((1, self.sample_len_frames), np.float32)
        buf[:, :n_valid] = audio
        return buf, n_valid

    def set_audio_arena(self, arena) -> None:
        """Switch device-audio samples to arena offsets (data/wav_arena.py):
        ``audio_ofs``/``audio_len`` int32 scalars instead of the raw
        (1, sample_len) float32 window — no per-sample wav read, ~1.76 MB
        less H2D per clip. Pass None to revert to window shipping."""
        self.wav_arena = arena

    # -- frame-dedup batch assembly -------------------------------------------
    def assemble_batch(self, samples: list[dict]) -> dict:
        """Batch-level collate for frame-dedup mode: dedup the B*T window
        keys into a unique-frame pool and return

          frames   (U_pad, H, W, C) uint8 — slot 0 reserved all-black
                   (the out-of-range / cross-video sentinel frame);
                   U_pad rounds up to 64 so the device-side expander jit
                   compiles a handful of shape buckets, not one per batch
          clip_idx (B, T) int32 — window -> pool slots; 0 where the dense
                   path would leave the frame black

        Gathering frames[clip_idx] reproduces get_clip() per sample
        bitwise (tests/test_data.py). Decode goes through the shared LRU
        (runs sampled adjacently share boundary frames) with one native
        batched decode for the misses."""
        from .samplers import collate
        b_sz, t_len = len(samples), self.clip_len
        h, w = self.input_size
        channels = 4 if self.use_mask else 3
        key_slot: dict[str, int] = {}
        uniq: list[str] = []
        clip_idx = np.zeros((b_sz, t_len), np.int32)
        for b, s in enumerate(samples):
            for t, k in enumerate(s.pop("clip_keys")):
                if k is None:
                    continue
                slot = key_slot.get(k)
                if slot is None:
                    uniq.append(k)
                    slot = len(uniq)  # slot 0 stays black
                    key_slot[k] = slot
                clip_idx[b, t] = slot
        u_pad = max(64, -(-(len(uniq) + 1) // 64) * 64)
        frames = np.zeros((u_pad, h, w, channels), np.uint8)
        self._fill_rgb(uniq, frames)
        if self.use_mask:
            self._fill_mask(uniq, frames)
        out = collate(samples)
        out["frames"] = frames
        out["clip_idx"] = clip_idx
        return out

    def _fill_rgb(self, uniq: list[str], frames: np.ndarray) -> None:
        miss: list[tuple[int, str]] = []
        for i, k in enumerate(uniq):
            cached = self._cache_get(k)
            if cached is not None:
                frames[i + 1, :, :, 0:3] = cached
            else:
                miss.append((i, k))
        if not miss:
            return
        h, w = self.input_size
        if self.native_image is not None:
            dec, ok = self.native_image.decode_batch(
                [k for _, k in miss], h, w, 3)
            for j, (i, k) in enumerate(miss):
                if ok[j]:
                    frames[i + 1, :, :, 0:3] = dec[j]
                    self._cache_put(k, dec[j])
        else:
            for i, k in miss:
                img = self._get_image_by_key(k)
                if img is not None and img.shape[:2] == self.input_size:
                    frames[i + 1, :, :, 0:3] = img
                    self._cache_put(k, img)

    def _fill_mask(self, uniq: list[str], frames: np.ndarray) -> None:
        miss: list[tuple[int, str]] = []
        for i, k in enumerate(uniq):
            cm = self._cache_get("m:" + k)
            if cm is not None:
                frames[i + 1, :, :, 3] = cm[:, :, 0] if cm.ndim == 3 else cm
            else:
                miss.append((i, k))
        if not miss:
            return
        h, w = self.input_size
        if self.native_mask is not None:
            dec, ok = self.native_mask.decode_batch(
                [k for _, k in miss], h, w, 1)
            for j, (i, k) in enumerate(miss):
                if ok[j]:
                    frames[i + 1, :, :, 3] = dec[j][:, :, 0]
                    self._cache_put("m:" + k, dec[j])
        else:
            for i, k in miss:
                m = self._get_mask_by_key(k)
                if m is not None and m.shape[:2] == self.input_size:
                    frames[i + 1, :, :, 3] = m
                    self._cache_put("m:" + k, m)

    def __getitem__(self, index: int) -> dict:
        data = {"Index": index}
        video_id = os.path.dirname(self.image_path[index])
        current = self.image_path[index]

        if self.frame_dedup:
            data["clip_keys"] = self._clip_keys(index)
        else:
            clip = self.get_clip(index)
        data["AU"] = self.get_label(current, "au")
        data["EX"] = self.get_label(current, "ex")
        data["VA"] = self.get_label(current, "va")

        if self.aug and not self.frame_dedup:
            import random as _random
            rng = _random.Random((self.aug_seed << 32) ^ index)
            # ImageNetPolicy + flip regardless of the mask channel: the
            # reference applies the full pipeline to V;M clips too —
            # SubPolicy slices clip[..., 0:3] so the mask passes through
            # untouched while the flip moves both (aff2compdataset.py:69-77,
            # autoaugment.py:104-112); imagenet_policy mirrors that slice.
            clip = transforms.train_augment(clip, rng)
        if not self.frame_dedup:
            data["clip"] = clip  # uint8 (T,H,W,C); device normalizes

        if self.use_audio and "audio_features" in self.modes:
            if self.audio_on_device and self.wav_arena is not None:
                ofs, n_valid = self.wav_arena.window(
                    video_id, self.time_stamps[index], self.sample_rate,
                    self.audio_shift_samples)
                data["audio_ofs"] = np.int32(ofs)
                data["audio_len"] = np.int32(n_valid)
            elif self.audio_on_device:
                audio, n_valid = self.get_audio_window(video_id, index)
                data["audio"] = audio
                data["audio_len"] = np.int32(n_valid)
            else:
                feats, audio = self.get_audio_feature(video_id, index)
                data["audio_features"] = feats
                data["audio"] = audio
        return data

    def __len__(self):
        return len(self.image_path)
