"""Aff2TestDataset (reference dataloader/testset.py:14-220).

Differences from the train dataset: reads the cropped-ALIGNED stores
(.croped_aligned_jpeg/.croped_aligned_mask equivalents, testset.py:23-31),
loads the test-split pickle, labels are pure sentinels, each sample carries
its ``video_id`` for the submission writer, and the audio wav lookup strips
the _left/_right/_main position suffix (testset.py:166). The reference's
``opt['use_mask']`` KeyError (SURVEY.md §2.4-2) is fixed by deriving from
the modality string.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from ..core.config import Config
from ..ops import audio_host
from .dataset import Aff2CompDataset
from .framestore import FrameStore, open_store

STORE_ALIGNED_IMAGES = "croped_aligned_jpeg"
STORE_ALIGNED_MASKS = "croped_aligned_mask"


def strip_position(video_id: str) -> str:
    """_left/_right/_main suffix -> base video name (testset.py:166,
    dataloader/utils.py:109-118)."""
    for suf in ("_left", "_right", "_main"):
        if video_id.endswith(suf):
            return video_id[: -len(suf)]
    return video_id


class Aff2TestDataset(Aff2CompDataset):
    def __init__(self, cfg: Config, audio_dir: str | None = None):
        # reuse the parent's audio/clip machinery, then swap stores + split
        super().__init__(cfg)
        self.audio_dir = audio_dir or cfg.root
        label_dir = cfg.lmdb_label_dir
        aligned_img = open_store(os.path.join(label_dir, STORE_ALIGNED_IMAGES))
        aligned_mask = open_store(os.path.join(label_dir, STORE_ALIGNED_MASKS))
        if aligned_img is not None:
            self.env_image = aligned_img
            self.env_mask = aligned_mask
            # rebind the native reader to the aligned stores
            self.native_image = self.native_mask = None
            try:
                from .native import NativeFrameStore, available
                if available():
                    self.native_image = NativeFrameStore(
                        os.path.join(label_dir, STORE_ALIGNED_IMAGES),
                        n_threads=cfg.host_threads)
                    if aligned_mask is not None:
                        self.native_mask = NativeFrameStore(
                            os.path.join(label_dir, STORE_ALIGNED_MASKS),
                            n_threads=cfg.host_threads)
            except Exception:
                pass

        self.use_mask = "M" in cfg.modality  # §2.4-2 fix

    def _load_split(self) -> None:
        """Prefer split_dict_test_{task}.pkl: a submission box holding only
        aligned stores + the test pickle (the reference testset contract,
        testset.py:64-68) must construct without building/reading the
        train split. Falls back to the parent bootstrap (whose meta.json
        splits also carry test masks — the synthetic-fixture path)."""
        cfg = self.cfg
        test_cache = os.path.join(cfg.cache_dir,
                                  f"split_dict_test_{self.task}.pkl")
        if not os.path.isfile(test_cache):
            super()._load_split()
            return
        with open(test_cache, "rb") as f:
            split = pickle.load(f)
        self.time_stamps = split["timestamp"]
        self.image_path = list(split["image_path"])
        self.video_db_nr = np.asarray(split["video_db_nr"])
        self.test_ids = np.asarray(split["test"])
        self.train_ids = np.zeros_like(self.test_ids)
        self.val_ids = np.zeros_like(self.test_ids)

    def get_audio_feature(self, video_id: str, index: int):
        audio_file = os.path.join(self.audio_dir,
                                  strip_position(video_id) + ".wav")
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

    def __getitem__(self, index: int) -> dict:
        data = super().__getitem__(index)
        data["video_id"] = os.path.dirname(self.image_path[index])
        return data
