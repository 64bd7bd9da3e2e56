"""Video file wrapper (reference dataloader/video.py:14-94).

cv2.VideoCapture-backed reader with a ``<video>meta.json`` side cache for
frame count / fps / duration, RGB frame access, and an iterator. Used by
offline ingest (L0) and postprocess frame counting — never in the serving
path.
"""
from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import cv2
import numpy as np


class Video:
    def __init__(self, path: str, write: bool = True):
        self.path = path
        self.filename = os.path.splitext(os.path.basename(path))[0]
        self._cap: Optional[cv2.VideoCapture] = None
        self.meta = self._load_or_probe_meta(write)

    def _meta_path(self) -> str:
        # reference cache name keeps the extension: <video.mp4>meta.json
        # (dataloader/video.py:20), so pre-existing reference caches load
        return self.path + "meta.json"

    def _load_or_probe_meta(self, write: bool) -> dict:
        legacy = os.path.splitext(self.path)[0] + "meta.json"
        for mp in (self._meta_path(), legacy):
            if os.path.isfile(mp):
                with open(mp) as f:
                    return json.load(f)
        cap = self._capture()
        meta = {
            "num_frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            "fps": float(cap.get(cv2.CAP_PROP_FPS)) or 30.0,
            "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        }
        meta["duration"] = (meta["num_frames"] / meta["fps"]
                            if meta["fps"] else 0.0)
        if write:
            with open(mp, "w") as f:
                json.dump(meta, f)
        return meta

    def _capture(self) -> cv2.VideoCapture:
        if self._cap is None:
            self._cap = cv2.VideoCapture(self.path)
        return self._cap

    @property
    def num_frames(self) -> int:
        return self.meta["num_frames"]

    @property
    def fps(self) -> float:
        return self.meta["fps"]

    def read_RGB(self, frame_idx: int | None = None) -> Optional[np.ndarray]:
        cap = self._capture()
        if frame_idx is not None:
            cap.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)
        ok, frame = cap.read()
        if not ok:
            return None
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def count_frames(self) -> int:
        """Exact decode-everything count (slow; metadata counts can lie)."""
        cap = cv2.VideoCapture(self.path)
        n = 0
        while cap.grab():
            n += 1
        cap.release()
        return n

    def frames(self) -> Iterator[np.ndarray]:
        cap = cv2.VideoCapture(self.path)
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        cap.release()

    def release(self) -> None:
        if self._cap is not None:
            self._cap.release()
            self._cap = None
