"""Offline ingest tooling (L0, reference 112_align/create_lmdb.py +
data_split.py's mkvtoolnix timestamp extraction).

``create_image_store`` packs per-video cropped-aligned jpg directories into
one FrameStore with the ``"<video>/<frame>.jpg"`` key schema
(create_lmdb.py:20-24); ``extract_timestamps`` writes the timestamps_v2
side file the split builder reads — via cv2 frame clocks instead of the
reference's mkvmerge/mkvextract subprocess pair (data_split.py:39-45).
``write_label_store`` packs per-frame AU/EX/VA annotation arrays.
"""
from __future__ import annotations

import os
import pickle
from typing import Mapping

import cv2
import numpy as np

from .framestore import FrameStoreWriter
from .split import natsort_key
from .video import Video


def iter_image_files(root_dir: str):
    """Yield (key, path) for every <video>/<frame>.jpg, naturally sorted
    (create_lmdb.py:11-31)."""
    for video in sorted(os.listdir(root_dir), key=natsort_key):
        vdir = os.path.join(root_dir, video)
        if not os.path.isdir(vdir):
            continue
        for fname in sorted(os.listdir(vdir), key=natsort_key):
            if fname.endswith((".jpg", ".jpeg", ".png")):
                yield f"{video}/{fname}", os.path.join(vdir, fname)


def create_image_store(root_dir: str, store_path: str,
                       reencode_png: bool = True) -> list[str]:
    """Pack a cropped-aligned image tree into a FrameStore; returns the key
    list (the reference also pickles a _keys_cache.p — kept for parity,
    create_lmdb.py:47)."""
    keys = []
    with FrameStoreWriter(store_path) as w:
        for key, path in iter_image_files(root_dir):
            if path.endswith(".png") and reencode_png:
                img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
                ok, enc = cv2.imencode(".jpg", img,
                                       [cv2.IMWRITE_JPEG_QUALITY, 95])
                data = enc.tobytes()
            else:
                with open(path, "rb") as f:
                    data = f.read()
            w.put(key, data)
            keys.append(key)
    with open(store_path + "_keys_cache.p", "wb") as f:
        pickle.dump(keys, f)
    return keys


def extract_timestamps(video_path: str, out_path: str | None = None) -> str:
    """Write <video>_video_ts.txt in timestamps_v2 format from cv2 frame
    clocks (replaces mkvmerge|mkvextract, data_split.py:39-45)."""
    out_path = out_path or os.path.splitext(video_path)[0] + "_video_ts.txt"
    cap = cv2.VideoCapture(video_path)
    stamps = []
    while cap.grab():
        stamps.append(cap.get(cv2.CAP_PROP_POS_MSEC))
    cap.release()
    if stamps and stamps[0] > 0:
        pass  # some containers report the first pts > 0; keep as-is
    with open(out_path, "w") as f:
        f.write("# timestamp format v2\n")
        for s in stamps:
            f.write(f"{s:.6f}\n")
    return out_path


def write_label_store(store_path: str,
                      labels: Mapping[str, np.ndarray]) -> None:
    """labels: key "<video>/<frame>.jpg" -> int8[12] (AU) / int8[1] (EX) /
    float32[2] (VA); stored raw, matching the dataset's frombuffer reads
    (aff2compdataset.py:264-287)."""
    with FrameStoreWriter(store_path) as w:
        for key, arr in labels.items():
            w.put(key, np.ascontiguousarray(arr).tobytes())


def probe_video_meta(video_path: str) -> dict:
    """Create/refresh <video>meta.json (data_split.py:26-30)."""
    return Video(video_path, write=True).meta
