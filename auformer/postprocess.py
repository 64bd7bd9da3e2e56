"""Submission postprocess (reference postprocess/postprocess.py).

Predictions exist only for frames with a detected/cropped face; the
challenge requires one row per original video frame. ``nearest_interp``
expands the sparse per-detected-frame rows to the full frame count by
repeating the nearest previous detected frame (postprocess.py:29-48), and
``expand_predictions`` rewrites the per-task txts (postprocess.py:51-89) —
with explicit paths instead of the reference's hardcoded Windows drives.
"""
from __future__ import annotations

import glob
import os

from .data.split import natsort_key
from .data.testset import strip_position


def nearest_interp(source_list: list[int], target_len: int) -> list[int]:
    """Map each of target_len frames to an index into source_list
    (nearest previous; reference postprocess.py:29-48)."""
    source_list = sorted(source_list)
    n = len(source_list)
    if target_len <= n:
        return list(range(n))
    # run-length expansion: frame gaps repeat the previous detected index,
    # the tail repeats the last index
    out: list[int] = []
    index = 0
    while index + 1 < n and len(out) < target_len:
        out.extend([index] * (source_list[index + 1] - source_list[index]))
        index += 1
    out = out[:target_len]
    out.extend([index] * (target_len - len(out)))
    return out


def video_frame_counts(video_dir: str) -> dict[str, int]:
    """Build the per-video frame-count table from meta.json side files or
    the videos themselves (the reference pickles n_video_frames.pkl,
    postprocess.py:17-28)."""
    from .data.utils import find_all_video_files
    from .data.video import Video

    counts: dict[str, int] = {}
    for vf in find_all_video_files(video_dir):
        v = Video(vf, write=True)
        counts[os.path.splitext(os.path.basename(vf))[0]] = v.num_frames
    return counts


def expand_predictions(prediction_path: str, frames_root: str,
                       video_frame_counts: dict[str, int],
                       out_dir: str = "prediction_new",
                       tasks=("AU", "EXPR", "VA")) -> None:
    """Rewrite sparse per-video prediction txts to dense full-length files.

    prediction_path/<task>/<video>.txt   sparse rows (header + one/frame)
    frames_root/<video>/                 cropped-aligned jpgs (detected ids)
    video_frame_counts                   original per-video frame totals
    """
    for task in tasks:
        files = glob.glob(os.path.join(prediction_path, task, "*.txt"))
        for pf in files:
            aligned_name = os.path.splitext(os.path.basename(pf))[0]
            base = strip_position(aligned_name)
            n_frame = video_frame_counts[base]
            frame_dir = os.path.join(frames_root, aligned_name)
            frames = sorted(
                (f for f in os.listdir(frame_dir) if f.endswith(".jpg")),
                key=natsort_key)
            frames = [int(f.split(".")[0]) for f in frames]
            with open(pf) as f:
                pred = f.readlines()
            assert len(frames) == len(pred) - 1, (pf, len(frames), len(pred))
            os.makedirs(os.path.join(out_dir, task), exist_ok=True)
            indices = nearest_interp(frames, n_frame)
            with open(os.path.join(out_dir, task,
                                   os.path.basename(pf)), "w") as nf:
                nf.write(pred[0])
                for i in range(n_frame):
                    nf.write(pred[indices[i] + 1])


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="expand sparse predictions to full video length")
    p.add_argument("--predictions", required=True,
                   help="dir with <task>/<video>.txt sparse files")
    p.add_argument("--frames_root", required=True,
                   help="cropped-aligned frame dirs (detected frame ids)")
    p.add_argument("--video_dir", required=True,
                   help="original videos (frame-count source)")
    p.add_argument("--out_dir", default="prediction_new")
    p.add_argument("--tasks", nargs="+", default=["AU", "EXPR", "VA"])
    args = p.parse_args(argv)
    counts = video_frame_counts(args.video_dir)
    expand_predictions(args.predictions, args.frames_root, counts,
                       args.out_dir, tuple(args.tasks))


if __name__ == "__main__":
    main()
