"""Inference + submission writers (reference test_aff2.py:46-119).

The reference sweeps the test split at batch 1 because its per-video txt
writer switches inline ("takes 5+ hours for test and val on 2080 Ti",
test_aff2.py:82). TPU-first, frames are batched at a static batch size
through one jitted forward and the per-video demux happens on host from the
returned (B, 21) blocks — identical output files, orders of magnitude fewer
device dispatches.
"""
from __future__ import annotations

import os
import pickle

import jax
import numpy as np

from .core.config import Config
from .data import DataLoader, SubsetSequentialSampler
from .data.testset import Aff2TestDataset
from .nn import build_model

AU_HEADER = "AU1,AU2,AU4,AU6,AU7,AU10,AU12,AU15,AU23,AU24,AU25,AU26"
VA_HEADER = "valence,arousal"
EX_HEADER = "Neutral,Anger,Disgust,Fear,Happiness,Sadness,Surprise"


def au_to_str(arr) -> str:
    return ",".join(f"{int(v):d}" for v in arr)


def ex_to_str(v) -> str:
    return f"{int(v):d}"


def va_to_str(v, a) -> str:
    return f"{v:.3f},{a:.3f}"


#: submission dir per task: 'au' matches the reference writer
#: (test_aff2.py:84), 'expr' matches the dir its postprocess task loop
#: consumes for expressions (postprocess/postprocess.py:51, lowercased
#: like the writer's 'au')
_TASK_DIR = {"AU": "au", "EX": "expr", "VA": "va"}


class SubmissionWriter:
    """Per-video txt writers with task headers (test_aff2.py:87-115)."""

    def __init__(self, result_path: str, task: str = "AU"):
        self.dir = os.path.join(result_path, _TASK_DIR[task])
        os.makedirs(self.dir, exist_ok=True)
        self.task = task
        self.header = {"AU": AU_HEADER, "VA": VA_HEADER,
                       "EX": EX_HEADER}[task]
        self._current = None
        self._f = None

    def write(self, video_id: str, line: str) -> None:
        if video_id != self._current:
            if self._f is not None:
                self._f.close()
            self._current = video_id
            self._f = open(os.path.join(self.dir, video_id + ".txt"), "w")
            self._f.write(self.header + "\n")
        self._f.write(line + "\n")

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


class TaskWriters:
    """Every submission writer one inference run can feed.

    The reference ships ex_to_str/va_to_str but its loop writes AU txts
    only (test_aff2.py:34-44,113-115), while its postprocess consumes
    AU/EXPR/VA prediction dirs (postprocess/postprocess.py:51) — the EX/VA
    producers never existed. Here they do: AU rows are written always
    (reference behavior); EX rows (argmax over logits[:, 12:19]) and VA
    rows (tanh(logits[:, 19:21]) at 3 decimals — train.py:136-138
    semantics) are written when ``task`` requests them and the model emits
    the columns (the avformer AU sweep emits 12, so AU only)."""

    def __init__(self, result_path: str, task: str, width: int):
        self.au = SubmissionWriter(result_path, "AU")
        self.ex = SubmissionWriter(result_path, "EX") \
            if task in ("EX", "ALL") and width >= 19 else None
        self.va = SubmissionWriter(result_path, "VA") \
            if task in ("VA", "ALL") and width >= 21 else None

    def write_rows(self, video_ids, logits: np.ndarray) -> None:
        """Append an (N, width) logits block; ``video_ids`` is one id for
        the whole block or a per-row sequence (clip-batched loops)."""
        if isinstance(video_ids, str):
            video_ids = [video_ids] * len(logits)
        round_au = np.round(
            1.0 / (1.0 + np.exp(-logits[:, :12]))).astype(int)
        ex_pred = np.argmax(logits[:, 12:19], axis=1) \
            if self.ex is not None else None
        va_pred = np.tanh(logits[:, 19:21]) if self.va is not None else None
        for i, vid in enumerate(video_ids):
            vid = str(vid)
            self.au.write(vid, au_to_str(round_au[i]))
            if self.ex is not None:
                self.ex.write(vid, ex_to_str(ex_pred[i]))
            if self.va is not None:
                self.va.write(vid, va_to_str(*va_pred[i]))

    def close(self) -> None:
        for w in (self.au, self.ex, self.va):
            if w is not None:
                w.close()


def make_infer_fn(cfg: Config, model):
    from .parallel.step import prep_batch

    device_audio = bool(getattr(cfg, "device_audio", False))
    modes = set(getattr(model, "modes", ()))

    @jax.jit
    def infer(variables, x):
        # prep_batch covers /255+normalize and, under --device_audio, the
        # on-device mel frontend from the loader's raw windows
        xx = prep_batch(x, train=False, device_audio=device_audio)
        if modes:
            xx = {k: v for k, v in xx.items() if k in modes}
        out = model.apply(variables, xx, train=False)
        return out.astype(np.float32)
    return infer


def _testset(cfg: Config, dataset):
    """Build the test dataset, materializing synthetic fixtures first when
    --data_backend synthetic is selected (mirrors train_lib's bootstrap so
    `python test_aff2.py --data_backend synthetic` dry-runs end-to-end
    instead of silently sweeping an empty split)."""
    if dataset is not None:
        return dataset
    if cfg.data_backend == "synthetic":
        from .data.fixtures import ensure_synthetic
        ensure_synthetic(cfg)
    return Aff2TestDataset(cfg)


def run_inference(cfg: Config, variables, result_path: str = "results",
                  dataset: Aff2TestDataset | None = None,
                  batch_size: int | None = None,
                  max_batches: int | None = None) -> np.ndarray:
    """Sweep dataset.test_ids, write per-video AU txts + inference.pkl.

    Returns the (len(dataset), 21) prediction matrix (the reference's
    ``output`` tensor, test_aff2.py:79,117).
    """
    model = build_model(cfg)
    dataset = _testset(cfg, dataset)
    dataset.set_modes(list(model.modes))
    batch_size = batch_size or max(cfg.batch_size, 1)

    ids = np.nonzero(dataset.test_ids)[0]
    loader = DataLoader(dataset, batch_size, SubsetSequentialSampler(ids),
                        num_threads=cfg.host_threads, drop_last=False,
                        prefetch_batches=cfg.prefetch_depth)
    infer = make_infer_fn(cfg, model)

    output = np.zeros((len(dataset), 21), np.float32)
    writers = TaskWriters(result_path, cfg.task, width=21)
    seen = 0
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        want = set(model.modes)
        if getattr(cfg, "device_audio", False):
            # the loader ships raw windows; the jitted infer computes mels
            want |= {"audio", "audio_len"}
        x = {k: batch[k] for k in want if k in batch}
        n = len(batch["Index"])
        if n < batch_size:
            # pad the final partial batch to the static shape (one compiled
            # program for the whole sweep), slice predictions back
            pad = batch_size - n
            x = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                 for k, v in x.items()}
        result = np.asarray(infer(variables, x))[:n]
        idxs = batch["Index"]
        output[idxs, :] = result
        writers.write_rows(list(batch["video_id"]), result)
        seen += len(idxs)
    writers.close()

    os.makedirs(result_path, exist_ok=True)
    with open(os.path.join(result_path, "inference.pkl"), "wb") as f:
        pickle.dump({"predictions": output}, f)
    return output


def run_inference_sweep(cfg: Config, variables,
                        result_path: str = "results",
                        dataset: Aff2TestDataset | None = None,
                        bucket: int | None = None, mesh=None) -> np.ndarray:
    """Dense-sweep inference (auformer/sweep.py): per video, decode every
    test frame once, run the trunk once per frame, and score all windows
    through the temporal/fusion heads — bit-identical logits to
    ``run_inference`` at a fraction of the compute. Supports avformer
    (A/V, 12 AU logits) and vformer (visual-only, all 21 logits —
    test_aff2.py:117-119); other models use ``run_inference``.

    With more than one visible device (or an explicit ``mesh``), the sweep
    runs data-parallel: weights replicate over ``cfg.mesh_shape`` and each
    bucket's frames shard over the 'data' axis (parity tested on a virtual
    8-device mesh, tests/test_sweep_sharded.py).

    Audio features run on DEVICE by default (one wav upload per video,
    per-window gather + mel fused with the sweep —
    sweep.fused_sweep_device_audio; parity-tested against the feature-fed
    sweep). ``--strict_parity`` keeps the reference-exact host audio path
    (per-window ``dataset.get_audio_feature``), which recomputes a full
    host STFT per clip — the left-zero-pad junction of short windows at
    video edges differs immaterially between the two (ops/audio.py).
    """
    from .sweep import make_sweep

    dataset = _testset(cfg, dataset)
    if bucket is None:
        from .serve import default_sweep_bucket
        bucket = default_sweep_bucket()
    if mesh is None and jax.device_count() > 1 and "model" not in cfg.mesh_shape:
        from .core.mesh import make_mesh
        mesh = make_mesh(cfg.mesh_shape)
    sweep = make_sweep(cfg, variables, mesh=mesh)
    h = w = cfg.image_size

    test_idx = np.nonzero(dataset.test_ids)[0]
    output = np.zeros((len(dataset), 21), np.float32)
    writers = TaskWriters(result_path, cfg.task, width=sweep.out_dim)

    if cfg.strict_parity and sweep.needs_audio:
        # reference-exact host audio: per-window host mel features
        for video_nr in np.unique(dataset.video_db_nr[test_idx]):
            vid_idx = test_idx[dataset.video_db_nr[test_idx] == video_nr]
            video_id = os.path.dirname(dataset.image_path[vid_idx[0]])
            from .serve import decode_video_frames
            frames = decode_video_frames(dataset, vid_idx, h, w)
            feats = np.stack([
                dataset.get_audio_feature(video_id, int(i))[0]
                for i in vid_idx]).astype(np.float32)
            logits = sweep.sweep_video(frames, feats, batch=bucket)
            output[vid_idx, :logits.shape[1]] = logits
            writers.write_rows(video_id, logits)
    else:
        from .serve import sweep_stream
        # the process-isolated decode worker pays ~10-30 s startup (child
        # imports + dataset ctor); only worth it past a few thousand clips
        use_worker = None if int(dataset.test_ids.sum()) >= 2000 else False
        for vid_idx, video_id, logits in sweep_stream(
                cfg, variables, dataset=dataset, bucket=bucket,
                sweep=sweep, decode_worker=use_worker):
            output[vid_idx, :logits.shape[1]] = logits
            writers.write_rows(video_id, logits)
    writers.close()

    os.makedirs(result_path, exist_ok=True)
    with open(os.path.join(result_path, "inference.pkl"), "wb") as f:
        pickle.dump({"predictions": output}, f)
    return output
