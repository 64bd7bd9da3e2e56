"""Evaluation metrics: accumulate on host, reduce at epoch end.

Numerically identical to the reference metric suite (metrics/accf1.py,
metrics/cccmetric.py): EX macro-F1+accuracy with ignore 7, AU per-column
binary F1 averaged over the 12 AUs with the acc denominator being the total
labeled-cell count, and biased-std CCC with the post-mask length in the
denominator. Composite challenge scores (train.py:162-164) are in
``composite_scores``.

Device logits land here as numpy after a single D2H copy per eval step; the
accumulators are O(1) memory for CCC/acc and O(n) only where sklearn's exact
F1 tie-breaking requires the raw columns.
"""
from __future__ import annotations

import numpy as np
from sklearn.metrics import accuracy_score, f1_score


def acc_f1_score(y_true, y_pred, ignore_index=None, normalize=False,
                 average="macro", **kwargs):
    """Multi-class f1 + accuracy over non-ignored labels
    (reference accf1.py:5-17)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if ignore_index is not None:
        keep = y_true != ignore_index
    else:
        keep = np.ones_like(y_true, dtype=bool)
    y_true = y_true[keep]
    y_pred = y_pred[keep]
    f1 = f1_score(y_true=y_true, y_pred=y_pred, average=average, **kwargs)
    acc = accuracy_score(y_true=y_true, y_pred=y_pred, normalize=normalize)
    return acc, f1


class AccF1Metric:
    """EX metric (reference accf1.py:20-42)."""

    def __init__(self, ignore_index, average="macro"):
        self.ignore_index = ignore_index
        self.average = average
        self.clear()

    def update(self, y_pred, y_true):
        self.y_pred.append(np.asarray(y_pred).reshape(-1))
        self.y_true.append(np.asarray(y_true).reshape(-1))

    def clear(self):
        self.y_pred, self.y_true = [], []

    def get(self):
        y_true = np.concatenate(self.y_true)
        y_pred = np.concatenate(self.y_pred)
        return acc_f1_score(y_true=y_true, y_pred=y_pred,
                            average=self.average, normalize=True,
                            ignore_index=self.ignore_index)


class MultiLabelAccF1:
    """AU metric (reference accf1.py:45-77): per-AU binary F1 averaged;
    acc = sum of per-column correct counts / total labeled cells."""

    def __init__(self, ignore_index=None, average="binary"):
        self.ignore_index = ignore_index
        self.average = average
        self.clear()

    def update(self, y_pred, y_true):
        self.y_pred.append(np.asarray(y_pred))
        self.y_true.append(np.asarray(y_true))

    def clear(self):
        self.y_pred, self.y_true = [], []

    def get(self):
        y_true = np.vstack(self.y_true)
        y_pred = np.vstack(self.y_pred)
        labeled = np.sum(y_true != self.ignore_index)
        acc = 0.0
        f1s = []
        for i in range(y_pred.shape[1]):
            acc_i, f1_i = acc_f1_score(
                y_true=y_true[:, i], y_pred=y_pred[:, i],
                average=self.average, normalize=False,
                ignore_index=self.ignore_index)
            acc += acc_i
            f1s.append(f1_i)
        acc = acc / labeled if labeled else 0.0
        return acc, float(np.mean(f1s))


def ccc(y_true, y_pred, ignore=-5.0):
    """Lin's CCC with biased std and post-mask batch size
    (reference cccmetric.py:4-34)."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    keep = y_true != ignore
    y_true = y_true[keep]
    y_pred = y_pred[keep]
    if len(y_true) <= 1:
        return 0.0
    n = len(y_pred)
    x_m, y_m = np.mean(y_pred), np.mean(y_true)
    x_std, y_std = np.std(y_true), np.std(y_pred)   # biased, as reference
    s_xy = np.sum((y_pred - x_m) * (y_true - y_m))
    denom = x_std ** 2 + y_std ** 2 + (x_m - y_m) ** 2 + 1e-8
    return float(2 * s_xy / (denom * n))


def cccva(y_true, y_pred, ignore=-5.0):
    """(N,2) V/A CCC pair + mean (reference cccmetric.py:37-51)."""
    ccc_v = ccc(y_true[:, 0], y_pred[:, 0], ignore)
    ccc_a = ccc(y_true[:, 1], y_pred[:, 1], ignore)
    return ccc_v, ccc_a, (ccc_v + ccc_a) / 2


class CCCMetric:
    """VA metric accumulator (reference cccmetric.py:72-89)."""

    def __init__(self, ignore_index=-5.0):
        self.ignore = ignore_index
        self.clear()

    def update(self, y_pred, y_true):
        self.y_pred.append(np.asarray(y_pred))
        self.y_true.append(np.asarray(y_true))

    def clear(self):
        self.y_pred, self.y_true = [], []

    def get(self):
        y_true = np.vstack(self.y_true)
        y_pred = np.vstack(self.y_pred)
        return cccva(y_true, y_pred, ignore=self.ignore)


def composite_scores(metric_ex: AccF1Metric, metric_au: MultiLabelAccF1,
                     metric_va: CCCMetric) -> dict:
    """Challenge composite scores (reference train.py:160-164)."""
    acc_ex, f1_ex = metric_ex.get()
    acc_au, f1_au = metric_au.get()
    ccc_v, ccc_a, ccc_m = metric_va.get()
    return {
        "EX": {"acc": acc_ex, "f1": f1_ex,
               "score": 0.67 * f1_ex + 0.33 * acc_ex},
        "AU": {"acc": acc_au, "f1": f1_au,
               "score": 0.5 * f1_au + 0.5 * acc_au},
        "VA": {"ccc_v": ccc_v, "ccc_a": ccc_a, "score": ccc_m},
    }
