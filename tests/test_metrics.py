"""Metric parity: reproduce the reference accumulate-then-reduce behavior."""
import numpy as np
import pytest
from sklearn.metrics import accuracy_score, f1_score

from auformer.metrics import (AccF1Metric, CCCMetric, MultiLabelAccF1, ccc,
                              composite_scores)

RS = np.random.RandomState(3)


def test_accf1_ex():
    m = AccF1Metric(ignore_index=7)
    all_t, all_p = [], []
    for _ in range(5):
        t = RS.randint(0, 8, 64)
        p = RS.randint(0, 7, 64)
        m.update(p, t)
        all_t.append(t); all_p.append(p)
    t = np.concatenate(all_t); p = np.concatenate(all_p)
    keep = t != 7
    acc, f1 = m.get()
    assert acc == pytest.approx(accuracy_score(t[keep], p[keep]))
    assert f1 == pytest.approx(f1_score(t[keep], p[keep], average="macro"))


def test_multilabel_au():
    m = MultiLabelAccF1(ignore_index=-1)
    t = RS.randint(0, 2, (128, 12)).astype(float)
    t[RS.rand(128) < 0.3] = -1
    p = RS.randint(0, 2, (128, 12)).astype(float)
    m.update(p, t)
    acc, f1 = m.get()
    # golden: per-column binary f1 averaged; acc = sum correct / labeled
    f1s, correct = [], 0
    for c in range(12):
        keep = t[:, c] != -1
        f1s.append(f1_score(t[keep, c], p[keep, c], average="binary"))
        correct += accuracy_score(t[keep, c], p[keep, c], normalize=False)
    assert f1 == pytest.approx(np.mean(f1s))
    assert acc == pytest.approx(correct / np.sum(t != -1))


def test_ccc_biased_std_and_identity():
    x = RS.randn(100).astype(np.float32)
    assert ccc(x, x) == pytest.approx(1.0, abs=1e-5)
    y = np.concatenate([x, [-5.0] * 10]).astype(np.float32)
    p = np.concatenate([x, RS.randn(10)]).astype(np.float32)
    assert ccc(y, p) == pytest.approx(1.0, abs=1e-5)  # ignores sentinels
    assert ccc(np.full(5, -5.0), RS.randn(5)) == 0.0


def test_composite_scores():
    mex = AccF1Metric(7); mau = MultiLabelAccF1(-1); mva = CCCMetric(-5.0)
    mex.update(RS.randint(0, 7, 32), RS.randint(0, 8, 32))
    mau.update(RS.randint(0, 2, (32, 12)), RS.randint(0, 2, (32, 12)))
    mva.update(RS.randn(32, 2), RS.randn(32, 2))
    s = composite_scores(mex, mau, mva)
    assert s["EX"]["score"] == pytest.approx(
        0.67 * s["EX"]["f1"] + 0.33 * s["EX"]["acc"])
    assert s["AU"]["score"] == pytest.approx(
        0.5 * s["AU"]["f1"] + 0.5 * s["AU"]["acc"])
    assert s["VA"]["score"] == pytest.approx(
        (s["VA"]["ccc_v"] + s["VA"]["ccc_a"]) / 2)
