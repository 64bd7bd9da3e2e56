"""Loss parity tests vs torch-functional goldens.

Goldens re-derive the reference loss *semantics* with torch.nn.functional on
CPU (independent implementation of the same math, including the sentinel
masking quirks), then check the fixed-shape JAX versions match.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from auformer.losses import (AU_POS_WEIGHT, DICE_POS_WEIGHT, au_bce_loss,
                             bce_with_logits, ccc_loss, dice_au_loss,
                             ex_ce_loss, ex_focal_loss, LossSuite, SUITES)

RS = np.random.RandomState(7)


def make_au_batch(n=32, invalid_frac=0.3):
    logits = RS.randn(n, 12).astype(np.float32)
    labels = RS.randint(0, 2, (n, 12)).astype(np.float32)
    invalid = RS.rand(n) < invalid_frac
    labels[invalid] = -1.0
    return logits, labels


def torch_au_bce(logits, labels, pw):
    """Golden: row-mask by first AU, pos-weighted BCE mean (loss.py:75-103)."""
    x = torch.from_numpy(logits)
    y = torch.from_numpy(labels)
    keep = y[:, 0] != -1
    if keep.sum() == 0:
        return 0.0
    loss = F.binary_cross_entropy_with_logits(
        x[keep], y[keep], pos_weight=torch.from_numpy(pw), reduction="none")
    return float(loss.mean())


def test_au_bce_matches_torch():
    logits, labels = make_au_batch()
    golden = torch_au_bce(logits, labels, AU_POS_WEIGHT)
    ours = float(au_bce_loss(logits, labels))
    assert ours == pytest.approx(golden, rel=1e-5)


def test_au_bce_all_invalid_is_zero():
    logits, labels = make_au_batch()
    labels[:] = -1.0
    assert float(au_bce_loss(logits, labels)) == 0.0


def test_bce_pos_weight_elementwise():
    x = torch.randn(8, 12)
    y = torch.randint(0, 2, (8, 12)).float()
    golden = F.binary_cross_entropy_with_logits(
        x, y, pos_weight=torch.from_numpy(AU_POS_WEIGHT), reduction="none")
    ours = np.asarray(bce_with_logits(x.numpy(), y.numpy(), AU_POS_WEIGHT))
    np.testing.assert_allclose(ours, golden.numpy(), rtol=1e-5, atol=1e-6)


def torch_dice_au(logits, labels, pw):
    """Golden for DiceAULoss: per-column sigmoid dice summed (weights dead in
    the reference) + 5x pos-weighted BCE mean over valid rows."""
    x = torch.from_numpy(logits)
    y = torch.from_numpy(labels)
    keep = y[:, 0] != -1
    x, y = x[keep], y[keep].float()
    total = 0.0
    for c in range(12):
        p = torch.sigmoid(x[:, c])
        t = y[:, c]
        inter = (p * t).sum()
        total += float(1 - (2 * inter + 1) / (p.sum() + t.sum() + 1))
    bce = F.binary_cross_entropy_with_logits(
        x, y, pos_weight=torch.from_numpy(pw), reduction="none").mean()
    return total + 5 * float(bce)


def test_dice_au_matches_torch():
    logits, labels = make_au_batch()
    golden = torch_dice_au(logits, labels, DICE_POS_WEIGHT)
    ours = float(dice_au_loss(logits, labels))
    assert ours == pytest.approx(golden, rel=1e-4)


def torch_ccc(pred, true, ignore=-5.0):
    """Golden CCCLoss: unbiased std, pre-mask batch size (loss.py:280-313)."""
    yp = torch.from_numpy(pred)
    yt = torch.from_numpy(true)
    bs = yp.shape[0]
    keep = yt != ignore
    yt, yp = yt[keep], yp[keep]
    if yt.numel() <= 1:
        return 0.0
    x_m, y_m = yp.mean(), yt.mean()
    x_std, y_std = torch.std(yt), torch.std(yp)
    s_xy = ((yp - x_m) * (yt - y_m)).sum()
    ccc = 2 * s_xy / ((x_std ** 2 + y_std ** 2 + (x_m - y_m) ** 2 + 1e-8) * bs)
    return float(1 - ccc)


def test_ccc_matches_torch():
    pred = RS.randn(64).astype(np.float32)
    true = (pred * 0.8 + RS.randn(64).astype(np.float32) * 0.3)
    true[RS.rand(64) < 0.25] = -5.0
    golden = torch_ccc(pred, true)
    ours = float(ccc_loss(pred, true))
    assert ours == pytest.approx(golden, rel=1e-4)


def test_ccc_degenerate():
    pred = RS.randn(8).astype(np.float32)
    true = np.full(8, -5.0, np.float32)
    assert float(ccc_loss(pred, true)) == 0.0
    true[0] = 0.5  # exactly one valid -> still 0
    assert float(ccc_loss(pred, true)) == 0.0


def test_ex_ce_matches_torch():
    logits = RS.randn(32, 7).astype(np.float32)
    labels = RS.randint(0, 8, 32).astype(np.int64)  # 7 = ignore
    golden = float(F.cross_entropy(torch.from_numpy(logits),
                                   torch.from_numpy(labels), ignore_index=7))
    ours = float(ex_ce_loss(logits, labels))
    assert ours == pytest.approx(golden, rel=1e-5)


def test_ex_ce_weighted_matches_torch():
    w = np.array([2.62, 26.5, 45, 40, 4.0, 5.87, 1.0], np.float32)
    logits = RS.randn(32, 7).astype(np.float32)
    labels = RS.randint(0, 8, 32).astype(np.int64)
    golden = float(F.cross_entropy(torch.from_numpy(logits),
                                   torch.from_numpy(labels),
                                   weight=torch.from_numpy(w),
                                   ignore_index=7))
    ours = float(ex_ce_loss(logits, labels, class_weight=w))
    assert ours == pytest.approx(golden, rel=1e-5)


def torch_focal_ori(logits, labels, gamma=2.0, ignore=7, smooth=1e-4):
    """Golden FocalLoss_Ori semantics including the double division
    (loss.py:433-463)."""
    x = torch.from_numpy(logits)
    t = torch.from_numpy(labels).view(-1, 1)
    prob = F.softmax(x, dim=1)
    valid = (t != ignore)
    tgt = t * valid
    pt = prob.gather(1, tgt).view(-1) + smooth
    loss = -((1 - pt) ** gamma) * torch.log(pt)
    loss = loss * valid.view(-1)
    return float(loss.mean() / valid.sum())


def test_ex_focal_matches_torch():
    logits = RS.randn(32, 7).astype(np.float32)
    labels = RS.randint(0, 8, 32).astype(np.int64)
    golden = torch_focal_ori(logits, labels)
    ours = float(ex_focal_loss(logits, labels))
    assert ours == pytest.approx(golden, rel=1e-4)


def test_suite_layout_and_mt():
    suite = SUITES["avformer"]
    out = RS.randn(16, 21).astype(np.float32)
    au = RS.randint(0, 2, (16, 12)).astype(np.float32)
    ex = RS.randint(0, 8, 16).astype(np.int64)
    va = np.clip(RS.randn(16, 2), -1, 1).astype(np.float32)
    lex, lau, lva = suite.get_mt_loss(out, {"EX": ex, "AU": au, "VA": va})
    assert np.isfinite(float(lex + lau + lva))
    # VA uses tanh + 2:1 weighting (avformer.py:119-123)
    v = np.tanh(out[:, 19]); a = np.tanh(out[:, 20])
    expect = 2 * float(ccc_loss(v, va[:, 0])) + float(ccc_loss(a, va[:, 1]))
    assert float(lva) == pytest.approx(expect, rel=1e-5)


def test_smooth_au_loss_matches_torch():
    """SmoothAULoss intent: plain pos-weighted BCE + label-smoothed BCE with
    the pos_weight applied as an ELEMENTWISE weight (loss.py:12-31,178-220)."""
    from auformer.losses import smooth_au_loss
    logits, labels = make_au_batch()
    x = torch.from_numpy(logits)
    y = torch.from_numpy(labels)
    keep = y[:, 0] != -1
    x, y = x[keep], y[keep]
    pw = torch.from_numpy(AU_POS_WEIGHT)
    plain = F.binary_cross_entropy_with_logits(
        x, y, pos_weight=pw, reduction="none").mean()
    sm_t = y * 0.9 + 0.05
    smooth = (F.binary_cross_entropy_with_logits(
        x, sm_t, reduction="none") * pw).mean()
    golden = float(plain + smooth)
    assert float(smooth_au_loss(logits, labels)) == pytest.approx(
        golden, rel=1e-4)


def test_focal_au_loss_matches_torch():
    """FocalAULoss intent: mean BCE + FocalLoss2d scalar transform
    (loss.py:34-61,222-264)."""
    from auformer.losses import focal_au_loss
    logits, labels = make_au_batch()
    x = torch.from_numpy(logits)
    y = torch.from_numpy(labels)
    keep = y[:, 0] != -1
    x, y = x[keep], y[keep]
    pw = torch.from_numpy(AU_POS_WEIGHT)
    mean_bce = F.binary_cross_entropy_with_logits(
        x, y, pos_weight=pw, reduction="mean")
    logpt = -mean_bce
    pt = torch.exp(logpt)
    focal = 0.25 * (-((1 - pt) ** 2) * logpt)
    golden = float(mean_bce + focal)
    assert float(focal_au_loss(logits, labels)) == pytest.approx(
        golden, rel=1e-4)


def test_focal_topk_matches_torch():
    """FocalLoss_TOPK: top-20% hard mining over per-sample focal CE
    (loss.py:339-386)."""
    from auformer.losses import ex_focal_topk_loss
    logits = RS.randn(40, 7).astype(np.float32)
    labels = RS.randint(0, 7, 40).astype(np.int64)
    p = F.softmax(torch.from_numpy(logits), dim=1)
    pt = p.gather(1, torch.from_numpy(labels).view(-1, 1)).view(-1)
    loss = -0.25 * ((1 - pt) ** 2) * torch.log(pt)
    golden = float(torch.topk(loss, int(40 * 0.2))[0].mean())
    assert float(ex_focal_topk_loss(logits, labels)) == pytest.approx(
        golden, rel=1e-4)


def test_label_smoothing_ce_reference_formula():
    """LabelSmoothingCrossEntropy (loss.py:326-337) on all-valid labels:
    eps*smooth/n + (1-2*eps)*nll."""
    from auformer.losses import label_smoothing_ce_loss
    logits = RS.randn(16, 7).astype(np.float32)
    labels = RS.randint(0, 7, 16).astype(np.int64)
    lp = F.log_softmax(torch.from_numpy(logits), dim=-1)
    smooth = (-lp.sum(dim=-1)).mean()
    nll = F.nll_loss(lp, torch.from_numpy(labels))
    golden = float(0.1 * smooth / 7 + (1 - 0.2) * nll)
    assert float(label_smoothing_ce_loss(logits, labels)) == pytest.approx(
        golden, rel=1e-4)


def test_ccc_smooth_l1():
    """CCC_SmoothL1 intent (loss.py:315-318): SmoothL1 + CCC loss."""
    from auformer.losses import ccc_loss, ccc_smooth_l1_loss
    pred = RS.randn(32).astype(np.float32)
    true = (pred * 0.5 + RS.randn(32).astype(np.float32) * 0.4)
    sl1 = float(F.smooth_l1_loss(torch.from_numpy(pred),
                                 torch.from_numpy(true)))
    golden = sl1 + float(ccc_loss(pred, true))
    assert float(ccc_smooth_l1_loss(pred, true)) == pytest.approx(
        golden, rel=1e-4)
