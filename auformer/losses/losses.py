"""Masked multi-task loss suite (JAX, fixed-shape).

Reproduces the reference loss semantics (models/loss.py) with XLA-friendly
masking: no boolean indexing / dynamic shapes — sentinel rows are weighted
out and denominators count valid rows, which is numerically identical to the
reference's gather-then-reduce for every reduction used.

Load-bearing oddities kept on purpose:
  * AU row masking: a sample is valid iff its FIRST AU label != -1
    (loss.py:86-88,171-174) — per-column partial masking is NOT applied.
  * CCCLoss divides by the PRE-mask batch size and uses unbiased (n-1) std
    (torch.std), returning 0 when <=1 valid labels (loss.py:292-309). The
    eval-time metric (metrics/) instead uses numpy's biased std and the
    post-mask count — both reproduced separately.
  * FocalLoss_Ori 'mean' divides by N and then again by the valid count
    (loss.py:460-463) — the double division is kept.
  * EX labels arrive remapped -1 -> 7 and every EX loss ignores class 7
    (train.py:126,208).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# reference loss.py:73 / :154
AU_POS_WEIGHT = np.array([1, 1, 1, 1, 1, 1, 1, 3, 3, 3, 1, 2], np.float32)
DICE_POS_WEIGHT = np.array([1, 2, 1, 1, 1, 1, 1, 6, 6, 5, 1, 5], np.float32)
# reference audio.py:53 intent (8th weight-0 entry dropped, SURVEY §2.4)
EX_CLASS_WEIGHT = np.array([2.62, 26.5, 45, 40, 4.0, 5.87, 1.0], np.float32)

AU_IGNORE = -1.0
EX_IGNORE = 7
VA_IGNORE = -5.0


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)


def bce_with_logits(logits, targets, pos_weight=None):
    """Elementwise torch BCEWithLogitsLoss(reduction='none') semantics."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    sp = jax.nn.softplus(-logits)            # -log sigmoid(x)
    if pos_weight is None:
        return (1.0 - targets) * logits + sp
    pw = jnp.asarray(pos_weight, jnp.float32)
    return (1.0 - targets) * logits + (1.0 + (pw - 1.0) * targets) * sp


def _au_row_mask(y_true):
    """Valid iff first AU label != -1 (loss.py:86-88)."""
    return (y_true[:, 0] != AU_IGNORE).astype(jnp.float32)


def au_bce_loss(y_pred, y_true, pos_weight=AU_POS_WEIGHT):
    """reference AULoss (loss.py:63-103): masked mean of pos-weighted BCE."""
    m = _au_row_mask(y_true)
    elem = bce_with_logits(y_pred, y_true, pos_weight) * m[:, None]
    return _safe_div(elem.sum(), m.sum() * y_pred.shape[1])


def _masked_dice(y_pred, y_true, row_mask):
    """Per-column DiceLoss over valid rows (loss.py:124-147), summed over
    columns (MultiLabelDiceLoss, loss.py:105-122; its weights arg is
    dead — the reference passes `weight=` into a `weights=` ctor)."""
    p = jax.nn.sigmoid(y_pred.astype(jnp.float32)) * row_mask[:, None]
    t = y_true.astype(jnp.float32) * row_mask[:, None]
    inter = (p * t).sum(axis=0)
    dice = 1.0 - (2.0 * inter + 1.0) / (p.sum(axis=0) + t.sum(axis=0) + 1.0)
    return dice.sum()


def dice_au_loss(y_pred, y_true, pos_weight=DICE_POS_WEIGHT):
    """reference DiceAULoss (loss.py:149-176): dice-sum + 5 x weighted BCE."""
    m = _au_row_mask(y_true)
    dice = _masked_dice(y_pred, y_true, m)
    elem = bce_with_logits(y_pred, y_true, pos_weight) * m[:, None]
    bce = _safe_div(elem.sum(), m.sum() * y_pred.shape[1])
    return dice + 5.0 * bce


def smooth_au_loss(y_pred, y_true, pos_weight=AU_POS_WEIGHT, smoothing=0.1):
    """reference SmoothAULoss intent (loss.py:178-220; the committed class
    crashes — self.loss_fn never assigned, SURVEY §2.4-7): pos-weighted BCE +
    label-smoothed BCE. The smoothing branch follows
    SmoothingBCELossWithLogits (loss.py:12-31), whose `weight` lands on the
    *elementwise* weight argument of F.binary_cross_entropy_with_logits."""
    m = _au_row_mask(y_true)
    n = m.sum() * y_pred.shape[1]
    plain = bce_with_logits(y_pred, y_true, pos_weight) * m[:, None]
    sm_t = y_true.astype(jnp.float32) * (1 - smoothing) + 0.5 * smoothing
    smooth = bce_with_logits(y_pred, sm_t) * jnp.asarray(pos_weight) * m[:, None]
    return _safe_div(plain.sum(), n) + _safe_div(smooth.sum(), n)


def focal_au_loss(y_pred, y_true, pos_weight=AU_POS_WEIGHT,
                  gamma=2.0, balance=0.25):
    """reference FocalAULoss intent (loss.py:222-264, broken super-call):
    masked weighted-BCE mean + FocalLoss2d (loss.py:34-61), where the focal
    term is a scalar transform of the mean BCE: logpt = -mean_bce,
    focal = -(1-e^logpt)^gamma * logpt * balance."""
    m = _au_row_mask(y_true)
    n = m.sum() * y_pred.shape[1]
    elem = bce_with_logits(y_pred, y_true, pos_weight) * m[:, None]
    mean_bce = _safe_div(elem.sum(), n)
    logpt = -mean_bce
    pt = jnp.exp(logpt)
    focal = -((1.0 - pt) ** gamma) * logpt * balance
    return mean_bce + focal


def ccc_loss(y_pred, y_true, ignore=VA_IGNORE):
    """reference CCCLoss (loss.py:271-313) for a single dimension.

    y_pred/y_true: (N,). Unbiased std, denominator scaled by the PRE-mask
    batch size, 0 when <=1 valid.
    """
    y_pred = y_pred.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    batch_size = y_pred.shape[0]
    m = (y_true != ignore).astype(jnp.float32)
    cnt = m.sum()
    mean_p = _safe_div((y_pred * m).sum(), cnt)
    mean_t = _safe_div((y_true * m).sum(), cnt)
    var_p = _safe_div((m * (y_pred - mean_p) ** 2).sum(), jnp.maximum(cnt - 1, 1))
    var_t = _safe_div((m * (y_true - mean_t) ** 2).sum(), jnp.maximum(cnt - 1, 1))
    s_xy = (m * (y_pred - mean_p) * (y_true - mean_t)).sum()
    denom = var_p + var_t + (mean_p - mean_t) ** 2 + 1e-8
    ccc = 2.0 * s_xy / (denom * batch_size)
    return jnp.where(cnt > 1, 1.0 - ccc, 0.0)


def ccc_smooth_l1_loss(y_pred, y_true, ignore=VA_IGNORE):
    """reference CCC_SmoothL1 intent (loss.py:315-318, committed version
    mis-calls CCCLoss): SmoothL1 (beta=1) on valid labels + CCC loss."""
    m = (y_true != ignore).astype(jnp.float32)
    d = jnp.abs(y_pred - y_true)
    sl1 = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5) * m
    return _safe_div(sl1.sum(), m.sum()) + ccc_loss(y_pred, y_true, ignore)


def _log_softmax(x):
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def ex_ce_loss(y_pred, y_true, ignore_index=EX_IGNORE, class_weight=None):
    """torch CrossEntropyLoss(ignore_index=7[, weight]) semantics:
    sum(w[y]*nll)/sum(w[y]) over valid rows."""
    y_true = y_true.reshape(-1).astype(jnp.int32)
    logp = _log_softmax(y_pred)
    valid = (y_true != ignore_index).astype(jnp.float32)
    tgt = jnp.where(y_true == ignore_index, 0, y_true)
    nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
    if class_weight is None:
        w = valid
    else:
        w = jnp.asarray(class_weight, jnp.float32)[tgt] * valid
    return _safe_div((nll * w).sum(), w.sum())


def ex_focal_loss(y_pred, y_true, num_class=7, gamma=2.0,
                  ignore_index=EX_IGNORE, smooth=1e-4):
    """reference FocalLoss_Ori (loss.py:388-466) with reduction='mean',
    including the double division (mean over N, then / valid count)."""
    y_true = y_true.reshape(-1).astype(jnp.int32)
    n = y_true.shape[0]
    p = jax.nn.softmax(y_pred.astype(jnp.float32), axis=1)
    valid = (y_true != ignore_index).astype(jnp.float32)
    tgt = jnp.where(y_true == ignore_index, 0, y_true)
    pt = jnp.take_along_axis(p, tgt[:, None], axis=1)[:, 0] + smooth
    logpt = jnp.log(pt)
    loss = -((1.0 - pt) ** gamma) * logpt * valid
    return _safe_div(loss.sum() / n, valid.sum())


def ex_focal_topk_loss(y_pred, y_true, gamma=2.0, alpha=0.25,
                       top_frac=0.2):
    """reference FocalLoss_TOPK (loss.py:339-386): top-20% hard mining over
    per-sample focal CE (no ignore handling in the reference)."""
    y_true = y_true.reshape(-1).astype(jnp.int32)
    n = y_true.shape[0]
    p = jax.nn.softmax(y_pred.astype(jnp.float32), axis=1)
    pt = jnp.take_along_axis(p, y_true[:, None], axis=1)[:, 0]
    loss = -alpha * ((1.0 - pt) ** gamma) * jnp.log(pt)
    k = max(int(n * top_frac), 1)
    top = jax.lax.top_k(loss, k)[0]
    return top.mean()


def label_smoothing_ce_loss(y_pred, y_true, epsilon=0.1,
                            ignore_index=EX_IGNORE):
    """reference LabelSmoothingCrossEntropy (loss.py:326-337). NOTE: the
    reference's nll_loss has NO ignore_index, but callers always remap
    -1 -> 7 and 7 is out of range for 7 logits; we clamp like the focal path
    and zero those rows to keep the program total (the reference would index
    out of bounds — dead in practice because sCE is only used via
    sce_and_focal_loss which no shipped model enables)."""
    y_true = y_true.reshape(-1).astype(jnp.int32)
    logp = _log_softmax(y_pred)
    nclass = y_pred.shape[-1]
    valid = (y_true != ignore_index).astype(jnp.float32)
    tgt = jnp.where(y_true == ignore_index, 0, y_true)
    nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0] * valid
    smooth_term = (-logp.sum(axis=-1) * valid)
    lin = (epsilon * _safe_div(smooth_term.sum(), valid.sum()) / nclass
           + (1 - epsilon * 2) * _safe_div(nll.sum(), valid.sum()))
    return lin


def sce_and_focal_loss(y_pred, y_true):
    """reference sCE_and_focal_loss (loss.py:266-269)."""
    return (label_smoothing_ce_loss(y_pred, y_true)
            + ex_focal_loss(y_pred, y_true))


# ---------------------------------------------------------------------------
# Per-model loss suites (which loss each model binds, per its constructor)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LossSuite:
    """Bundles the task losses a model exposes as get_{ex,au,va,mt}_loss.

    va_weight_v: the V-branch multiplier — most models use
    2*ccc(v) + ccc(a) (e.g. avformer.py:119-123); sformer uses 1*+1*
    (sformer.py:415-421).
    """
    ex: Callable = ex_ce_loss
    au: Callable = au_bce_loss
    va_each: Callable = ccc_loss
    va_weight_v: float = 2.0

    def get_ex_loss(self, y_pred, y_true):
        return self.ex(y_pred[:, 12:19], y_true)

    def get_au_loss(self, y_pred, y_true):
        return self.au(y_pred[:, :12], y_true)

    def get_va_loss(self, y_pred, y_true):
        v = jnp.tanh(y_pred[:, 19])
        a = jnp.tanh(y_pred[:, 20])
        return (self.va_weight_v * self.va_each(v, y_true[:, 0])
                + self.va_each(a, y_true[:, 1]))

    def get_mt_loss(self, y_pred, y_true: dict, normalize: bool = False):
        """[ex, au, va] like the reference get_mt_loss (audio.py:88-114);
        normalize divides each by its valid-label count."""
        lex = self.get_ex_loss(y_pred, y_true["EX"])
        lau = self.get_au_loss(y_pred, y_true["AU"])
        lva = self.get_va_loss(y_pred, y_true["VA"])
        if normalize:
            nex = (y_true["EX"].reshape(-1) != EX_IGNORE).sum()
            nau = (y_true["AU"] != AU_IGNORE).sum()
            nva = (y_true["VA"] != VA_IGNORE).sum()
            lex = jnp.where(nex > 0, lex / jnp.maximum(nex, 1), 0.0)
            lau = jnp.where(nau > 0, lau / jnp.maximum(nau, 1), 0.0)
            lva = jnp.where(nva > 0, lva / jnp.maximum(nva, 1), 0.0)
        return [lex, lau, lva]


def _weighted_ce(y_pred, y_true):
    return ex_ce_loss(y_pred, y_true, class_weight=EX_CLASS_WEIGHT)


# Constructor bindings per model (see each model file's docstring)
SUITES: dict[str, LossSuite] = {
    # avformer.py:89-91: FocalLoss_Ori / AULoss / CCC, VA 2:1
    "avformer": LossSuite(ex=ex_focal_loss, au=au_bce_loss),
    # vformer.py:375-379: CE / AULoss / CCC
    "vformer": LossSuite(ex=ex_ce_loss, au=au_bce_loss),
    # sformer.py:359-363: CE / DiceAULoss / CCC, VA 1:1
    "sformer": LossSuite(ex=ex_ce_loss, au=dice_au_loss, va_weight_v=1.0),
    # tformer.py:423-427: CE / AULoss / CCC
    "tformer": LossSuite(ex=ex_ce_loss, au=au_bce_loss),
    # dual_sformer.py:300-304: CE / AULoss / CCC, VA 1:1 (:331-337)
    "dsformer": LossSuite(ex=ex_ce_loss, au=au_bce_loss, va_weight_v=1.0),
    # audio.py:53-56: weighted CE / DiceAULoss / CCC
    "audio": LossSuite(ex=_weighted_ce, au=dice_au_loss),
    # van.py:351-355: CE / AULoss / CCC, VA 1:1 (:404-410)
    "van": LossSuite(ex=ex_ce_loss, au=au_bce_loss, va_weight_v=1.0),
    "vggformer": LossSuite(ex=ex_ce_loss, au=au_bce_loss),
    "i3d": LossSuite(ex=ex_ce_loss, au=au_bce_loss),
    "mc3d": LossSuite(ex=ex_ce_loss, au=au_bce_loss),
    # resnet.py:28-30: CE / plain BCE intent / CCC, VA 1:1 (:76-80)
    "resnet": LossSuite(ex=ex_ce_loss,
                        au=lambda p, t: au_bce_loss(p, t, np.ones(12, np.float32)),
                        va_weight_v=1.0),
    # emonet.py:228-230: CE / SmoothAULoss / CCC, VA 1:1 (:281-286)
    "emonet": LossSuite(ex=ex_ce_loss, au=smooth_au_loss, va_weight_v=1.0),
    # tsav.py:81-84: weighted CE intent / AULoss / CCC, VA 1:1 (:109-115)
    "tsav": LossSuite(ex=_weighted_ce, au=au_bce_loss, va_weight_v=1.0),
}
