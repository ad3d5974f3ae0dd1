"""Train-side losses (A5/W5) vs independent hand-computed values."""

import numpy as np

from ocr_pytorch_spark.models import losses as L


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def test_rpn_regr_loss_smooth_l1():
    # anchors: 0 pos, 1 pos, 1 ignore
    target = np.array([[0, 0.0, 0.0],
                       [1, 0.5, 0.02],
                       [-1, 9.0, 9.0]])
    pred = np.array([[9.9, 9.9],
                     [0.3, 0.01],
                     [0.0, 0.0]])
    sigma = 9.0
    # diffs for the positive row: |0.5-0.3|=0.2 (>=1/9 -> linear),
    # |0.02-0.01|=0.01 (<1/9 -> quadratic)
    want = (0.2 - 0.5 / sigma) + 0.5 * 0.01 ** 2 * sigma
    assert np.isclose(L.rpn_regr_loss(pred, target), want)
    # no positives -> 0
    assert L.rpn_regr_loss(pred, np.zeros((3, 3))) == 0.0


def test_rpn_cls_loss_ohem_picks_hardest_negatives():
    rng = np.random.default_rng(0)
    n = 500
    pred = rng.normal(size=(n, 2))
    target = np.zeros(n)
    target[:5] = 1
    target[-3:] = -1  # ignored
    ce = -np.log(_softmax(pred))
    pos_sum = ce[:5, 1].sum()
    neg_ce = np.sort(ce[5:-3, 0])[::-1]
    k = 300 - 5
    want = (pos_sum + neg_ce[:k].sum()) / 300
    assert np.isclose(L.rpn_cls_loss(pred, target), want)

    # non-OHEM branch: clamped mean NLL over non-ignored
    keep = target != -1
    nll = ce[keep, target[keep].astype(int)]
    assert np.isclose(L.rpn_cls_loss(pred, target, ohem=False),
                      min(nll.mean(), 10.0))


def test_rpn_cls_loss_ohem_more_positives_than_budget():
    """n_pos > total_num: k clamps to 0 — no negatives contribute
    (a negative k would silently sum all-but-|k| hardest negatives)."""
    rng = np.random.default_rng(1)
    n = 400
    pred = rng.normal(size=(n, 2))
    target = np.ones(n)
    target[-50:] = 0  # 350 positives > total_num=300, 50 negatives
    ce = -np.log(_softmax(pred))
    want = ce[:-50, 1].sum() / 300  # positives only
    assert np.isclose(L.rpn_cls_loss(pred, target), want)


def test_ctc_loss_matches_path_enumeration():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 4))
    logp = np.log(_softmax(logits))
    target = [2, 2]  # repeated label forces a blank between
    # enumerate all 4^3 alignment paths, keep those collapsing to target
    total = 0.0
    for a in range(4):
        for b in range(4):
            for c in range(4):
                path = [a, b, c]
                collapsed = []
                prev = 0
                for s in path:
                    if s != 0 and s != prev:
                        collapsed.append(s)
                    prev = s
                if collapsed == target:
                    total += np.exp(logp[0, a] + logp[1, b] + logp[2, c])
    want = -np.log(total)
    assert np.isclose(L.ctc_loss(logp, np.array(target)), want)


def test_ctc_loss_impossible_is_zero():
    logp = np.log(_softmax(np.zeros((2, 4))))
    # needs T >= 3 for [1,1] (blank between repeats) -> zero_infinity
    assert L.ctc_loss(logp, np.array([1, 1])) == 0.0
