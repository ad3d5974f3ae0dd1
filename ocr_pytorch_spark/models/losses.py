"""Train-side loss reductions (SURVEY §2 A5 + W5), deterministic NumPy.

Reproduces the reference's training criteria so the engine covers the
full reference surface, not just inference:

* ``rpn_regr_loss`` — smooth-L1 over positive anchors
  (train_code/train_ctpn/ctpn_model.py:14-44, sigma=9).
* ``rpn_cls_loss`` — OHEM cross-entropy: all positives + the hardest
  (top-k) negatives, normalized by RPN_TOTAL_NUM=300
  (ctpn_model.py:47-92, config.py:26-31); the non-OHEM branch is the
  clamped mean NLL.
* ``ctc_loss`` — the CTC forward algorithm in log space, matching
  torch.nn.CTCLoss(reduction='sum', zero_infinity=True) as used by
  train_code/train_crnn/train_pytorch_ctc.py:71.

The OHEM hard-negative selection also exists as a Spark aggregation
(``ohem_topk_sum`` in __spark_entry__.py: window rank over per-row
losses + conditional sum — the distributed form of "sum of the k
hardest examples per group").
"""

from __future__ import annotations

import numpy as np

RPN_TOTAL_NUM = 300  # train_ctpn/config.py:27


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def rpn_regr_loss(pred: np.ndarray, target: np.ndarray,
                  sigma: float = 9.0) -> float:
    """pred: (N, 2) anchor regressions; target: (N, 3) rows of
    (cls, dy, dh).  Smooth-L1 summed over the 2 coords, averaged over
    positive anchors (cls == 1); 0.0 when none."""
    cls = target[:, 0]
    keep = cls == 1
    if not keep.any():
        return 0.0
    diff = np.abs(target[keep, 1:3] - pred[keep])
    less_one = (diff < 1.0 / sigma).astype(np.float64)
    loss = (less_one * 0.5 * diff ** 2 * sigma
            + np.abs(1 - less_one) * (diff - 0.5 / sigma))
    return float(loss.sum(axis=1).mean())


def rpn_cls_loss(pred: np.ndarray, target: np.ndarray,
                 ohem: bool = True,
                 total_num: int = RPN_TOTAL_NUM) -> float:
    """pred: (N, 2) class logits; target: (N,) labels in {-1, 0, 1}
    (-1 = ignore).  OHEM: sum CE over positives + sum of the
    (total_num - n_pos) largest negative CEs, / total_num."""
    ce = -_log_softmax(pred.astype(np.float64))
    if ohem:
        pos = target == 1
        n_pos = int(pos.sum())
        loss_pos = ce[pos, 1].sum() if n_pos else 0.0
        neg = target == 0
        loss_neg = np.sort(ce[neg, 0])[::-1]
        # clamp: if n_pos >= total_num, take NO negatives — a negative
        # k would silently slice all-but-|k| hardest negatives, where
        # the reference's torch.topk would error loudly
        k = min(loss_neg.size, max(0, total_num - n_pos))
        return float((loss_pos + loss_neg[:k].sum()) / total_num)
    keep = target != -1
    if not keep.any():
        return 0.0
    nll = ce[keep, target[keep].astype(int)]
    return float(np.clip(nll.mean(), 0, 10))


def ctc_loss(log_probs: np.ndarray, target: np.ndarray,
             blank: int = 0) -> float:
    """Negative log-likelihood of ``target`` (class indices, no blanks)
    under ``log_probs`` (T, nclass), via the CTC forward recursion in
    log space — torch CTCLoss semantics for one sequence (zero_infinity:
    impossible alignments return 0.0)."""
    T, _ = log_probs.shape
    # extended target: blank-interleaved  b t1 b t2 b ... b tL b
    ext = np.full(2 * len(target) + 1, blank, dtype=np.int64)
    ext[1::2] = target
    S = ext.size
    if S > 2 * T + 1:
        return 0.0  # impossible alignment; zero_infinity=True
    neg_inf = -np.inf
    alpha = np.full(S, neg_inf)
    alpha[0] = log_probs[0, ext[0]]
    if S > 1:
        alpha[1] = log_probs[0, ext[1]]
    for t in range(1, T):
        prev = alpha
        alpha = np.full(S, neg_inf)
        for s in range(S):
            cands = [prev[s]]
            if s >= 1:
                cands.append(prev[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                cands.append(prev[s - 2])
            m = max(cands)
            if m == neg_inf:
                continue
            alpha[s] = m + np.log(sum(np.exp(c - m) for c in cands)) \
                + log_probs[t, ext[s]]
    tail = [alpha[S - 1]] + ([alpha[S - 2]] if S > 1 else [])
    m = max(tail)
    if m == neg_inf:
        return 0.0
    ll = m + np.log(sum(np.exp(c - m) for c in tail))
    return float(-ll)
