"""End-to-end CTPN backward: the reference's actual training step.

``ctpn_train.py:84-110`` computes ``loss_cls + loss_regr`` over the
CTPN forward and calls ``loss.backward()``; this module reproduces
that gradient analytically through the exact graph of
``models/ctpn.ctpn_forward`` (VGG16 conv stack → RPN conv → BiGRU over
feature rows → lstm_fc 1×1 → twin 1×1 heads) using the tape-keeping
kernels in ``kernels/grad.py``.  Losses and their gradients mirror
``models/losses.py`` (train_code/train_ctpn/ctpn_model.py:14-92):
smooth-L1 regression over positive anchors (sigma=9) and OHEM
cross-entropy (positives + hardest negatives, / RPN_TOTAL_NUM).

Used by ``models/training.py``'s ``train_loop`` as a real ``grad_fn``
— see tests/test_backprop.py for the gradcheck against central finite
differences and the monotone-loss fine-tune run.
"""

from __future__ import annotations

import numpy as np

from ocr_pytorch_spark.kernels import grad as G
from ocr_pytorch_spark.models.ctpn import _VGG_LAYERS
from ocr_pytorch_spark.models.losses import (RPN_TOTAL_NUM,
                                             _log_softmax)


def ctpn_forward_tape(x: np.ndarray, w: dict):
    """ctpn_forward with gradient tapes.  Returns (cls, regr, tape)."""
    tape = []
    for layer in _VGG_LAYERS:
        if layer[0] == "pool":
            x, c = G.maxpool2d_fwd(x, 2, 2)
            tape.append(("pool", None, c))
        else:
            idx = layer[0]
            x, c = G.conv2d_fwd(
                x, w[f"base_layers.{idx}.weight"],
                w[f"base_layers.{idx}.bias"], 1, 1, relu=True)
            tape.append(("conv", f"base_layers.{idx}", c))
    x, c = G.conv2d_fwd(x, w["rpn.conv.weight"], w["rpn.conv.bias"],
                        1, 1, relu=True)
    tape.append(("conv", "rpn.conv", c))

    b, ch, h, wd = x.shape
    x1 = np.ascontiguousarray(
        x.transpose(0, 2, 3, 1)).reshape(b * h, wd, ch)
    x2, c_gru = G.bigru_fwd(x1, w, "brnn")
    tape.append(("bigru", (b, ch, h, wd), c_gru))
    x3 = np.ascontiguousarray(
        x2.reshape(b, h, wd, 256).transpose(0, 3, 1, 2))
    x3, c = G.conv2d_fwd(x3, w["lstm_fc.conv.weight"],
                         w["lstm_fc.conv.bias"], relu=True)
    tape.append(("conv", "lstm_fc.conv", c))

    cls4, c_cls = G.conv2d_fwd(x3, w["rpn_class.conv.weight"],
                               w["rpn_class.conv.bias"])
    regr4, c_regr = G.conv2d_fwd(x3, w["rpn_regress.conv.weight"],
                                 w["rpn_regress.conv.bias"])
    tape.append(("heads", (b, h, wd), (c_cls, c_regr)))
    cls = cls4.transpose(0, 2, 3, 1).reshape(b, h * wd * 10, 2)
    regr = regr4.transpose(0, 2, 3, 1).reshape(b, h * wd * 10, 2)
    return cls, regr, tape


def rpn_regr_loss_grad(pred: np.ndarray, target: np.ndarray,
                       sigma: float = 9.0):
    """losses.rpn_regr_loss + d/dpred.  pred (N,2), target (N,3)."""
    cls = target[:, 0]
    keep = cls == 1
    gp = np.zeros_like(pred, dtype=np.float64)
    if not keep.any():
        return 0.0, gp
    d = target[keep, 1:3] - pred[keep]
    ad = np.abs(d)
    small = ad < 1.0 / sigma
    loss = np.where(small, 0.5 * ad * ad * sigma, ad - 0.5 / sigma)
    n = int(keep.sum())
    # loss = mean over keep rows of the 2-coord sum
    gkeep = -np.sign(d) * np.where(small, sigma * ad, 1.0) / n
    gp[keep] = gkeep
    return float(loss.sum(axis=1).mean()), gp


def rpn_cls_loss_grad(pred: np.ndarray, target: np.ndarray,
                      total_num: int = RPN_TOTAL_NUM):
    """losses.rpn_cls_loss (OHEM branch) + d/dpred.  pred (N,2),
    target (N,) in {-1, 0, 1}."""
    lsm = _log_softmax(pred.astype(np.float64))
    ce = -lsm
    sm = np.exp(lsm)
    gp = np.zeros_like(pred, dtype=np.float64)
    pos = target == 1
    n_pos = int(pos.sum())
    loss_pos = ce[pos, 1].sum() if n_pos else 0.0
    neg_idx = np.flatnonzero(target == 0)
    order = np.argsort(-ce[neg_idx, 0], kind="stable")
    k = min(neg_idx.size, max(0, total_num - n_pos))
    sel_neg = neg_idx[order[:k]]
    loss = (loss_pos + ce[sel_neg, 0].sum()) / total_num
    # d ce_i[y] / d pred_i = softmax(pred_i) - onehot(y)
    if n_pos:
        gp[pos] = sm[pos]
        gp[pos, 1] -= 1.0
    if k:
        gp[sel_neg] = sm[sel_neg]
        gp[sel_neg, 0] -= 1.0
    return float(loss), gp / total_num


def ctc_loss_grad(log_probs: np.ndarray, target: np.ndarray,
                  blank: int = 0):
    """losses.ctc_loss + d(loss)/d(log_probs) via the forward-backward
    (alpha-beta) recursions in log space — the gradient torch CTCLoss
    computes (train_code/train_crnn/train_pytorch_ctc.py:71).

    Returns (loss, grad) with grad.shape == log_probs.shape; impossible
    alignments return (0.0, zeros) (zero_infinity semantics, matching
    losses.ctc_loss)."""
    T, K = log_probs.shape
    ext = np.full(2 * len(target) + 1, blank, dtype=np.int64)
    ext[1::2] = target
    S = ext.size
    zg = np.zeros_like(log_probs, dtype=np.float64)
    if S > 2 * T + 1:
        return 0.0, zg
    neg_inf = -np.inf
    lp = log_probs.astype(np.float64)
    em = lp[:, ext]                       # (T, S) emissions
    # skip-transition allowed into s (from s-2)?
    skip = np.zeros(S, dtype=bool)
    skip[2:] = (ext[2:] != blank) & (ext[2:] != ext[:-2])

    alpha = np.full((T, S), neg_inf)
    alpha[0, 0] = em[0, 0]
    if S > 1:
        alpha[0, 1] = em[0, 1]
    for t in range(1, T):
        prev = alpha[t - 1]
        cand = prev.copy()
        cand[1:] = np.logaddexp(cand[1:], prev[:-1])
        cand[skip] = np.logaddexp(cand[skip],
                                  prev[np.flatnonzero(skip) - 2])
        alpha[t] = cand + em[t]
    tail = ([alpha[T - 1, S - 1]]
            + ([alpha[T - 1, S - 2]] if S > 1 else []))
    m = max(tail)
    if m == neg_inf:
        return 0.0, zg
    ll = m + np.log(sum(np.exp(c - m) for c in tail))

    beta = np.full((T, S), neg_inf)
    beta[T - 1, S - 1] = em[T - 1, S - 1]
    if S > 1:
        beta[T - 1, S - 2] = em[T - 1, S - 2]
    skip_from = np.zeros(S, dtype=bool)   # s -> s+2 allowed?
    skip_from[:S - 2] = skip[2:]
    for t in range(T - 2, -1, -1):
        nxt = beta[t + 1]
        cand = nxt.copy()
        cand[:-1] = np.logaddexp(cand[:-1], nxt[1:])
        cand[skip_from] = np.logaddexp(
            cand[skip_from], nxt[np.flatnonzero(skip_from) + 2])
        beta[t] = cand + em[t]

    # posterior over ext positions (alpha+beta double-count emission)
    gamma = alpha + beta - em - ll        # (T, S) in log space
    post = np.exp(gamma)                  # sums to 1 over s at each t
    for s in range(S):
        zg[:, ext[s]] -= post[:, s]
    return float(-ll), zg


def ctpn_loss_and_grads(x: np.ndarray, w: dict, gt_cls: np.ndarray,
                        gt_regr: np.ndarray,
                        total_num: int = RPN_TOTAL_NUM):
    """One training step's worth of math: forward, loss_cls + loss_regr
    (ctpn_train.py:84-89), and d(loss)/d(every weight).

    Returns (loss_cls, loss_regr, grads: {name: ndarray}).
    """
    cls, regr, tape = ctpn_forward_tape(x, w)
    b = x.shape[0]
    loss_cls, g_cls = rpn_cls_loss_grad(cls[0], gt_cls,
                                        total_num=total_num)
    loss_regr, g_regr = rpn_regr_loss_grad(regr[0], gt_regr)

    grads: dict[str, np.ndarray] = {}

    kind, meta, (c_cls, c_regr) = tape[-1]
    assert kind == "heads"  # noqa: S101 — internal tape invariant
    _, h, wd = meta
    g_cls4 = np.ascontiguousarray(
        g_cls.reshape(b, h, wd, 10 * 2).transpose(0, 3, 1, 2))
    g_regr4 = np.ascontiguousarray(
        g_regr.reshape(b, h, wd, 10 * 2).transpose(0, 3, 1, 2))
    gx3_a, gw, gb = G.conv2d_bwd(g_cls4, c_cls)
    grads["rpn_class.conv.weight"] = gw
    grads["rpn_class.conv.bias"] = gb
    gx3_b, gw, gb = G.conv2d_bwd(g_regr4, c_regr)
    grads["rpn_regress.conv.weight"] = gw
    grads["rpn_regress.conv.bias"] = gb
    g = gx3_a + gx3_b

    for kind, name, cache in reversed(tape[:-1]):
        if kind == "conv":
            g, gw, gb = G.conv2d_bwd(g, cache)
            grads[f"{name}.weight"] = gw
            grads[f"{name}.bias"] = gb
        elif kind == "pool":
            g = G.maxpool2d_bwd(g, cache)
        elif kind == "bigru":
            bb, ch, h, wd = name
            # invert x3 = x2.reshape(b,h,wd,256).transpose(0,3,1,2)
            g2 = np.ascontiguousarray(
                g.transpose(0, 2, 3, 1)).reshape(bb * h, wd, 256)
            g1, ggru = G.bigru_bwd(g2, cache)
            grads.update(ggru)
            # invert x1 = x.transpose(0,2,3,1).reshape(b*h, wd, ch)
            g = np.ascontiguousarray(
                g1.reshape(bb, h, wd, ch).transpose(0, 3, 1, 2))
    return loss_cls, loss_regr, grads


# --- CRNN: training forward + backprop ----------------------------------

def crnn_forward_tape(x: np.ndarray, w: dict):
    """models/crnn.crnn_forward with gradient tapes and TRAINING-mode
    BN (batch statistics, as the reference's ``model.train()`` path —
    train_code/train_crnn/train_pytorch_ctc.py:131).  Returns
    (logits (T,B,nclass), tape)."""
    tape = []

    def conv(x, name, stride=1, pad=1, relu=False):
        out, c = G.conv2d_fwd(x, w[f"{name}.weight"],
                              w[f"{name}.bias"], stride, pad, relu)
        tape.append(("conv", name, c))
        return out

    def pool(x, k, s, p=0):
        out, c = G.maxpool2d_fwd(x, k, s, p)
        tape.append(("pool", None, c))
        return out

    def bn_relu(x, name):
        out, c = G.batchnorm2d_train_fwd(
            x, w[f"{name}.weight"], w[f"{name}.bias"])
        tape.append(("bn", name, c))
        out, cr = G.relu_fwd(out)
        tape.append(("relu", None, cr))
        return out

    x = pool(conv(x, "conv1", relu=True), 2, 2)
    x = pool(conv(x, "conv2", relu=True), 2, 2)
    x = bn_relu(conv(x, "conv3_1"), "bn3")
    x = pool(conv(x, "conv3_2", relu=True), (2, 2), (2, 1), (0, 1))
    x = bn_relu(conv(x, "conv4_1"), "bn4")
    x = pool(conv(x, "conv4_2", relu=True), (2, 2), (2, 1), (0, 1))
    x = bn_relu(conv(x, "conv5", pad=0), "bn5")
    b, c, h, wd = x.shape
    assert h == 1, f"conv height must be 1, got {h}"
    seq = np.ascontiguousarray(x[:, :, 0, :].transpose(2, 0, 1))
    tape.append(("toseq", (b, c, wd), None))

    r, cl = G.bilstm_fwd(seq, w, "rnn.0.rnn")
    tape.append(("bilstm", "rnn.0.rnn", cl))
    t, bb, hh = r.shape
    r, cl = G.linear_fwd(r.reshape(t * bb, hh),
                         w["rnn.0.embedding.weight"],
                         w["rnn.0.embedding.bias"])
    tape.append(("linear", ("rnn.0.embedding", t, bb), cl))
    r = r.reshape(t, bb, -1)
    r, cl = G.bilstm_fwd(r, w, "rnn.1.rnn")
    tape.append(("bilstm", "rnn.1.rnn", cl))
    t, bb, hh = r.shape
    out, cl = G.linear_fwd(r.reshape(t * bb, hh),
                           w["rnn.1.embedding.weight"],
                           w["rnn.1.embedding.bias"])
    tape.append(("linear", ("rnn.1.embedding", t, bb), cl))
    return out.reshape(t, bb, -1), tape


def crnn_loss_and_grads(x: np.ndarray, w: dict, target: np.ndarray):
    """One CRNN training step's math: forward (training-mode BN),
    CTC loss of log_softmax(logits) for the B=1 sequence, and
    d(loss)/d(every weight).  Returns (loss, grads)."""
    logits, tape = crnn_forward_tape(x, w)
    T, B, K = logits.shape
    assert B == 1
    y = logits[:, 0, :].astype(np.float64)
    m = y.max(axis=1, keepdims=True)
    lse = m + np.log(np.exp(y - m).sum(axis=1, keepdims=True))
    lsm = y - lse
    loss, dlsm = ctc_loss_grad(lsm, target)
    # log_softmax backward: dy = dlsm - softmax * sum_k dlsm_k
    sm = np.exp(lsm)
    dy = dlsm - sm * dlsm.sum(axis=1, keepdims=True)
    g = dy[:, None, :]

    grads: dict[str, np.ndarray] = {}
    for kind, meta, cache in reversed(tape):
        if kind == "linear":
            name, t, bb = meta
            g, gw, gb = G.linear_bwd(
                g.reshape(t * bb, g.shape[-1]), cache)
            grads[f"{name}.weight"] = gw
            grads[f"{name}.bias"] = gb
            g = g.reshape(t, bb, -1)
        elif kind == "bilstm":
            g, glstm = G.bilstm_bwd(g, cache)
            grads.update(glstm)
        elif kind == "toseq":
            b, c, wd = meta
            g = np.ascontiguousarray(
                g.transpose(1, 2, 0))[:, :, None, :]
        elif kind == "relu":
            g = G.relu_bwd(g, cache)
        elif kind == "bn":
            g, gg, gb = G.batchnorm2d_train_bwd(g, cache)
            grads[f"{meta}.weight"] = gg
            grads[f"{meta}.bias"] = gb
        elif kind == "pool":
            g = G.maxpool2d_bwd(g, cache)
        elif kind == "conv":
            g, gw, gb = G.conv2d_bwd(g, cache)
            grads[f"{meta}.weight"] = gw
            grads[f"{meta}.bias"] = gb
    return loss, grads
