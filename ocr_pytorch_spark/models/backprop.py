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
    assert kind == "heads"
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
