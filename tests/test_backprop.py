"""End-to-end CTPN backprop (models/backprop.py).

1. Loss-gradient gradcheck: rpn_cls OHEM and rpn_regr smooth-L1 grads
   vs central finite differences.
2. Whole-network gradcheck: d(loss_cls+loss_regr)/d(weights) through
   VGG→RPN→BiGRU→heads vs FD at sampled parameter entries (full FD
   over millions of weights is infeasible; sampling is the standard
   gradcheck for deep nets).
3. The reference fine-tune step (ctpn_train.py:84-110): 3 SGD+momentum
   steps through models/training.py's loop on a synthetic GT fixture
   must monotonically decrease the total loss.
"""

import numpy as np
import pytest

from ocr_pytorch_spark.models import backprop as BP
from ocr_pytorch_spark.models import losses as L
from ocr_pytorch_spark.models.ctpn import _VGG_LAYERS, ctpn_forward

RNG = np.random.default_rng(7)


def _small_ctpn_weights(dtype=np.float64, scale=0.1, rng=None):
    """Real CTPN layer names/shapes (weights.gen_ctpn_weights'
    contract), random small values."""
    RNG = rng if rng is not None else globals()["RNG"]
    w = {}
    for layer in _VGG_LAYERS:
        if layer[0] == "pool":
            continue
        idx, cin, cout = layer
        w[f"base_layers.{idx}.weight"] = \
            RNG.standard_normal((cout, cin, 3, 3)).astype(dtype) * scale
        w[f"base_layers.{idx}.bias"] = \
            RNG.standard_normal(cout).astype(dtype) * scale
    w["rpn.conv.weight"] = \
        RNG.standard_normal((512, 512, 3, 3)).astype(dtype) * scale
    w["rpn.conv.bias"] = RNG.standard_normal(512).astype(dtype) * scale
    for d, pref in ((0, ""), (1, "_reverse")):
        w[f"brnn.weight_ih_l0{pref}"] = \
            RNG.standard_normal((384, 512)).astype(dtype) * scale
        w[f"brnn.weight_hh_l0{pref}"] = \
            RNG.standard_normal((384, 128)).astype(dtype) * scale
        w[f"brnn.bias_ih_l0{pref}"] = \
            RNG.standard_normal(384).astype(dtype) * scale
        w[f"brnn.bias_hh_l0{pref}"] = \
            RNG.standard_normal(384).astype(dtype) * scale
    w["lstm_fc.conv.weight"] = \
        RNG.standard_normal((512, 256, 1, 1)).astype(dtype) * scale
    w["lstm_fc.conv.bias"] = \
        RNG.standard_normal(512).astype(dtype) * scale
    w["rpn_class.conv.weight"] = \
        RNG.standard_normal((20, 512, 1, 1)).astype(dtype) * scale
    w["rpn_class.conv.bias"] = \
        RNG.standard_normal(20).astype(dtype) * scale
    w["rpn_regress.conv.weight"] = \
        RNG.standard_normal((20, 512, 1, 1)).astype(dtype) * scale
    w["rpn_regress.conv.bias"] = \
        RNG.standard_normal(20).astype(dtype) * scale
    return w


def _gt(n_anchors):
    gt_cls = RNG.choice([-1, 0, 1], size=n_anchors,
                        p=[0.3, 0.5, 0.2]).astype(np.float64)
    gt_regr = np.zeros((n_anchors, 3))
    gt_regr[:, 0] = gt_cls
    gt_regr[:, 1:] = RNG.standard_normal((n_anchors, 2))
    return gt_cls, gt_regr


def test_cls_loss_grad_matches_fd():
    pred = RNG.standard_normal((40, 2))
    gt_cls, _ = _gt(40)
    loss, gp = BP.rpn_cls_loss_grad(pred, gt_cls, total_num=30)
    assert loss == pytest.approx(
        L.rpn_cls_loss(pred, gt_cls, total_num=30))
    eps = 1e-6
    flat = pred.reshape(-1)
    for i in RNG.choice(flat.size, 20, replace=False):
        old = flat[i]
        flat[i] = old + eps
        lp = L.rpn_cls_loss(pred, gt_cls, total_num=30)
        flat[i] = old - eps
        lm = L.rpn_cls_loss(pred, gt_cls, total_num=30)
        flat[i] = old
        assert gp.reshape(-1)[i] == pytest.approx(
            (lp - lm) / (2 * eps), abs=1e-6)


def test_regr_loss_grad_matches_fd():
    pred = RNG.standard_normal((40, 2))
    _, gt_regr = _gt(40)
    loss, gp = BP.rpn_regr_loss_grad(pred, gt_regr)
    assert loss == pytest.approx(L.rpn_regr_loss(pred, gt_regr))
    eps = 1e-6
    flat = pred.reshape(-1)
    for i in RNG.choice(flat.size, 20, replace=False):
        old = flat[i]
        flat[i] = old + eps
        lp = L.rpn_regr_loss(pred, gt_regr)
        flat[i] = old - eps
        lm = L.rpn_regr_loss(pred, gt_regr)
        flat[i] = old
        assert gp.reshape(-1)[i] == pytest.approx(
            (lp - lm) / (2 * eps), abs=1e-6)


def test_ctpn_backward_matches_fd_sampled():
    w = _small_ctpn_weights()
    x = RNG.standard_normal((1, 3, 32, 32))  # -> 2x2 feature, 40 anchors
    cls, regr, _ = BP.ctpn_forward_tape(x, w)
    ref_cls, ref_regr = ctpn_forward(
        x.astype(np.float32),
        {k: v.astype(np.float32) for k, v in w.items()})
    assert np.allclose(cls, ref_cls, atol=1e-3)  # fwd parity w/ nn path
    gt_cls, gt_regr = _gt(cls.shape[1])

    def total():
        c, r, _ = BP.ctpn_forward_tape(x, w)
        return (L.rpn_cls_loss(c[0], gt_cls, total_num=30)
                + L.rpn_regr_loss(r[0], gt_regr))

    # backprop defaults to RPN_TOTAL_NUM=300; the FD loss uses
    # total_num=30 for a denser OHEM selection, so the analytic side
    # is recomputed at the same setting by _analytic() below
    _lc, _lr, grads = BP.ctpn_loss_and_grads(x, w, gt_cls, gt_regr)
    assert set(grads) == set(w)

    eps = 1e-5
    # sample entries across representative tensors (first conv, a deep
    # conv, GRU input+hidden weights, heads, biases)
    for name in ["base_layers.0.weight", "base_layers.28.weight",
                 "rpn.conv.weight", "brnn.weight_ih_l0",
                 "brnn.weight_hh_l0_reverse", "lstm_fc.conv.weight",
                 "rpn_class.conv.weight", "rpn_regress.conv.bias"]:
        flat = w[name].reshape(-1)
        # grads at total_num=30 need a matching analytic run
        idxs = RNG.choice(flat.size, 3, replace=False)
        for i in idxs:
            old = flat[i]
            flat[i] = old + eps
            lp = total()
            flat[i] = old - eps
            lm = total()
            flat[i] = old
            fd = (lp - lm) / (2 * eps)
            # analytic grad at total_num=30
            an = _analytic(x, w, gt_cls, gt_regr)[name].reshape(-1)[i]
            assert an == pytest.approx(fd, abs=3e-5), (name, i, an, fd)


def _analytic(x, w, gt_cls, gt_regr):
    """ctpn_loss_and_grads at total_num=30 (matching the FD loss)."""
    return BP.ctpn_loss_and_grads(x, w, gt_cls, gt_regr,
                                  total_num=30)[2]


def test_finetune_three_sgd_steps_decreases_loss():
    """The VERDICT r3 task-4 'done' bar: 3 SGD steps of the real CTPN
    loss through models/training.py's loop on a synthetic GT fixture,
    loss strictly decreasing."""
    from ocr_pytorch_spark.models.training import SGD, train_loop

    w = _small_ctpn_weights(scale=0.05)
    x = RNG.standard_normal((1, 3, 32, 48))
    n_anchors = (32 // 16) * (48 // 16) * 10
    gt_cls, gt_regr = _gt(n_anchors)

    def grad_fn(params, _batch):
        lc, lr_, grads = BP.ctpn_loss_and_grads(
            x, params, gt_cls, gt_regr)
        return grads, lc, lr_

    out = train_loop(dict(w), [None], grad_fn, SGD(momentum=0.9),
                     epochs=4, lr0=5e-3, step_size=10)
    totals = [t for (_c, _r, t) in out["epoch_losses"]]
    assert len(totals) == 3
    assert totals[1] < totals[0] and totals[2] < totals[1], totals


# --- CRNN: CTC gradient + full-network backprop -------------------------

def test_ctc_loss_grad_matches_fd():
    T, K = 8, 5
    logits = RNG.standard_normal((T, K))
    lp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    target = np.array([1, 2, 2, 3])
    loss, g = BP.ctc_loss_grad(lp, target)
    assert loss == pytest.approx(L.ctc_loss(lp, target))
    eps = 1e-6
    flat = lp.reshape(-1)
    for i in range(flat.size):
        old = flat[i]
        flat[i] = old + eps
        fp = L.ctc_loss(lp, target)
        flat[i] = old - eps
        fm = L.ctc_loss(lp, target)
        flat[i] = old
        assert g.reshape(-1)[i] == pytest.approx(
            (fp - fm) / (2 * eps), abs=1e-5)


def test_ctc_loss_grad_impossible_alignment():
    lp = RNG.standard_normal((2, 5))
    loss, g = BP.ctc_loss_grad(lp, np.array([1, 2, 3]))  # S=7 > 2T+1
    assert loss == 0.0 and not g.any()


def _small_crnn_weights(dtype=np.float64, scale=0.1, nclass=12,
                        rng=None):
    RNG = rng if rng is not None else np.random.default_rng(11)
    w = {}
    convs = [("conv1", 1, 64, 3), ("conv2", 64, 128, 3),
             ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
             ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
             ("conv5", 512, 512, 2)]
    for name, cin, cout, k in convs:
        w[f"{name}.weight"] = \
            RNG.standard_normal((cout, cin, k, k)).astype(dtype) * scale
        w[f"{name}.bias"] = \
            RNG.standard_normal(cout).astype(dtype) * scale
    for bn, ch in [("bn3", 256), ("bn4", 512), ("bn5", 512)]:
        w[f"{bn}.weight"] = \
            1.0 + RNG.standard_normal(ch).astype(dtype) * 0.02
        w[f"{bn}.bias"] = RNG.standard_normal(ch).astype(dtype) * 0.02
    for prefix, I in (("rnn.0.rnn", 512), ("rnn.1.rnn", 256)):
        for suf in ("", "_reverse"):
            w[f"{prefix}.weight_ih_l0{suf}"] = \
                RNG.standard_normal((512, I)).astype(dtype) * scale
            w[f"{prefix}.weight_hh_l0{suf}"] = \
                RNG.standard_normal((512, 128)).astype(dtype) * scale
            w[f"{prefix}.bias_ih_l0{suf}"] = \
                RNG.standard_normal(512).astype(dtype) * scale
            w[f"{prefix}.bias_hh_l0{suf}"] = \
                RNG.standard_normal(512).astype(dtype) * scale
    w["rnn.0.embedding.weight"] = \
        RNG.standard_normal((256, 256)).astype(dtype) * scale
    w["rnn.0.embedding.bias"] = \
        RNG.standard_normal(256).astype(dtype) * scale
    w["rnn.1.embedding.weight"] = \
        RNG.standard_normal((nclass, 256)).astype(dtype) * scale
    w["rnn.1.embedding.bias"] = \
        RNG.standard_normal(nclass).astype(dtype) * scale
    return w


def _crnn_loss(x, w, target):
    logits, _ = BP.crnn_forward_tape(x, w)
    y = logits[:, 0, :].astype(np.float64)
    lse = np.log(np.exp(y - y.max(axis=1, keepdims=True))
                 .sum(axis=1, keepdims=True)) + y.max(axis=1,
                                                      keepdims=True)
    from ocr_pytorch_spark.models.losses import ctc_loss
    return ctc_loss(y - lse, target)


def test_crnn_backward_matches_fd_sampled():
    # own RNG: module-global state would make the FD sampling depend
    # on test order
    rng = np.random.default_rng(11)
    w = _small_crnn_weights(rng=rng)
    x = rng.standard_normal((1, 1, 32, 24))  # T = 24/4 + 1 = 7
    target = np.array([3, 1, 4])
    loss, grads = BP.crnn_loss_and_grads(x, w, target)
    assert loss == pytest.approx(_crnn_loss(x, w, target))
    assert set(grads) == {k for k in w if "running" not in k}
    eps = 1e-5
    for name in ["conv1.weight", "conv5.weight", "bn3.weight",
                 "bn5.bias", "rnn.0.rnn.weight_ih_l0",
                 "rnn.1.rnn.weight_hh_l0_reverse",
                 "rnn.0.embedding.weight", "rnn.1.embedding.bias"]:
        flat = w[name].reshape(-1)
        for i in rng.choice(flat.size, 3, replace=False):
            old = flat[i]
            flat[i] = old + eps
            fp = _crnn_loss(x, w, target)
            flat[i] = old - eps
            fm = _crnn_loss(x, w, target)
            flat[i] = old
            fd = (fp - fm) / (2 * eps)
            an = grads[name].reshape(-1)[i]
            # abs + rel: FD truncation error grows with curvature
            assert abs(an - fd) <= 3e-5 + 1e-3 * abs(fd), \
                (name, i, an, fd)


def test_crnn_finetune_adam_decreases_loss():
    """The CRNN side of the reference training surface
    (train_pytorch_ctc.py:113-139, Adam): 3 steps on one sequence,
    strictly decreasing CTC loss."""
    from ocr_pytorch_spark.models.training import Adam

    rng = np.random.default_rng(13)
    w = _small_crnn_weights(scale=0.05, rng=rng)
    x = rng.standard_normal((1, 1, 32, 24))
    target = np.array([5, 2, 7])
    opt = Adam(lr=1e-3)
    losses = []
    for _ in range(4):
        loss, grads = BP.crnn_loss_and_grads(x, w, target)
        losses.append(loss)
        opt.step(w, grads)
    assert losses[1] < losses[0] and losses[2] < losses[1] \
        and losses[3] < losses[2], losses
