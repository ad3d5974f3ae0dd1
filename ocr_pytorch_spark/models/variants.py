"""Model variants (SURVEY §2 M10) — the reference modules the demo
path never calls, rebuilt so the engine covers the full surface:

* ``crnn_v2_forward`` — recognize/crnn.py:86-160: BN after every conv,
  four pools, final BN, conv height 2 folded into channels
  (b, c*2, w) before the two BiLSTMs.
* ``crnn_res_forward`` — recognize/crnn.py:163-249: ResNet-style
  stem (basic_res_block pairs with 1x1-conv downsamples), AvgPool
  (2,2)/(2,1)/p(0,1), valid 2x2 conv to height 1, two BiLSTMs.
* ``ctpn_v2_forward`` — train_code/train_ctpn/ctpn_model_v2.py:119-162:
  the v1 trunk plus a 10-channel side-refinement head, returning
  (cls, regr, refi).
* ``rpn_cls_loss_ratio`` — ctpn_model_v2.py's RPN_Loss classification
  term: mean positive CE + mean of the top-(3 * n_pos) negative CEs.

Weights use torch state_dict names/shapes (gen_* mirrors
models/weights.py), so converted real checkpoints of these variants
load through models/checkpoint.pth_to_npz unchanged.
"""

from __future__ import annotations

import numpy as np

from ocr_pytorch_spark.kernels import batchnorm2d, bilstm, conv2d, linear
from ocr_pytorch_spark.kernels.nn import avgpool2d, maxpool2d, relu_
from ocr_pytorch_spark.models.alphabet import NCLASS
from ocr_pytorch_spark.models.ctpn import ctpn_forward
from ocr_pytorch_spark.models.weights import SEED, _conv, _rnn


def _cbr(x, w, conv, bn):
    """conv -> BN -> ReLU (crnn.py:143-146 call order)."""
    x = conv2d(x, w[f"{conv}.weight"], w[f"{conv}.bias"], 1, 1)
    x = batchnorm2d(x, w[f"{bn}.weight"], w[f"{bn}.bias"],
                    w[f"{bn}.running_mean"], w[f"{bn}.running_var"])
    return relu_(x)


def _rnn_head(seq, w):
    """two BidirectionalLSTM(…, nh, nclass) stages (crnn.py:137-139)."""
    r = bilstm(seq, w, "rnn.0.rnn")
    t, b, h = r.shape
    r = linear(r.reshape(t * b, h), w["rnn.0.embedding.weight"],
               w["rnn.0.embedding.bias"]).reshape(t, b, -1)
    r = bilstm(r, w, "rnn.1.rnn")
    t, b, h = r.shape
    return linear(r.reshape(t * b, h), w["rnn.1.embedding.weight"],
                  w["rnn.1.embedding.bias"]).reshape(t, b, -1)


def crnn_v2_forward(x: np.ndarray, w: dict) -> np.ndarray:
    """x: (B,1,32,W) -> logits (T,B,nclass) (crnn.py:142-160)."""
    x = _cbr(x, w, "conv1_1", "bn1_1")
    x = maxpool2d(_cbr(x, w, "conv1_2", "bn1_2"), 2, 2)
    x = _cbr(x, w, "conv2_1", "bn2_1")
    x = maxpool2d(_cbr(x, w, "conv2_2", "bn2_2"), 2, 2)
    x = _cbr(x, w, "conv3_1", "bn3_1")
    x = maxpool2d(_cbr(x, w, "conv3_2", "bn3_2"), (2, 2), (2, 1), (0, 1))
    x = _cbr(x, w, "conv4_1", "bn4_1")
    x = maxpool2d(_cbr(x, w, "conv4_2", "bn4_2"), (2, 2), (2, 1), (0, 1))
    x = batchnorm2d(x, w["bn5.weight"], w["bn5.bias"],
                    w["bn5.running_mean"], w["bn5.running_var"])
    b, c, h, wd = x.shape
    assert h == 2, f"conv height must be 2, got {h}"
    seq = x.reshape(b, c * h, wd).transpose(2, 0, 1)  # (w, b, c*2)
    return _rnn_head(seq, w)


# architecture constants of CRNN_res (crnn.py:205-218), not weights
_RES_STRIDES = {"res2_1": 2, "res3_1": 2, "res4_1": (2, 1)}


def _res_block(x, w, name):
    """basic_res_block (crnn.py:168-190): (conv-bn-relu-conv-bn) +
    residual (optionally 1x1-conv downsampled), then ReLU."""
    stride = _RES_STRIDES.get(name, 1)
    y = conv2d(x, w[f"{name}.group1.conv1.weight"], None, stride, 1)
    y = batchnorm2d(y, w[f"{name}.group1.bn1.weight"],
                    w[f"{name}.group1.bn1.bias"],
                    w[f"{name}.group1.bn1.running_mean"],
                    w[f"{name}.group1.bn1.running_var"])
    y = relu_(y)
    y = conv2d(y, w[f"{name}.group1.conv2.weight"], None, 1, 1)
    y = batchnorm2d(y, w[f"{name}.group1.bn2.weight"],
                    w[f"{name}.group1.bn2.bias"],
                    w[f"{name}.group1.bn2.running_mean"],
                    w[f"{name}.group1.bn2.running_var"])
    if f"{name}.downsample.0.weight" in w:
        r = conv2d(x, w[f"{name}.downsample.0.weight"], None, stride, 0)
        r = batchnorm2d(r, w[f"{name}.downsample.1.weight"],
                        w[f"{name}.downsample.1.bias"],
                        w[f"{name}.downsample.1.running_mean"],
                        w[f"{name}.downsample.1.running_var"])
    else:
        r = x
    return relu_(y + r)


def crnn_res_forward(x: np.ndarray, w: dict) -> np.ndarray:
    """x: (B,1,32,W) -> logits (T,B,nclass) (crnn.py:193-249)."""
    x = relu_(conv2d(x, w["conv1.weight"], w["conv1.bias"], 1, 1))
    x = _res_block(x, w, "res1")
    x = _res_block(_res_block(x, w, "res2_1"), w, "res2_2")
    x = _res_block(_res_block(_res_block(x, w, "res3_1"), w, "res3_2"),
                   w, "res3_3")
    x = _res_block(_res_block(_res_block(x, w, "res4_1"), w, "res4_2"),
                   w, "res4_3")
    x = avgpool2d(x, (2, 2), (2, 1), (0, 1))
    x = conv2d(x, w["conv5.weight"], w["conv5.bias"], 1, 0)
    x = batchnorm2d(x, w["bn5.weight"], w["bn5.bias"],
                    w["bn5.running_mean"], w["bn5.running_var"])
    x = relu_(x)
    b, c, h, wd = x.shape
    assert h == 1, f"conv height must be 1, got {h}"
    seq = x[:, :, 0, :].transpose(2, 0, 1)
    return _rnn_head(seq, w)


def ctpn_v2_forward(x: np.ndarray, w: dict):
    """(cls, regr, refi) — the v1 trunk plus the 10-channel
    side-refinement head (ctpn_model_v2.py:130,152,156-160).  The
    trunk (weights and math) is exactly ctpn_forward's; refi adds
    rpn_refiment.conv.{weight,bias} over the shared lstm_fc feature
    map."""
    cls, regr, feat = ctpn_forward(x, w, return_features=True)
    b, _, h, wd = feat.shape
    refi = conv2d(feat, w["rpn_refiment.conv.weight"],
                  w["rpn_refiment.conv.bias"])
    refi = refi.transpose(0, 2, 3, 1).reshape(b, h * wd * 10, 1)
    return cls, regr, refi


def rpn_cls_loss_ratio(pred: np.ndarray, target: np.ndarray,
                       pos_neg_ratio: int = 3) -> float:
    """ctpn_model_v2.py RPN_Loss classification term: mean positive CE
    + mean of the top-(ratio * n_pos) hardest negative CEs."""
    from ocr_pytorch_spark.models.losses import _log_softmax

    ce = -_log_softmax(pred.astype(np.float64))
    pos = target == 1
    neg = target == 0
    if not pos.any():
        return 0.0
    loss_pos = ce[pos, 1]
    loss_neg = np.sort(ce[neg, 0])[::-1]
    k = min(loss_neg.size, loss_pos.size * pos_neg_ratio)
    return float(loss_pos.mean()
                 + (loss_neg[:k].mean() if k else 0.0))


# --- seeded state_dict generators (shape contracts) -------------------

def gen_crnn_v2_weights(seed: int = SEED,
                        nclass: int = NCLASS) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed + 2)
    w: dict[str, np.ndarray] = {}
    convs = [("conv1_1", 1, 32), ("conv1_2", 32, 64),
             ("conv2_1", 64, 64), ("conv2_2", 64, 128),
             ("conv3_1", 128, 96), ("conv3_2", 96, 192),
             ("conv4_1", 192, 128), ("conv4_2", 128, 256)]
    for name, in_c, out_c in convs:
        cw, cb = _conv(rng, out_c, in_c, 3, 3)
        w[f"{name}.weight"], w[f"{name}.bias"] = cw, cb
        bn = "bn" + name[4:]
        w[f"{bn}.weight"] = np.ones(out_c, np.float32)
        w[f"{bn}.bias"] = np.zeros(out_c, np.float32)
        w[f"{bn}.running_mean"] = np.zeros(out_c, np.float32)
        w[f"{bn}.running_var"] = np.ones(out_c, np.float32)
    for k_, ch in [("bn5", 256)]:
        w[f"{k_}.weight"] = np.ones(ch, np.float32)
        w[f"{k_}.bias"] = np.zeros(ch, np.float32)
        w[f"{k_}.running_mean"] = np.zeros(ch, np.float32)
        w[f"{k_}.running_var"] = np.ones(ch, np.float32)
    _head(w, rng, nclass)
    return w


def _head(w, rng, nclass, inp: int = 512):
    for name, arr in _rnn(rng, 4, 256, inp).items():
        w[f"rnn.0.rnn.{name}"] = arr
    k = 1.0 / np.sqrt(inp)
    w["rnn.0.embedding.weight"] = rng.uniform(
        -k, k, size=(256, 512)).astype(np.float32)
    w["rnn.0.embedding.bias"] = rng.uniform(
        -k, k, size=(256,)).astype(np.float32)
    for name, arr in _rnn(rng, 4, 256, 256).items():
        w[f"rnn.1.rnn.{name}"] = arr
    w["rnn.1.embedding.weight"] = rng.uniform(
        -k, k, size=(nclass, 512)).astype(np.float32)
    w["rnn.1.embedding.bias"] = rng.uniform(
        -k, k, size=(nclass,)).astype(np.float32)


def gen_crnn_res_weights(seed: int = SEED,
                         nclass: int = NCLASS) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed + 3)
    w: dict[str, np.ndarray] = {}
    cw, cb = _conv(rng, 64, 1, 3, 3)
    w["conv1.weight"], w["conv1.bias"] = cw, cb

    def res(name, in_c, out_c, stride=1, down=False):
        for c_, (ci, co) in [("conv1", (in_c, out_c)),
                             ("conv2", (out_c, out_c))]:
            cw2, _ = _conv(rng, co, ci, 3, 3)
            w[f"{name}.group1.{c_}.weight"] = cw2
        for bn in ("bn1", "bn2"):
            w[f"{name}.group1.{bn}.weight"] = np.ones(out_c, np.float32)
            w[f"{name}.group1.{bn}.bias"] = np.zeros(out_c, np.float32)
            w[f"{name}.group1.{bn}.running_mean"] = \
                np.zeros(out_c, np.float32)
            w[f"{name}.group1.{bn}.running_var"] = \
                np.ones(out_c, np.float32)
        if down:
            dw, _ = _conv(rng, out_c, in_c, 1, 1)
            w[f"{name}.downsample.0.weight"] = dw
            w[f"{name}.downsample.1.weight"] = np.ones(out_c, np.float32)
            w[f"{name}.downsample.1.bias"] = np.zeros(out_c, np.float32)
            w[f"{name}.downsample.1.running_mean"] = \
                np.zeros(out_c, np.float32)
            w[f"{name}.downsample.1.running_var"] = \
                np.ones(out_c, np.float32)
        if stride != 1:
            w[f"{name}.__stride__"] = stride

    res("res1", 64, 64)
    res("res2_1", 64, 128, 2, down=True)
    res("res2_2", 128, 128)
    res("res3_1", 128, 256, 2, down=True)
    res("res3_2", 256, 256)
    res("res3_3", 256, 256)
    res("res4_1", 256, 512, (2, 1), down=True)
    res("res4_2", 512, 512)
    res("res4_3", 512, 512)
    cw, cb = _conv(rng, 512, 512, 2, 2)
    w["conv5.weight"], w["conv5.bias"] = cw, cb
    w["bn5.weight"] = np.ones(512, np.float32)
    w["bn5.bias"] = np.zeros(512, np.float32)
    w["bn5.running_mean"] = np.zeros(512, np.float32)
    w["bn5.running_var"] = np.ones(512, np.float32)
    _head(w, rng, nclass)
    return w
