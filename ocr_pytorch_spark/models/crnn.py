"""CRNN recognition: conv stack + 2x BiLSTM forward, resize-normalize
preprocessing, greedy CTC decode.

Reproduces, in deterministic NumPy:
* CRNN forward — recognize/crnn.py:22-83 (7 convs w/ BN on 3_1-head, 4_1-head
  and 5, pools 2x2/2, 2x2/2, (2,2)/(2,1)/p(0,1) x2, final 2x2 valid conv ->
  (B,512,1,T); 2x BidirectionalLSTM 512->256->256->nclass with Linear
  embeddings, seq-first);
* resizeNormalize — recognize/crnn_recognizer.py:14-40 (LANCZOS to
  (int(w/h*32), 32), /255, (x-0.5)/0.5, is_test zero-pad-at-0 branch);
* recognize() — recognize/crnn_recognizer.py:117-138 (gray, resize,
  forward, argmax over classes, CTC collapse, strip).
"""

from __future__ import annotations

import numpy as np

from ocr_pytorch_spark import config as C
from ocr_pytorch_spark.kernels import (
    batchnorm2d, bilstm, conv2d, grayscale_bgr, linear, maxpool2d,
    resize_lanczos,
)
from ocr_pytorch_spark.kernels.nn import relu_
from ocr_pytorch_spark.models.alphabet import (alphabet_for_nclass,
                                               ctc_collapse)


def _bn(x, w, name):
    return batchnorm2d(x, w[f"{name}.weight"], w[f"{name}.bias"],
                       w[f"{name}.running_mean"], w[f"{name}.running_var"])


def crnn_forward(x: np.ndarray, w: dict) -> np.ndarray:
    """x: (B,1,32,W) float32 in [-1,1] -> logits (T,B,nclass), T=W/4+1."""
    def cv(x, name, k=3, s=1, p=1, relu=False):
        return conv2d(x, w[f"{name}.weight"], w[f"{name}.bias"], s, p,
                      relu=relu)

    x = maxpool2d(cv(x, "conv1", relu=True), 2, 2)
    x = maxpool2d(cv(x, "conv2", relu=True), 2, 2)
    x = relu_(_bn(cv(x, "conv3_1"), w, "bn3"))
    x = maxpool2d(cv(x, "conv3_2", relu=True), (2, 2), (2, 1), (0, 1))
    x = relu_(_bn(cv(x, "conv4_1"), w, "bn4"))
    x = maxpool2d(cv(x, "conv4_2", relu=True), (2, 2), (2, 1), (0, 1))
    x = relu_(_bn(conv2d(x, w["conv5.weight"], w["conv5.bias"], 1, 0),
                  w, "bn5"))
    b, c, h, wd = x.shape
    assert h == 1, f"conv height must be 1, got {h}"
    seq = x[:, :, 0, :].transpose(2, 0, 1)  # (T,B,C)

    r = bilstm(seq, w, "rnn.0.rnn")
    t, bb, hh = r.shape
    r = linear(r.reshape(t * bb, hh), w["rnn.0.embedding.weight"],
               w["rnn.0.embedding.bias"]).reshape(t, bb, -1)
    r = bilstm(r, w, "rnn.1.rnn")
    t, bb, hh = r.shape
    out = linear(r.reshape(t * bb, hh), w["rnn.1.embedding.weight"],
                 w["rnn.1.embedding.bias"]).reshape(t, bb, -1)
    return out


def resize_normalize(gray: np.ndarray, target_w: int,
                     target_h: int = C.CRNN_IMG_H) -> np.ndarray:
    """(h0,w0) uint8 -> (1,target_h,target_w) float32 in [-1,1]
    (recognize/crnn_recognizer.py:14-40, is_test=True so pad start=0)."""
    h0, w0 = gray.shape
    if target_w <= (w0 / h0 * target_h):
        img = resize_lanczos(gray, target_h, target_w)
        out = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    else:
        w_real = int(w0 / h0 * target_h)
        img = resize_lanczos(gray, target_h, max(w_real, 1))
        norm = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
        out = np.zeros((target_h, target_w), dtype=np.float32)
        out[:, :norm.shape[1]] = norm
    return out[None, :, :]


def recognize(img: np.ndarray, weights: dict) -> str:
    """One (h,w[,3]) uint8 crop -> transcript
    (recognize/crnn_recognizer.py:117-138)."""
    h, w = img.shape[:2]
    if img.ndim == 3:
        img = grayscale_bgr(img)
    target_w = int(w / h * C.CRNN_IMG_H)
    if target_w < 1:
        return ""
    x = resize_normalize(img, target_w)[None, :, :, :]  # (1,1,32,W)
    if x.shape[3] < 4:  # conv stack needs >=4 px of width to reach T>=1
        return ""
    preds = crnn_forward(x, weights)  # (T,1,nclass)
    codes = preds.argmax(axis=2)[:, 0]  # argmax over classes, B=1
    # alphabet keyed off the head size: fixture (96) or full reference
    # alphabet (5835, recognize/keys.py:21-23) — real checkpoints
    # decode CJK with zero configuration
    alphabet = alphabet_for_nclass(preds.shape[2])
    return ctc_collapse(codes, alphabet).strip()
