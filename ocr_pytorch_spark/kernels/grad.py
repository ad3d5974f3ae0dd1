"""Backward passes for the inference kernels in :mod:`kernels.nn`.

The reference trains CTPN and CRNN end-to-end with torch autograd
(train_code/train_ctpn/ctpn_train.py:84-110 ``loss.backward()``;
train_code/train_crnn/train_pytorch_ctc.py:140-160).  These are the
hand-derived gradients of the exact forward semantics in
``kernels/nn.py`` — conv2d (im2col+GEMM), maxpool2d, training-mode
batchnorm2d, linear, GRU and LSTM directions (torch gate orders) —
so the optimizer/scheduler/checkpoint-gate loop in
``models/training.py`` can drive a *real* fine-tune step instead of a
toy ``grad_fn`` (VERDICT r3 task 4).

Design:
* each op has ``X_fwd(...)-> (out, cache)`` and ``X_bwd(gout, cache)``;
  caches hold only what the math needs.
* dtype-agnostic: tests run float64 for central-difference gradcheck
  (float32 FD is too noisy); training runs float32.
* clarity over tile-blocking — training is not the 100 TB hot path
  (extraction is inference-only); these run driver-side or in a
  per-executor fine-tune UDF on small batches.
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import as_strided

from ocr_pytorch_spark.kernels.nn import _pair, sigmoid


# --- conv2d -------------------------------------------------------------

def conv2d_fwd(x, w, b, stride=1, padding=0, relu=False):
    """Same semantics as nn.conv2d (cross-correlation, NCHW/OIHW)."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    xp = x
    if ph or pw:
        xp = np.zeros((B, C, H + 2 * ph, W + 2 * pw), dtype=x.dtype)
        xp[:, :, ph:ph + H, pw:pw + W] = x
    Hp, Wp = xp.shape[2], xp.shape[3]
    oh = (Hp - kh) // sh + 1
    ow = (Wp - kw) // sw + 1
    s = xp.strides
    cols = np.ascontiguousarray(as_strided(
        xp, shape=(B, C, kh, kw, oh, ow),
        strides=(s[0], s[1], s[2], s[3], s[2] * sh, s[3] * sw),
        writeable=False).transpose(1, 2, 3, 0, 4, 5))
    K = C * kh * kw
    out2d = w.reshape(O, K) @ cols.reshape(K, B * oh * ow)
    out = out2d.reshape(O, B, oh, ow).transpose(1, 0, 2, 3)
    if b is not None:
        out = out + b.reshape(1, O, 1, 1)
    if relu:
        out = np.maximum(out, 0.0)
    cache = (cols, w, (B, C, H, W), (sh, sw), (ph, pw), b is not None,
             relu, out if relu else None)
    return np.ascontiguousarray(out), cache


def conv2d_bwd(gout, cache):
    """-> (gx, gw, gb); gb is None when the forward had no bias."""
    cols, w, xshape, (sh, sw), (ph, pw), has_b, relu, out = cache
    if relu:
        gout = gout * (out > 0)
    B, C, H, W = xshape
    O, _, kh, kw = w.shape
    _, _, _, _, oh, ow = cols.shape
    K = C * kh * kw
    g2d = gout.transpose(1, 0, 2, 3).reshape(O, B * oh * ow)
    gw = (g2d @ cols.reshape(K, B * oh * ow).T).reshape(w.shape)
    gb = gout.sum(axis=(0, 2, 3)) if has_b else None
    gcols = (w.reshape(O, K).T @ g2d).reshape(C, kh, kw, B, oh, ow)
    gxp = np.zeros((B, C, H + 2 * ph, W + 2 * pw), dtype=gout.dtype)
    for i in range(kh):
        for j in range(kw):
            gxp[:, :, i:i + oh * sh:sh, j:j + ow * sw:sw] += \
                gcols[:, i, j].transpose(1, 0, 2, 3)
    gx = gxp[:, :, ph:ph + H, pw:pw + W] if (ph or pw) else gxp
    return gx, gw, gb


# --- maxpool2d ----------------------------------------------------------

def maxpool2d_fwd(x, kernel, stride=None, padding=0):
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    xp = x
    if ph or pw:
        xp = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)),
                    constant_values=-np.inf)
    B, C, Hp, Wp = xp.shape
    oh = (Hp - kh) // sh + 1
    ow = (Wp - kw) // sw + 1
    s = xp.strides
    win = as_strided(xp, shape=(B, C, oh, ow, kh, kw),
                     strides=(s[0], s[1], s[2] * sh, s[3] * sw,
                              s[2], s[3]), writeable=False)
    flat = win.reshape(B, C, oh, ow, kh * kw)
    am = flat.argmax(axis=4)
    out = np.take_along_axis(flat, am[..., None], axis=4)[..., 0]
    cache = (am, x.shape, (kh, kw), (sh, sw), (ph, pw))
    return out, cache


def maxpool2d_bwd(gout, cache):
    am, xshape, (kh, kw), (sh, sw), (ph, pw) = cache
    B, C, H, W = xshape
    gxp = np.zeros((B, C, H + 2 * ph, W + 2 * pw), dtype=gout.dtype)
    oh, ow = am.shape[2], am.shape[3]
    bi, ci, yi, xi = np.indices((B, C, oh, ow))
    ry = yi * sh + am // kw
    rx = xi * sw + am % kw
    # overlapping windows (stride < kernel) need scatter-ADD
    np.add.at(gxp, (bi, ci, ry, rx), gout)
    return gxp[:, :, ph:ph + H, pw:pw + W] if (ph or pw) else gxp


# --- batchnorm2d (training mode: batch statistics) ----------------------

def batchnorm2d_train_fwd(x, gamma, beta, eps: float = 1e-5):
    """Training-mode BN (torch nn.BatchNorm2d under .train()):
    normalizes by the BATCH mean/biased-variance over (B,H,W) per
    channel — the reference's CRNN training path."""
    mu = x.mean(axis=(0, 2, 3))
    var = x.var(axis=(0, 2, 3))  # biased, as torch normalizes
    inv = 1.0 / np.sqrt(var + eps)
    xhat = (x - mu.reshape(1, -1, 1, 1)) * inv.reshape(1, -1, 1, 1)
    out = gamma.reshape(1, -1, 1, 1) * xhat + beta.reshape(1, -1, 1, 1)
    return out, (xhat, inv, gamma, x.shape)


def batchnorm2d_train_bwd(gout, cache):
    xhat, inv, gamma, xshape = cache
    B, C, H, W = xshape
    m = B * H * W
    gg = (gout * xhat).sum(axis=(0, 2, 3))
    gb = gout.sum(axis=(0, 2, 3))
    gxhat = gout * gamma.reshape(1, -1, 1, 1)
    gx = (inv.reshape(1, -1, 1, 1) / m) * (
        m * gxhat
        - gxhat.sum(axis=(0, 2, 3), keepdims=True)
        - xhat * (gxhat * xhat).sum(axis=(0, 2, 3), keepdims=True))
    return gx, gg, gb


# --- linear -------------------------------------------------------------

def linear_fwd(x, w, b):
    out = x @ w.T
    if b is not None:
        out = out + b
    return out, (x, w, b is not None)


def linear_bwd(gout, cache):
    x, w, has_b = cache
    gx = gout @ w
    x2 = x.reshape(-1, x.shape[-1])
    g2 = gout.reshape(-1, gout.shape[-1])
    gw = g2.T @ x2
    gb = g2.sum(axis=0) if has_b else None
    return gx, gw, gb


# --- GRU (torch gate rows [r, z, n]; reset inside candidate) ------------

def gru_direction_fwd(x, w_ih, w_hh, b_ih, b_hh, reverse: bool):
    """Tape-keeping twin of nn._gru_direction.  x: (B,T,I)->(B,T,H)."""
    B, T, _ = x.shape
    H = w_hh.shape[1]
    xi = x @ w_ih.T + b_ih
    h = np.zeros((B, H), dtype=x.dtype)
    out = np.empty((B, T, H), dtype=x.dtype)
    steps = list(range(T - 1, -1, -1) if reverse else range(T))
    w_hr, w_hz, w_hn = w_hh[:H], w_hh[H:2 * H], w_hh[2 * H:]
    b_hr, b_hz, b_hn = b_hh[:H], b_hh[H:2 * H], b_hh[2 * H:]
    tape = {}
    for t in steps:
        g = xi[:, t]
        hn_lin = h @ w_hn.T + b_hn
        r = sigmoid(g[:, :H] + h @ w_hr.T + b_hr)
        z = sigmoid(g[:, H:2 * H] + h @ w_hz.T + b_hz)
        n = np.tanh(g[:, 2 * H:] + r * hn_lin)
        tape[t] = (h, r, z, n, hn_lin)
        h = (1.0 - z) * n + z * h
        out[:, t] = h
    cache = (x, w_ih, w_hh, steps, tape, H)
    return out, cache


def gru_direction_bwd(gout, cache):
    """-> (gx, gw_ih, gw_hh, gb_ih, gb_hh)."""
    x, w_ih, w_hh, steps, tape, H = cache
    B, T, _ = x.shape
    w_hr, w_hz, w_hn = w_hh[:H], w_hh[H:2 * H], w_hh[2 * H:]
    g_xi = np.zeros((B, T, 3 * H), dtype=gout.dtype)
    gw_hh = np.zeros_like(w_hh)
    gb_hh = np.zeros(3 * H, dtype=gout.dtype)
    gh = np.zeros((B, H), dtype=gout.dtype)
    for t in reversed(steps):
        gh = gh + gout[:, t]
        h_prev, r, z, n, hn_lin = tape[t]
        dn = gh * (1.0 - z)
        dz = gh * (h_prev - n)
        dh_prev = gh * z
        da_n = dn * (1.0 - n * n)
        dr = da_n * hn_lin
        d_hn_lin = da_n * r
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)
        g_xi[:, t, :H] = da_r
        g_xi[:, t, H:2 * H] = da_z
        g_xi[:, t, 2 * H:] = da_n
        gw_hh[:H] += da_r.T @ h_prev
        gw_hh[H:2 * H] += da_z.T @ h_prev
        gw_hh[2 * H:] += d_hn_lin.T @ h_prev
        gb_hh[:H] += da_r.sum(axis=0)
        gb_hh[H:2 * H] += da_z.sum(axis=0)
        gb_hh[2 * H:] += d_hn_lin.sum(axis=0)
        gh = dh_prev + da_r @ w_hr + da_z @ w_hz + d_hn_lin @ w_hn
    gx = g_xi @ w_ih
    gw_ih = g_xi.reshape(B * T, 3 * H).T @ x.reshape(B * T, -1)
    gb_ih = g_xi.sum(axis=(0, 1))
    return gx, gw_ih, gw_hh, gb_ih, gb_hh


def bigru_fwd(x, weights: dict, prefix: str):
    f_out, f_cache = gru_direction_fwd(
        x, weights[f"{prefix}.weight_ih_l0"],
        weights[f"{prefix}.weight_hh_l0"],
        weights[f"{prefix}.bias_ih_l0"],
        weights[f"{prefix}.bias_hh_l0"], reverse=False)
    b_out, b_cache = gru_direction_fwd(
        x, weights[f"{prefix}.weight_ih_l0_reverse"],
        weights[f"{prefix}.weight_hh_l0_reverse"],
        weights[f"{prefix}.bias_ih_l0_reverse"],
        weights[f"{prefix}.bias_hh_l0_reverse"], reverse=True)
    H = f_out.shape[2]
    return (np.concatenate([f_out, b_out], axis=2),
            (f_cache, b_cache, H, prefix))


def bigru_bwd(gout, cache):
    """-> (gx, {param_name: grad})."""
    f_cache, b_cache, H, prefix = cache
    gx_f, gwi_f, gwh_f, gbi_f, gbh_f = gru_direction_bwd(
        gout[:, :, :H], f_cache)
    gx_b, gwi_b, gwh_b, gbi_b, gbh_b = gru_direction_bwd(
        gout[:, :, H:], b_cache)
    grads = {
        f"{prefix}.weight_ih_l0": gwi_f,
        f"{prefix}.weight_hh_l0": gwh_f,
        f"{prefix}.bias_ih_l0": gbi_f,
        f"{prefix}.bias_hh_l0": gbh_f,
        f"{prefix}.weight_ih_l0_reverse": gwi_b,
        f"{prefix}.weight_hh_l0_reverse": gwh_b,
        f"{prefix}.bias_ih_l0_reverse": gbi_b,
        f"{prefix}.bias_hh_l0_reverse": gbh_b,
    }
    return gx_f + gx_b, grads


# --- relu ---------------------------------------------------------------

def relu_fwd(x):
    out = np.maximum(x, 0.0)
    return out, (out,)


def relu_bwd(gout, cache):
    (out,) = cache
    return gout * (out > 0)


# --- LSTM (torch gate rows [i, f, g, o]) --------------------------------

def lstm_direction_fwd(x, w_ih, w_hh, b_ih, b_hh, reverse: bool):
    """Tape-keeping twin of nn._lstm_direction.  x: (T,B,I)->(T,B,H)."""
    T, B, _ = x.shape
    H = w_hh.shape[1]
    xi = x @ w_ih.T + b_ih
    h = np.zeros((B, H), dtype=x.dtype)
    c = np.zeros((B, H), dtype=x.dtype)
    out = np.empty((T, B, H), dtype=x.dtype)
    steps = list(range(T - 1, -1, -1) if reverse else range(T))
    tape = {}
    for t in steps:
        g = xi[t] + h @ w_hh.T + b_hh
        i = sigmoid(g[:, :H])
        f = sigmoid(g[:, H:2 * H])
        gg = np.tanh(g[:, 2 * H:3 * H])
        o = sigmoid(g[:, 3 * H:])
        c_prev = c
        c = f * c + i * gg
        tc = np.tanh(c)
        tape[t] = (h, c_prev, i, f, gg, o, tc)
        h = o * tc
        out[t] = h
    return out, (x, w_ih, w_hh, steps, tape, H)


def lstm_direction_bwd(gout, cache):
    x, w_ih, w_hh, steps, tape, H = cache
    T, B, _ = x.shape
    ga_all = np.zeros((T, B, 4 * H), dtype=gout.dtype)
    gw_hh = np.zeros_like(w_hh)
    gh = np.zeros((B, H), dtype=gout.dtype)
    gc = np.zeros((B, H), dtype=gout.dtype)
    for t in reversed(steps):
        gh = gh + gout[t]
        h_prev, c_prev, i, f, gg, o, tc = tape[t]
        do = gh * tc
        gc = gc + gh * o * (1.0 - tc * tc)
        di = gc * gg
        df = gc * c_prev
        dgg = gc * i
        ga = np.concatenate([di * i * (1.0 - i), df * f * (1.0 - f),
                             dgg * (1.0 - gg * gg), do * o * (1.0 - o)],
                            axis=1)
        ga_all[t] = ga
        gw_hh += ga.T @ h_prev
        gh = ga @ w_hh
        gc = gc * f
    gx = ga_all @ w_ih
    gw_ih = ga_all.reshape(T * B, 4 * H).T @ x.reshape(T * B, -1)
    gb = ga_all.sum(axis=(0, 1))  # b_ih and b_hh enter identically
    return gx, gw_ih, gw_hh, gb, gb.copy()


def bilstm_fwd(x, weights: dict, prefix: str):
    """Tape-keeping twin of nn.bilstm (CRNN rnn, seq-first)."""
    f_out, f_cache = lstm_direction_fwd(
        x, weights[f"{prefix}.weight_ih_l0"],
        weights[f"{prefix}.weight_hh_l0"],
        weights[f"{prefix}.bias_ih_l0"],
        weights[f"{prefix}.bias_hh_l0"], reverse=False)
    b_out, b_cache = lstm_direction_fwd(
        x, weights[f"{prefix}.weight_ih_l0_reverse"],
        weights[f"{prefix}.weight_hh_l0_reverse"],
        weights[f"{prefix}.bias_ih_l0_reverse"],
        weights[f"{prefix}.bias_hh_l0_reverse"], reverse=True)
    H = f_out.shape[2]
    return (np.concatenate([f_out, b_out], axis=2),
            (f_cache, b_cache, H, prefix))


def bilstm_bwd(gout, cache):
    """-> (gx, {param_name: grad})."""
    f_cache, b_cache, H, prefix = cache
    gx_f, gwi_f, gwh_f, gbi_f, gbh_f = lstm_direction_bwd(
        gout[:, :, :H], f_cache)
    gx_b, gwi_b, gwh_b, gbi_b, gbh_b = lstm_direction_bwd(
        gout[:, :, H:], b_cache)
    grads = {
        f"{prefix}.weight_ih_l0": gwi_f,
        f"{prefix}.weight_hh_l0": gwh_f,
        f"{prefix}.bias_ih_l0": gbi_f,
        f"{prefix}.bias_hh_l0": gbh_f,
        f"{prefix}.weight_ih_l0_reverse": gwi_b,
        f"{prefix}.weight_hh_l0_reverse": gwh_b,
        f"{prefix}.bias_ih_l0_reverse": gbi_b,
        f"{prefix}.bias_hh_l0_reverse": gbh_b,
    }
    return gx_f + gx_b, grads
