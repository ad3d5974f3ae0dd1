"""Central-finite-difference gradcheck for kernels/grad.py.

Every backward is checked against (f(θ+e) − f(θ−e)) / 2e of the scalar
loss L = Σ out·R for a fixed random R, in float64 (float32 FD noise
would swamp the signal).  Forward parity with kernels/nn.py is also
asserted so the tapes compute the exact same function the inference
kernels do.
"""

import numpy as np
import pytest

from ocr_pytorch_spark.kernels import grad as G
from ocr_pytorch_spark.kernels import nn as NN

RNG = np.random.default_rng(42)
TOL = 1e-6


def _fd(f, x, eps=1e-6):
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        old = flat[i]
        flat[i] = old + eps
        lp = f()
        flat[i] = old - eps
        lm = f()
        flat[i] = old
        gf[i] = (lp - lm) / (2 * eps)
    return g


def _check(analytic, f, x, tol=TOL):
    num = _fd(f, x)
    scale = max(1.0, np.abs(num).max())
    assert np.abs(analytic - num).max() / scale < tol, \
        np.abs(analytic - num).max()


@pytest.mark.parametrize("stride,padding,relu,bias", [
    (1, 1, True, True), (2, 0, False, True), (1, 0, True, False),
])
def test_conv2d_grad(stride, padding, relu, bias):
    x = RNG.standard_normal((2, 3, 6, 7))
    w = RNG.standard_normal((4, 3, 3, 3))
    b = RNG.standard_normal(4) if bias else None
    out, cache = G.conv2d_fwd(x, w, b, stride, padding, relu)
    ref = NN.conv2d(x.astype(np.float32), w.astype(np.float32),
                    None if b is None else b.astype(np.float32),
                    stride, padding, relu)
    assert np.allclose(out, ref, atol=1e-4)
    R = RNG.standard_normal(out.shape)
    gx, gw, gb = G.conv2d_bwd(R, cache)

    def loss():
        return float((G.conv2d_fwd(x, w, b, stride, padding, relu)[0]
                      * R).sum())

    _check(gx, loss, x)
    _check(gw, loss, w)
    if bias:
        _check(gb, loss, b)


@pytest.mark.parametrize("kernel,stride,padding", [
    (2, 2, 0), (3, 2, 1), (2, 1, 0),   # incl. overlapping windows
])
def test_maxpool2d_grad(kernel, stride, padding):
    x = RNG.standard_normal((2, 3, 8, 9))
    out, cache = G.maxpool2d_fwd(x, kernel, stride, padding)
    ref = NN.maxpool2d(x, kernel, stride, padding)
    assert np.allclose(out, ref)
    R = RNG.standard_normal(out.shape)
    gx = G.maxpool2d_bwd(R, cache)

    def loss():
        return float((G.maxpool2d_fwd(x, kernel, stride, padding)[0]
                      * R).sum())

    # FD at an argmax tie would be invalid; random floats never tie
    _check(gx, loss, x)


def test_batchnorm2d_train_grad():
    x = RNG.standard_normal((3, 4, 5, 6))
    gamma = RNG.standard_normal(4) + 1.0
    beta = RNG.standard_normal(4)
    out, cache = G.batchnorm2d_train_fwd(x, gamma, beta)
    # torch-parity spot check: per-channel batch mean 0 / var 1
    xhat = (out - beta.reshape(1, -1, 1, 1)) / gamma.reshape(1, -1, 1, 1)
    assert np.allclose(xhat.mean(axis=(0, 2, 3)), 0, atol=1e-10)
    R = RNG.standard_normal(out.shape)
    gx, gg, gb = G.batchnorm2d_train_bwd(R, cache)

    def loss():
        return float((G.batchnorm2d_train_fwd(x, gamma, beta)[0]
                      * R).sum())

    _check(gx, loss, x, tol=1e-5)
    _check(gg, loss, gamma)
    _check(gb, loss, beta)


def test_linear_grad():
    x = RNG.standard_normal((3, 5, 4))
    w = RNG.standard_normal((6, 4))
    b = RNG.standard_normal(6)
    out, cache = G.linear_fwd(x, w, b)
    assert np.allclose(out, NN.linear(x, w, b))
    R = RNG.standard_normal(out.shape)
    gx, gw, gb = G.linear_bwd(R, cache)

    def loss():
        return float((G.linear_fwd(x, w, b)[0] * R).sum())

    _check(gx, loss, x)
    _check(gw, loss, w)
    _check(gb, loss, b)


def _gru_weights(I, H):
    return {
        "g.weight_ih_l0": RNG.standard_normal((3 * H, I)),
        "g.weight_hh_l0": RNG.standard_normal((3 * H, H)),
        "g.bias_ih_l0": RNG.standard_normal(3 * H),
        "g.bias_hh_l0": RNG.standard_normal(3 * H),
        "g.weight_ih_l0_reverse": RNG.standard_normal((3 * H, I)),
        "g.weight_hh_l0_reverse": RNG.standard_normal((3 * H, H)),
        "g.bias_ih_l0_reverse": RNG.standard_normal(3 * H),
        "g.bias_hh_l0_reverse": RNG.standard_normal(3 * H),
    }


def test_bigru_grad():
    I, H = 4, 3
    x = RNG.standard_normal((2, 5, I))
    w = _gru_weights(I, H)
    out, cache = G.bigru_fwd(x, w, "g")
    assert np.allclose(out, NN.bigru(x, w, "g"))
    R = RNG.standard_normal(out.shape)
    gx, grads = G.bigru_bwd(R, cache)

    def loss():
        return float((G.bigru_fwd(x, w, "g")[0] * R).sum())

    _check(gx, loss, x, tol=1e-5)
    for name in w:
        _check(grads[name], loss, w[name], tol=1e-5)


def test_lstm_grad():
    I, H = 4, 3
    x = RNG.standard_normal((5, 2, I))   # (T,B,I), CRNN layout
    w_ih = RNG.standard_normal((4 * H, I))
    w_hh = RNG.standard_normal((4 * H, H))
    b_ih = RNG.standard_normal(4 * H)
    b_hh = RNG.standard_normal(4 * H)
    out, cache = G.lstm_direction_fwd(x, w_ih, w_hh, b_ih, b_hh, False)
    ref = NN._lstm_direction(x, w_ih, w_hh, b_ih, b_hh, False)
    assert np.allclose(out, ref)
    R = RNG.standard_normal(out.shape)
    gx, gwi, gwh, gbi, gbh = G.lstm_direction_bwd(R, cache)

    def loss():
        return float((G.lstm_direction_fwd(
            x, w_ih, w_hh, b_ih, b_hh, False)[0] * R).sum())

    _check(gx, loss, x, tol=1e-5)
    _check(gwi, loss, w_ih, tol=1e-5)
    _check(gwh, loss, w_hh, tol=1e-5)
    _check(gbi, loss, b_ih, tol=1e-5)
    _check(gbh, loss, b_hh, tol=1e-5)
    # reverse direction too
    outr, cacher = G.lstm_direction_fwd(x, w_ih, w_hh, b_ih, b_hh, True)
    refr = NN._lstm_direction(x, w_ih, w_hh, b_ih, b_hh, True)
    assert np.allclose(outr, refr)
    Rr = RNG.standard_normal(outr.shape)
    gxr = G.lstm_direction_bwd(Rr, cacher)[0]

    def loss_r():
        return float((G.lstm_direction_fwd(
            x, w_ih, w_hh, b_ih, b_hh, True)[0] * Rr).sum())

    _check(gxr, loss_r, x, tol=1e-5)
