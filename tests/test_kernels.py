"""Layer-1 kernel unit tests (SURVEY.md §5.2): each NumPy kernel against a
naive/direct or closed-form computation."""

import numpy as np
import pytest

from ocr_pytorch_spark.kernels import (
    batchnorm2d, bigru, bilstm, conv2d, grayscale_bgr, linear, maxpool2d,
    relu, resize_area, resize_lanczos, rotate_crop, sigmoid, softmax,
)

rng = np.random.default_rng(0)


def naive_conv2d(x, w, b, stride, pad):
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (pad, pad) if isinstance(pad, int) else pad
    x = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    oh, ow = (H - kh) // sh + 1, (W - kw) // sw + 1
    out = np.zeros((B, O, oh, ow), dtype=np.float64)
    for bi in range(B):
        for o in range(O):
            for i in range(oh):
                for j in range(ow):
                    patch = x[bi, :, i * sh:i * sh + kh, j * sw:j * sw + kw]
                    out[bi, o, i, j] = np.sum(patch * w[o])
    if b is not None:
        out += b.reshape(1, O, 1, 1)
    return out


def test_conv2d_matches_naive():
    x = rng.normal(size=(2, 3, 7, 9)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=4).astype(np.float32)
    got = conv2d(x, w, b, stride=1, padding=1)
    want = naive_conv2d(x, w, b, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got.shape == (2, 4, 7, 9)


def test_conv2d_stride_nopad():
    x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
    w = rng.normal(size=(3, 2, 2, 2)).astype(np.float32)
    got = conv2d(x, w, None, stride=2, padding=0)
    want = naive_conv2d(x, w, None, 2, 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got.shape == (1, 3, 4, 4)


def test_maxpool2d_basic_and_asymmetric():
    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    got = maxpool2d(x, 2, 2)
    np.testing.assert_array_equal(got[0, 0], [[5, 7], [13, 15]])
    # CRNN pool3 geometry: kernel (2,2), stride (2,1), pad (0,1)
    x = rng.normal(size=(1, 1, 4, 6)).astype(np.float32)
    got = maxpool2d(x, (2, 2), (2, 1), (0, 1))
    assert got.shape == (1, 1, 2, 7)
    # interior cell check
    assert got[0, 0, 0, 1] == x[0, 0, 0:2, 0:2].max()


def test_batchnorm2d_inference_formula():
    x = rng.normal(size=(1, 3, 2, 2)).astype(np.float32)
    g = np.array([1.0, 2.0, 0.5], np.float32)
    b = np.array([0.0, 1.0, -1.0], np.float32)
    m = np.array([0.1, -0.2, 0.3], np.float32)
    v = np.array([1.0, 4.0, 0.25], np.float32)
    got = batchnorm2d(x, g, b, m, v)
    want = g.reshape(1, 3, 1, 1) * (x - m.reshape(1, 3, 1, 1)) \
        / np.sqrt(v.reshape(1, 3, 1, 1) + 1e-5) + b.reshape(1, 3, 1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_activations():
    x = np.array([-800.0, -1.0, 0.0, 1.0, 800.0], np.float32)
    s = sigmoid(x)
    assert s[0] == 0.0 and s[-1] == 1.0 and abs(s[2] - 0.5) < 1e-7
    np.testing.assert_array_equal(relu(x), [0, 0, 0, 1, 800])
    p = softmax(np.array([[1.0, 1.0, 1.0]]), axis=-1)
    np.testing.assert_allclose(p, [[1 / 3] * 3], rtol=1e-6)


def test_linear():
    x = rng.normal(size=(5, 3)).astype(np.float32)
    w = rng.normal(size=(2, 3)).astype(np.float32)
    b = rng.normal(size=2).astype(np.float32)
    np.testing.assert_allclose(linear(x, w, b), x @ w.T + b, rtol=1e-5)


def _rnn_weights(gates, hidden, inp, seed=1):
    r = np.random.default_rng(seed)
    names = ["weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"]
    out = {}
    for suffix in ["", "_reverse"]:
        out[f"r.{names[0]}{suffix}"] = r.normal(
            size=(gates * hidden, inp)).astype(np.float32) * 0.1
        out[f"r.{names[1]}{suffix}"] = r.normal(
            size=(gates * hidden, hidden)).astype(np.float32) * 0.1
        out[f"r.{names[2]}{suffix}"] = r.normal(
            size=gates * hidden).astype(np.float32) * 0.1
        out[f"r.{names[3]}{suffix}"] = r.normal(
            size=gates * hidden).astype(np.float32) * 0.1
    return out


def test_gru_single_step_closed_form():
    """One timestep, h0=0: h1 = (1-z)*n with r,z,n from input proj only
    (torch GRU equations, gate order r,z,n)."""
    H, I = 4, 3
    w = _rnn_weights(3, H, I)
    x = rng.normal(size=(2, 1, I)).astype(np.float32)
    out = bigru(x, w, "r")
    g = x[:, 0] @ w["r.weight_ih_l0"].T + w["r.bias_ih_l0"]
    r_ = sigmoid(g[:, :H] + w["r.bias_hh_l0"][:H])
    z = sigmoid(g[:, H:2 * H] + w["r.bias_hh_l0"][H:2 * H])
    n = np.tanh(g[:, 2 * H:] + r_ * w["r.bias_hh_l0"][2 * H:])
    np.testing.assert_allclose(out[:, 0, :H], (1 - z) * n, rtol=1e-5,
                               atol=1e-6)


def test_lstm_single_step_closed_form():
    """One timestep, h0=c0=0: c1=i*g, h1=o*tanh(c1) (gate order i,f,g,o)."""
    H, I = 4, 3
    w = _rnn_weights(4, H, I)
    x = rng.normal(size=(1, 2, I)).astype(np.float32)  # (T,B,I)
    out = bilstm(x, w, "r")
    g = x[0] @ w["r.weight_ih_l0"].T + w["r.bias_ih_l0"] \
        + w["r.bias_hh_l0"]
    i = sigmoid(g[:, :H])
    gg = np.tanh(g[:, 2 * H:3 * H])
    o = sigmoid(g[:, 3 * H:])
    np.testing.assert_allclose(out[0, :, :H], o * np.tanh(i * gg),
                               rtol=1e-5, atol=1e-6)


def test_bidirectional_reverse_consistency():
    """Reversing the input sequence swaps fwd/bwd outputs."""
    w = _rnn_weights(4, 4, 3)
    # make reverse weights equal forward weights for a clean symmetry
    for n in ["weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"]:
        w[f"r.{n}_reverse"] = w[f"r.{n}"]
    x = rng.normal(size=(5, 1, 3)).astype(np.float32)
    out = bilstm(x, w, "r")
    out_rev = bilstm(x[::-1].copy(), w, "r")
    np.testing.assert_allclose(out[:, :, :4], out_rev[::-1, :, 4:],
                               rtol=1e-5, atol=1e-6)


def test_resize_area_exact_2x_downscale():
    img = np.array([[0, 2, 4, 6], [8, 10, 12, 14]], np.uint8)
    got = resize_area(img, 1, 2)
    np.testing.assert_array_equal(got, [[5, 9]])


def test_resize_area_identity_and_channels():
    img = rng.integers(0, 255, size=(6, 8, 3)).astype(np.uint8)
    np.testing.assert_array_equal(resize_area(img, 6, 8), img)


def test_resize_lanczos_identity_and_constant():
    img = np.full((8, 12), 77, np.uint8)
    assert (resize_lanczos(img, 4, 6) == 77).all()
    img = rng.integers(0, 255, size=(8, 12)).astype(np.uint8)
    np.testing.assert_array_equal(resize_lanczos(img, 8, 12), img)


def test_grayscale_bgr_weights():
    img = np.zeros((1, 1, 3), np.uint8)
    img[0, 0] = [100, 0, 0]
    assert grayscale_bgr(img)[0, 0] == round(0.114 * 100)
    img[0, 0] = [0, 0, 100]
    assert grayscale_bgr(img)[0, 0] == round(0.299 * 100)


def test_rotate_crop_zero_angle_is_slice():
    img = rng.integers(0, 255, size=(20, 30, 3)).astype(np.uint8)
    out = rotate_crop(img, 0.0, (5, 4), (25, 15))
    np.testing.assert_array_equal(out, img[4:15, 5:25])


def test_rotate_crop_small_angle_shape():
    img = np.full((20, 40, 3), 128, np.uint8)
    out = rotate_crop(img, 2.0, (2, 2), (38, 18))
    assert out.ndim == 3 and out.shape[0] > 0 and out.shape[1] > 0


@pytest.mark.parametrize("h,w", [(10, 20), (7, 13)])
def test_rotate_crop_deterministic(h, w):
    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    a = rotate_crop(img, 1.5, (1, 1), (w - 2, h - 2))
    b = rotate_crop(img, 1.5, (1, 1), (w - 2, h - 2))
    np.testing.assert_array_equal(a, b)
