"""M10 variants: CRNN_v2, CRNN_res, CTPN v2 refi head + ratio OHEM.

Checks the structural contracts the reference modules assert
(crnn.py:152 'height of conv must be 2', :241 'must be 1'; T widths),
determinism, residual math, and torch state_dict naming so converted
real variant checkpoints load via models/checkpoint."""

import numpy as np
import pytest

from ocr_pytorch_spark.models import variants as V


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(123)


def test_crnn_v2_shapes_and_determinism(rng):
    w = V.gen_crnn_v2_weights()
    x = rng.normal(size=(2, 1, 32, 100)).astype(np.float32)
    out = V.crnn_v2_forward(x, w)
    # two 2x2/2 pools then two (2,1)-stride pools with p(0,1): W 100 ->
    # 50 -> 25 -> 26 -> 27; H 32 -> ... -> 2 (reference asserts h == 2)
    assert out.shape == (27, 2, 96)
    assert np.array_equal(out, V.crnn_v2_forward(x, w))


def test_crnn_res_shapes(rng):
    w = V.gen_crnn_res_weights()
    x = rng.normal(size=(1, 1, 32, 64)).astype(np.float32)
    out = V.crnn_res_forward(x, w)
    # strided res blocks: W 64 -> 32 -> 16 (res4 stride (2,1) keeps W)
    # -> avgpool p(0,1): 17 -> valid 2x2 conv: 16; H 32 -> 1
    assert out.shape == (16, 1, 96)


def test_res_block_residual_math(rng):
    """identity-weight block: zero group output => out = relu(x)."""
    w = V.gen_crnn_res_weights()
    name = "res1"
    for k in list(w):
        if k.startswith(f"{name}.group1.conv"):
            w[k] = np.zeros_like(w[k])
    # zero conv2 -> group output is bn2(0) = 0 => pure residual
    x = rng.normal(size=(1, 64, 8, 8)).astype(np.float32)
    from ocr_pytorch_spark.models.variants import _res_block

    out = _res_block(x.copy(), w, name)
    assert np.allclose(out, np.maximum(x, 0), atol=1e-6)


def test_ctpn_v2_refi_head(rng, bundled_weights):
    from ocr_pytorch_spark.models.weights import _conv

    ctpn_w, _ = bundled_weights
    w = dict(ctpn_w)
    g = np.random.default_rng(5)
    cw, cb = _conv(g, 10, 512, 1, 1)
    w["rpn_refiment.conv.weight"], w["rpn_refiment.conv.bias"] = cw, cb
    x = rng.normal(size=(1, 3, 48, 64)).astype(np.float32)
    cls, regr, refi = V.ctpn_v2_forward(x, w)
    n = (48 // 16) * (64 // 16) * 10
    assert cls.shape == (1, n, 2)
    assert regr.shape == (1, n, 2)
    assert refi.shape == (1, n, 1)
    # the trunk is bit-identical to v1
    from ocr_pytorch_spark.models.ctpn import ctpn_forward

    cls1, regr1 = ctpn_forward(x, w)
    assert np.array_equal(cls, cls1) and np.array_equal(regr, regr1)


def test_rpn_cls_loss_ratio():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(50, 2))
    target = np.zeros(50)
    target[:4] = 1

    def softmax(z):
        e = np.exp(z - z.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    ce = -np.log(softmax(pred))
    want = ce[:4, 1].mean() + np.sort(ce[4:, 0])[::-1][:12].mean()
    assert np.isclose(V.rpn_cls_loss_ratio(pred, target), want)


