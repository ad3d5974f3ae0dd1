"""Data-parallel fine-tuning (models/distributed_training.py).

Proves (a) the treeAggregate mean gradient equals the serial mean to
float-reorder tolerance, (b) losses are identical to the serial loop,
and (c) the distributed epoch loop decreases the real CTPN loss.
"""

import numpy as np
import pytest

from ocr_pytorch_spark.models import backprop as BP
from ocr_pytorch_spark.models import distributed_training as DT
from ocr_pytorch_spark.models.training import SGD

from tests.test_backprop import _small_ctpn_weights


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(23)
    out = []
    for _ in range(6):
        x = rng.standard_normal((1, 3, 32, 32))
        n_anchors = (32 // 16) * (32 // 16) * 10
        gt_cls = rng.choice([-1, 0, 1], size=n_anchors,
                            p=[0.3, 0.5, 0.2]).astype(np.float64)
        gt_regr = np.zeros((n_anchors, 3))
        gt_regr[:, 0] = gt_cls
        gt_regr[:, 1:] = rng.standard_normal((n_anchors, 2))
        out.append((x, gt_cls, gt_regr))
    return out


def test_distributed_grads_match_serial(spark, samples):
    w = _small_ctpn_weights(scale=0.05, rng=np.random.default_rng(29))
    lc_d, lr_d, g_d = DT.distributed_ctpn_grads(
        spark.sparkContext, samples, w, total_num=30)

    sums = None
    lc_s = lr_s = 0.0
    for x, gt_cls, gt_regr in samples:
        lc, lr_, g = BP.ctpn_loss_and_grads(x, w, gt_cls, gt_regr,
                                            total_num=30)
        lc_s += lc
        lr_s += lr_
        sums = g if sums is None else {
            k: sums[k] + g[k] for k in g}
    n = len(samples)
    assert lc_d == pytest.approx(lc_s / n, rel=1e-12)
    assert lr_d == pytest.approx(lr_s / n, rel=1e-12)
    assert set(g_d) == set(sums)
    for k in sums:
        np.testing.assert_allclose(g_d[k], sums[k] / n,
                                   rtol=1e-9, atol=1e-12)


def test_distributed_epoch_loop_decreases_loss(spark, samples):
    w = _small_ctpn_weights(scale=0.05, rng=np.random.default_rng(31))
    out = DT.train_ctpn_distributed(
        spark, samples, w, SGD(momentum=0.9),
        epochs=3, lr0=5e-3, total_num=30)
    totals = [t for (_c, _r, t) in out["epoch_losses"]]
    assert len(totals) == 3
    assert totals[1] < totals[0] and totals[2] < totals[1], totals


def test_distributed_crnn_grads_match_serial(spark):
    from tests.test_backprop import _small_crnn_weights

    rng = np.random.default_rng(37)
    w = _small_crnn_weights(scale=0.05, rng=rng)
    samples = [(rng.standard_normal((1, 1, 32, 24)),
                rng.integers(1, 10, size=3)) for _ in range(4)]
    loss_d, g_d = DT.distributed_crnn_grads(
        spark.sparkContext, samples, w)
    sums, loss_s = None, 0.0
    for x, tgt in samples:
        loss, g = BP.crnn_loss_and_grads(x, w, tgt)
        loss_s += loss
        sums = g if sums is None else {k: sums[k] + g[k] for k in g}
    n = len(samples)
    assert loss_d == pytest.approx(loss_s / n, rel=1e-12)
    for k in sums:
        np.testing.assert_allclose(g_d[k], sums[k] / n,
                                   rtol=1e-9, atol=1e-12)
