"""Data-parallel CTPN/CRNN fine-tuning on Spark.

The reference trains single-process (train_code/train_ctpn/
ctpn_train.py epoch loop).  This module runs the SAME math — the
analytic gradients of models/backprop.py and the torch-exact
optimizers of models/training.py — data-parallel on a cluster:

* each executor computes per-sample gradients for its partition
  (weights arrive once per executor via ``SparkContext.broadcast``);
* gradients are summed with ``treeAggregate`` (log-depth combine: at
  1000 executors the driver receives O(tree fan-in) partial sums, not
  1000 full gradient sets);
* the driver applies ONE optimizer step per epoch on the averaged
  gradient and re-broadcasts — synchronous data-parallel SGD, the
  textbook large-batch equivalent of the reference's serial loop.

Float note: tree summation reorders float adds, so distributed grads
match the serial sum to ~1e-9 relative (float64), not bitwise; the
optimizer/scheduler/gate logic on top is bit-exact
(tests/test_distributed_training.py proves both statements).
"""

from __future__ import annotations

import numpy as np

from ocr_pytorch_spark.models import backprop as BP
from ocr_pytorch_spark.models.training import step_lr


def _zeros_like_params(params: dict) -> dict:
    return {k: np.zeros_like(v, dtype=np.float64)
            for k, v in params.items()}


def _add_into(acc: dict, extra: dict) -> dict:
    for k, v in extra.items():
        acc[k] = acc.get(k, 0.0) + v
    return acc


def _distributed_grads(sc, samples, params: dict, per_sample,
                       n_losses: int, depth: int = 2):
    """Mean gradient + mean losses over ``samples`` on the cluster.

    ``per_sample(broadcast_params, sample) -> (losses_tuple, grads)``
    runs executor-side; gradients and the ``n_losses`` loss terms are
    summed with log-depth treeAggregate and averaged."""
    rdd = samples if hasattr(samples, "treeAggregate") \
        else sc.parallelize(samples, max(2, sc.defaultParallelism))
    n = rdd.count()
    if n == 0:
        raise ValueError("no training samples")
    bw = sc.broadcast(params)

    def seq_op(acc, sample):
        losses, g = per_sample(bw.value, sample)
        tot, lsum = acc
        return (_add_into(tot, g),
                tuple(a + b for a, b in zip(lsum, losses)))

    def comb_op(a, b):
        return (_add_into(a[0], b[0]),
                tuple(x + y for x, y in zip(a[1], b[1])))

    tot, lsum = rdd.treeAggregate(
        ({}, (0.0,) * n_losses), seq_op, comb_op, depth=depth)
    bw.unpersist()
    return (tuple(v / n for v in lsum),
            {k: v / n for k, v in tot.items()})


def distributed_ctpn_grads(sc, samples, params: dict,
                           total_num: int | None = None,
                           depth: int = 2):
    """Mean CTPN gradient over ``samples`` computed on the cluster.

    samples: RDD OR list of (x, gt_cls, gt_regr) tuples (a list is
    parallelized).  Returns (mean_loss_cls, mean_loss_regr, grads)
    with grads averaged over samples — the large-batch equivalent of
    the reference's per-sample loop.
    """
    kwargs = {} if total_num is None else {"total_num": total_num}

    def per_sample(w, sample):
        x, gt_cls, gt_regr = sample
        lc, lr_, g = BP.ctpn_loss_and_grads(x, w, gt_cls, gt_regr,
                                            **kwargs)
        return (lc, lr_), g

    (lc, lr_), grads = _distributed_grads(
        sc, samples, params, per_sample, n_losses=2, depth=depth)
    return lc, lr_, grads


def distributed_crnn_grads(sc, samples, params: dict, depth: int = 2):
    """Mean CRNN/CTC gradient over (x, target) samples — the
    data-parallel form of train_pytorch_ctc.py's per-batch step."""
    def per_sample(w, sample):
        x, target = sample
        loss, g = BP.crnn_loss_and_grads(x, w, target)
        return (loss,), g

    (loss,), grads = _distributed_grads(
        sc, samples, params, per_sample, n_losses=1, depth=depth)
    return loss, grads


def train_ctpn_distributed(spark, samples, params: dict, optimizer,
                           epochs: int = 3, lr0: float = 1e-3,
                           step_size: int = 10, gamma: float = 0.1,
                           total_num: int | None = None) -> dict:
    """The ctpn_train.py epoch-loop shape, one synchronous data-parallel
    step per epoch (StepLR exactly as the reference drives it).
    Returns {'params', 'epoch_losses'}."""
    sc = spark.sparkContext
    params = {k: np.asarray(v, dtype=np.float64)
              for k, v in params.items()}
    epoch_losses = []
    for epoch in range(1, epochs + 1):
        if hasattr(optimizer, "lr"):
            optimizer.lr = step_lr(lr0, epoch, step_size, gamma)
        lc, lr_, grads = distributed_ctpn_grads(
            sc, samples, params, total_num=total_num)
        optimizer.step(params, grads)
        epoch_losses.append((lc, lr_, lc + lr_))
    return {"params": params, "epoch_losses": epoch_losses}
