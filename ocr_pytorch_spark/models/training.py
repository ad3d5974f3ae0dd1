"""Training-loop semantics (the last reference surface).

The reference trains CTPN with SGD+momentum under a StepLR schedule
and an any-improvement best-loss checkpoint gate
(``train_code/train_ctpn/ctpn_train.py:57-134``), and CRNN with
Adam/Adadelta/RMSprop plus an exact-match-accuracy checkpoint gate and
a running loss averager (``train_code/train_crnn/
train_pytorch_ctc.py:113-139``, ``utils.py:186-211``).  Full backprop
(torch autograd through VGG/GRU/LSTM) is genuinely out of scope for an
extraction engine — what IS rebuilt here, exactly and testably, is
every piece of training-loop logic the reference implements itself:

* optimizer update rules with torch's exact state equations
  (SGD+momentum, Adam, Adadelta, RMSprop),
* the StepLR schedule as the reference calls it
  (``scheduler.step(epoch)`` — lr(e) = lr0 * gamma^(e // step_size)),
* ``weights_init`` (conv ~ N(0, 0.02); BN weight ~ N(1, 0.02), bias 0),
* the CTPN best-loss gate quirk: if ANY of (cls, regr, total)
  improves, ALL three bests are overwritten and a checkpoint is saved
  (ctpn_train.py:124-134 — reproduced, not "fixed"),
* the CRNN best-acc gate (save best on improvement, always save
  latest) and the running averager.

``train_loop`` wires these into a driver-side epoch loop generic over
a ``grad_fn`` so the semantics are provable on closed-form problems
(tests use quadratics); plugging in real gradients is a matter of
supplying ``grad_fn``, not of changing loop logic.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


def weights_init(shapes: dict, seed: int = 2019) -> "OrderedDict":
    """ctpn_train.py:41-47 applied to a {name: shape} spec: '*conv*'
    params ~ N(0, 0.02); '*bn*.weight' ~ N(1, 0.02); '*bn*.bias' = 0;
    everything else left at N(0, 0.02) like conv (the reference's
    find('Conv') classname check, name-based here)."""
    rng = np.random.default_rng(seed)
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for name, shape in shapes.items():
        low = name.lower()
        if "bn" in low or "batchnorm" in low:
            if low.endswith("bias"):
                out[name] = np.zeros(shape, dtype=np.float32)
            else:
                out[name] = rng.normal(1.0, 0.02, shape) \
                    .astype(np.float32)
        else:
            out[name] = rng.normal(0.0, 0.02, shape).astype(np.float32)
    return out


def step_lr(lr0: float, epoch: int, step_size: int = 10,
            gamma: float = 0.1) -> float:
    """StepLR as the reference drives it (ctpn_train.py:81,91
    ``scheduler.step(epoch)``): lr(e) = lr0 * gamma^(e // step_size)."""
    return lr0 * gamma ** (epoch // step_size)


class SGD:
    """torch.optim.SGD(momentum=0.9) semantics (ctpn_train.py:71):
    buf = mu * buf + g (buf = g on first step); p -= lr * buf."""

    def __init__(self, lr: float = 1e-3, momentum: float = 0.9):
        self.lr = lr
        self.momentum = momentum
        self.buf: dict = {}

    def step(self, params: dict, grads: dict) -> None:
        for k, g in grads.items():
            b = self.buf.get(k)
            b = g.copy() if b is None else self.momentum * b + g
            self.buf[k] = b
            params[k] = params[k] - self.lr * b


class Adam:
    """torch.optim.Adam (train_pytorch_ctc.py:115; betas=(beta1,
    0.999)): bias-corrected first/second moments."""

    def __init__(self, lr: float = 1e-3, beta1: float = 0.5,
                 beta2: float = 0.999, eps: float = 1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, eps
        self.m: dict = {}
        self.v: dict = {}
        self.t = 0

    def step(self, params: dict, grads: dict) -> None:
        self.t += 1
        for k, g in grads.items():
            m = self.m.get(k, np.zeros_like(g))
            v = self.v.get(k, np.zeros_like(g))
            m = self.b1 * m + (1 - self.b1) * g
            v = self.b2 * v + (1 - self.b2) * g * g
            self.m[k], self.v[k] = m, v
            mh = m / (1 - self.b1 ** self.t)
            vh = v / (1 - self.b2 ** self.t)
            params[k] = params[k] - self.lr * mh / (np.sqrt(vh)
                                                    + self.eps)


class Adadelta:
    """torch.optim.Adadelta (train_pytorch_ctc.py:117)."""

    def __init__(self, lr: float = 1.0, rho: float = 0.9,
                 eps: float = 1e-6):
        self.lr, self.rho, self.eps = lr, rho, eps
        self.sq: dict = {}
        self.acc: dict = {}

    def step(self, params: dict, grads: dict) -> None:
        for k, g in grads.items():
            sq = self.sq.get(k, np.zeros_like(g))
            acc = self.acc.get(k, np.zeros_like(g))
            sq = self.rho * sq + (1 - self.rho) * g * g
            delta = np.sqrt(acc + self.eps) / np.sqrt(sq + self.eps) * g
            acc = self.rho * acc + (1 - self.rho) * delta * delta
            self.sq[k], self.acc[k] = sq, acc
            params[k] = params[k] - self.lr * delta


class RMSprop:
    """torch.optim.RMSprop (train_pytorch_ctc.py:119 — the
    reference's default branch)."""

    def __init__(self, lr: float = 1e-2, alpha: float = 0.99,
                 eps: float = 1e-8):
        self.lr, self.alpha, self.eps = lr, alpha, eps
        self.sq: dict = {}

    def step(self, params: dict, grads: dict) -> None:
        for k, g in grads.items():
            sq = self.sq.get(k, np.zeros_like(g))
            sq = self.alpha * sq + (1 - self.alpha) * g * g
            self.sq[k] = sq
            params[k] = params[k] - self.lr * g / (np.sqrt(sq)
                                                   + self.eps)


class Averager:
    """train_code/train_crnn/utils.py:186-211 running averager."""

    def __init__(self):
        self.reset()

    def add(self, v, n: int = 1) -> None:
        self.sum += float(v) * n
        self.count += n

    def reset(self) -> None:
        self.sum = 0.0
        self.count = 0

    def val(self) -> float:
        return self.sum / self.count if self.count else 0.0


class BestLossGate:
    """ctpn_train.py:124-134: if ANY of (cls, regr, total) improved,
    overwrite ALL three bests and checkpoint.  The any-improvement /
    overwrite-all behavior is a reference quirk kept as-is (a strictly
    worse total can become 'best' when cls alone improved)."""

    def __init__(self, init: float = 100.0):
        self.best_cls = self.best_regr = self.best_loss = init
        self.saved: list = []

    def update(self, epoch: int, loss_cls: float, loss_regr: float,
               loss: float) -> bool:
        if (self.best_cls > loss_cls or self.best_regr > loss_regr
                or self.best_loss > loss):
            self.best_cls, self.best_regr, self.best_loss = \
                loss_cls, loss_regr, loss
            self.saved.append((epoch, loss_cls, loss_regr, loss))
            return True
        return False


class BestAccGate:
    """train_pytorch_ctc.py:134-139: save a named best checkpoint when
    accuracy improves (threshold starts at 0.9 in the reference);
    the latest checkpoint is (re)written every validation."""

    def __init__(self, init: float = 0.9):
        self.best_acc = init
        self.best_saves: list = []
        self.latest_saves: int = 0

    def update(self, epoch: int, accuracy: float) -> bool:
        improved = accuracy > self.best_acc
        if improved:
            self.best_acc = accuracy
            self.best_saves.append((epoch, int(accuracy * 1000)))
        self.latest_saves += 1
        return improved


def train_loop(params: dict, batches, grad_fn, optimizer,
               epochs: int = 30, lr0: float = 1e-3,
               step_size: int = 10, gamma: float = 0.1,
               gate: BestLossGate | None = None) -> dict:
    """The ctpn_train.py epoch loop shape: per-epoch StepLR, per-batch
    zero-grad/forward/backward/step (grad_fn supplies gradients and the
    (cls, regr) loss pair), epoch-mean losses, best-loss gate.  Returns
    {'params', 'gate', 'epoch_losses'}."""
    gate = gate or BestLossGate()
    epoch_losses = []
    for epoch in range(1, epochs):
        if hasattr(optimizer, "lr"):
            optimizer.lr = step_lr(lr0, epoch, step_size, gamma)
        e_cls = e_regr = e_loss = 0.0
        for batch in batches:
            grads, loss_cls, loss_regr = grad_fn(params, batch)
            optimizer.step(params, grads)
            e_cls += loss_cls
            e_regr += loss_regr
            e_loss += loss_cls + loss_regr
        n = max(1, len(batches))
        e_cls, e_regr, e_loss = e_cls / n, e_regr / n, e_loss / n
        epoch_losses.append((e_cls, e_regr, e_loss))
        gate.update(epoch, e_cls, e_regr, e_loss)
    return {"params": params, "gate": gate,
            "epoch_losses": epoch_losses}
