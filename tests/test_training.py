"""Training-loop semantics (models/training.py): torch-exact optimizer
update rules, StepLR-as-called, checkpoint gates incl. the reference's
any-improvement quirk, and end-to-end convergence on a closed-form
problem."""

import numpy as np

from ocr_pytorch_spark.models import training as T


def test_sgd_momentum_matches_torch_equations():
    p = {"w": np.array([1.0, -2.0])}
    opt = T.SGD(lr=0.1, momentum=0.9)
    g1 = {"w": np.array([0.5, 1.0])}
    opt.step(p, g1)
    # first step: buf = g -> p = p0 - lr*g
    assert np.allclose(p["w"], [1 - 0.05, -2 - 0.1])
    g2 = {"w": np.array([0.5, 1.0])}
    opt.step(p, g2)
    # buf = 0.9*g + g = 1.9g
    assert np.allclose(p["w"], [0.95 - 0.1 * 0.95, -2.1 - 0.1 * 1.9])


def test_adam_bias_correction_first_step():
    p = {"w": np.array([0.0])}
    opt = T.Adam(lr=0.1, beta1=0.5, beta2=0.999, eps=0.0)
    opt.step(p, {"w": np.array([2.0])})
    # after bias correction the first step is exactly -lr * sign-ish:
    # mhat = g, vhat = g^2 -> step = lr * g/|g|
    assert np.allclose(p["w"], [-0.1])


def test_adadelta_and_rmsprop_shapes_and_signs():
    for opt in (T.Adadelta(lr=1.0), T.RMSprop(lr=0.01)):
        p = {"w": np.array([1.0, -1.0])}
        g = {"w": np.array([1.0, -1.0])}
        before = p["w"].copy()
        opt.step(p, g)
        # moves opposite the gradient
        assert (np.sign(before - p["w"]) == np.sign(g["w"])).all()


def test_step_lr_schedule_as_reference_calls_it():
    # ctpn_train.py: lr=1e-3, step_size=10, gamma=0.1
    assert T.step_lr(1e-3, 1) == 1e-3
    assert T.step_lr(1e-3, 9) == 1e-3
    assert np.isclose(T.step_lr(1e-3, 10), 1e-4)
    assert np.isclose(T.step_lr(1e-3, 29), 1e-5)


def test_weights_init_distributions():
    shapes = {"base_layers.0.weight": (64, 3, 3, 3),
              "bn3.weight": (256,), "bn3.bias": (256,)}
    w = T.weights_init(shapes)
    assert abs(float(w["base_layers.0.weight"].mean())) < 0.01
    assert abs(float(w["base_layers.0.weight"].std()) - 0.02) < 0.005
    assert abs(float(w["bn3.weight"].mean()) - 1.0) < 0.01
    assert (w["bn3.bias"] == 0).all()
    # deterministic by seed
    w2 = T.weights_init(shapes)
    assert np.array_equal(w["base_layers.0.weight"],
                          w2["base_layers.0.weight"])


def test_best_loss_gate_any_improvement_quirk():
    g = T.BestLossGate()
    assert g.update(1, 10.0, 10.0, 20.0)
    # cls improves, regr and total WORSEN -> still saved, all bests
    # overwritten (ctpn_train.py:124-134 behavior, kept as-is)
    assert g.update(2, 9.0, 15.0, 24.0)
    assert (g.best_cls, g.best_regr, g.best_loss) == (9.0, 15.0, 24.0)
    # nothing improves -> no save
    assert not g.update(3, 9.5, 15.5, 25.0)
    assert len(g.saved) == 2


def test_best_acc_gate():
    g = T.BestAccGate()
    assert not g.update(1, 0.85)   # below the 0.9 starting bar
    assert g.update(2, 0.92)
    assert not g.update(3, 0.91)
    assert g.update(4, 0.95)
    assert g.best_saves == [(2, 920), (4, 950)]
    assert g.latest_saves == 4     # latest written every validation


def test_averager():
    a = T.Averager()
    a.add(2.0)
    a.add(4.0, n=3)
    assert np.isclose(a.val(), (2 + 12) / 4)
    a.reset()
    assert a.val() == 0.0


def test_train_loop_converges_on_quadratic():
    """End-to-end loop shape: minimizing ||w - w*||^2 with the real
    SGD/StepLR/gate wiring converges and checkpoints best epochs."""
    target = np.array([3.0, -1.0, 0.5])
    params = {"w": np.zeros(3)}

    def grad_fn(p, batch):
        diff = p["w"] - target
        # pretend cls/regr split for the gate
        return ({"w": 2 * diff}, float((diff[:2] ** 2).sum()),
                float(diff[2] ** 2))

    out = T.train_loop(params, list(range(10)), grad_fn,
                       T.SGD(lr=0.02, momentum=0.9), epochs=30,
                       lr0=0.02)
    assert np.allclose(out["params"]["w"], target, atol=1e-3)
    losses = [t[2] for t in out["epoch_losses"]]
    assert losses[-1] < 1e-5 < losses[0]
    assert out["gate"].saved  # checkpoints happened
