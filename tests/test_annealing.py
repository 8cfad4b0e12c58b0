"""lossDecay annealing parity (reference misc/losses.py:19-20,36-42).

The reference's LossComputer advances alpha/beta at the top of EVERY
computeLoss call — train and eval batches alike — before combining the
losses, guarded by alpha < 1.0, with beta == 1 - alpha exactly. The Runner
mirrors this with advance_alpha() before each train_step/eval_step.
"""

from types import SimpleNamespace

import jax
import numpy as np

from hupr_tpu.config import config_from_dict
from hupr_tpu.engine.runner import Runner
from hupr_tpu.engine.steps import (
    init_state, make_eval_step, make_optimizer, make_train_step)
from hupr_tpu.models import build_model


class RefAnneal:
    """Twin of the reference annealing state machine (misc/losses.py)."""

    def __init__(self, loss_decay):
        self.alpha, self.beta, self.d = 0.0, 1.0, loss_decay

    def compute(self, l1, l2):
        if self.alpha < 1.0:
            self.alpha += self.d
            self.beta -= self.d
        if self.d != -1:
            return self.alpha * l1 + self.beta * l2
        return l1 + l2


def _dummy_runner(loss_decay):
    cfg = config_from_dict({"TRAINING": {"lossDecay": loss_decay}})
    return SimpleNamespace(alpha=0.0, cfg=cfg)


def test_alpha_trajectory_matches_reference_incl_eval_calls():
    rng = np.random.default_rng(0)
    loss_decay = 0.2
    ref = RefAnneal(loss_decay)
    dummy = _dummy_runner(loss_decay)

    # interleave train and eval loss computations like an epoch boundary does
    for _ in range(12):
        l1, l2 = rng.uniform(0.1, 2.0, 2)
        Runner.advance_alpha(dummy)
        got = dummy.alpha * l1 + (1.0 - dummy.alpha) * l2
        want = ref.compute(l1, l2)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        assert np.isclose(dummy.alpha, ref.alpha)
        assert np.isclose(1.0 - dummy.alpha, ref.beta)

    # guard: alpha stops advancing at >= 1.0
    assert dummy.alpha >= 1.0
    frozen = dummy.alpha
    Runner.advance_alpha(dummy)
    assert dummy.alpha == frozen


def test_default_loss_decay_minus_one_sums_losses():
    ref = RefAnneal(-1)
    dummy = _dummy_runner(-1)
    for _ in range(3):
        Runner.advance_alpha(dummy)
        want = ref.compute(1.0, 2.0)
        assert want == 3.0  # lossDecay -1: plain sum, annealing inert


def test_jitted_steps_combine_with_alpha():
    # reduced 32x32 layout: the alpha-combination identity is
    # geometry-parametric (quick-tier trim)
    cfg = config_from_dict({"MODEL": {"numFilters": 2},
                            "DATASET": {"rangeSize": 32, "azimuthSize": 32,
                                        "heatmapSize": 32, "imgSize": 128},
                            "TRAINING": {"lossDecay": 0.5}})
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    rng = np.random.default_rng(1)
    shape = (2, 8, 8, 2, 32, 32, 8)
    geometry = (14, 32, 128)
    batch = {
        "hori": rng.standard_normal(shape).astype(np.float32),
        "vert": rng.standard_normal(shape).astype(np.float32),
        "jointsGroup": rng.uniform(10, 115, (2, 14, 2)),
    }
    state = init_state(model, cfg, jax.random.PRNGKey(0))

    eval_step = make_eval_step(model, loss_decay=0.5, geometry=geometry)
    out = eval_step(state, batch, 0.9)
    np.testing.assert_allclose(
        float(out["loss"]),
        0.9 * float(out["loss1"]) + 0.1 * float(out["loss2"]), rtol=1e-6)

    # train_step donates its state argument — run it last
    train_step = make_train_step(model, tx, loss_decay=0.5,
                             geometry=geometry)
    _, m = train_step(state, batch, 1e-4, 0.3)
    np.testing.assert_allclose(
        float(m["loss"]),
        0.3 * float(m["loss1"]) + 0.7 * float(m["loss2"]), rtol=1e-6)
