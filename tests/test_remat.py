"""Evidence for MODEL.remat (models/hupr.py:40-48, nn.remat on Encoder3D).

The knob trades backward-pass FLOPs (encoder recompute) for activation
memory — the standard lever for scaling batch/sequence on real HBM. It must
be a pure scheduling change: forward numerics identical, train-step results
equal to f32 noise, and the lowered program demonstrably rematerializing
(otherwise the knob silently does nothing).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hupr_tpu.config import config_from_dict
from hupr_tpu.engine.steps import (TrainState, make_optimizer,
                                   make_train_step)
from hupr_tpu.models import build_model
from hupr_tpu.utils.synthetic import synthetic_variables

SHAPE = (2, 8, 8, 2, 64, 64, 8)


def _setup(remat: bool):
    cfg = config_from_dict({"MODEL": {"numFilters": 2, "remat": remat}})
    model = build_model(cfg)
    variables = synthetic_variables(model, SHAPE)
    tx = make_optimizer(cfg)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    return model, tx, state


def _batch():
    rng = np.random.default_rng(0)
    return {"hori": rng.standard_normal(SHAPE).astype(np.float32),
            "vert": rng.standard_normal(SHAPE).astype(np.float32),
            "jointsGroup": rng.uniform(20, 230, (2, 14, 2))}


def test_remat_is_a_pure_scheduling_change():
    """One compile of each step: forward loss identical, updated params and
    BN stats equal to f32-reassociation noise, and the lowered remat program
    structurally rematerializes (checkpoint barriers present, encoder convs
    recomputed in the backward).

    The memory claim itself is NOT asserted here: XLA:CPU's buffer
    assignment reports byte-identical temp allocation for both programs at
    this geometry (measured 2026-08-20 — the CPU scheduler's peak is set by
    the attention/decoder panels, which remat doesn't touch, and its
    accounting ignores the encoder-liveness change). The HBM saving is a
    TPU-side property; README/DEVNOTES record the device measurement."""
    base_model, base_tx, base_state = _setup(remat=False)
    rem_model, rem_tx, rem_state = _setup(remat=True)
    # same weights in both (synthetic_variables is seed-deterministic per
    # structure, and the structure is identical) — verify, don't assume
    jax.tree.map(np.testing.assert_array_equal,
                 base_state.params, rem_state.params)
    batch = _batch()

    base_step = make_train_step(base_model, base_tx)
    rem_step = make_train_step(rem_model, rem_tx)
    base_lowered = base_step.lower(base_state, batch, 1e-4, 0.0)
    rem_lowered = rem_step.lower(rem_state, batch, 1e-4, 0.0)

    # structural evidence the knob does something: jax.checkpoint's
    # optimization barriers survive lowering (one per encoder view) and the
    # backward recomputes the encoder stack (strictly more convolutions)
    base_hlo, rem_hlo = base_lowered.as_text(), rem_lowered.as_text()
    assert rem_hlo.count("optimization_barrier") >= 2
    assert base_hlo.count("optimization_barrier") == 0
    base_convs = base_hlo.count("stablehlo.convolution")
    rem_convs = rem_hlo.count("stablehlo.convolution")
    assert rem_convs > base_convs, (rem_convs, base_convs)

    base_c, rem_c = base_lowered.compile(), rem_lowered.compile()
    bs, bm = base_c(base_state, batch, 1e-4, 0.0)
    rs, rm = rem_c(rem_state, batch, 1e-4, 0.0)
    assert np.isfinite(float(bm["loss"]))
    # the forward under remat is the same math modulo XLA fusion regrouping
    np.testing.assert_allclose(float(rm["loss"]), float(bm["loss"]),
                               rtol=1e-6)
    for name, a, b in zip(("params", "batch_stats"),
                          (bs.params, bs.batch_stats),
                          (rs.params, rs.batch_stats)):
        flat_a = jax.tree.leaves(a)
        flat_b = jax.tree.leaves(b)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=0, atol=5e-5, err_msg=name)
