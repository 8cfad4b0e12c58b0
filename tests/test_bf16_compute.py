"""Numerics guard for MODEL.computeDtype=bfloat16 (models/hupr.py dtype).

The knob keeps parameters/IO in f32 and runs matmul/conv compute in bf16 —
a departure from reference numerics (torch runs f32 throughout,
models/networks.py), so it needs evidence, not vibes:
  1. forward deltas vs the f32 model on the SAME parameters stay inside a
     stated bound (sigmoid heatmaps live in [0, 1], so an absolute bound is
     meaningful), and the argmax keypoint decode agrees for all but
     near-tied bins;
  2. the end-to-end golden-AP canary (test_golden_ap.py pipeline) stays
     within a stated AP-stat bound of the pinned f32 vector.
bench.py records the speed side of the A/B (e2e_frames_per_sec_bf16compute,
train_ms_per_step_bf16compute).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hupr_tpu.models import HuPRNet
from hupr_tpu.ops.heatmap import get_max_preds

# Measured deltas (CPU XLA, 2026-08): forward max|Δ| ~3e-5 on the synthetic
# 0.05-scale weights (small activations + running-stats BN + sigmoid keep
# absolute deltas far under bf16's ~3-digit resolution), decode agreement
# 100%, golden-AP within 0.05. Bounds are set well above those so toolchain
# (XLA codegen) variation passes, while a real regression — e.g. accidental
# bf16 accumulation in BN stats or the loss, which NaNs or shifts stats by
# O(0.1+) — still fails.
HEATMAP_ATOL = 0.05          # sigmoid outputs in [0, 1]
DECODE_DISAGREE_FRAC = 0.25  # argmax flips only on near-tied bins
GOLDEN_AP_ATOL = 0.05        # per-stat bound vs the pinned f32 vector


def test_bf16_forward_matches_f32():
    from hupr_tpu.utils.synthetic import synthetic_variables

    f32 = HuPRNet(num_filters=2)
    bf16 = HuPRNet(num_filters=2, dtype=jnp.bfloat16)
    shape = (2, 8, 8, 2, 64, 64, 8)
    variables = synthetic_variables(f32, shape)
    rng = np.random.default_rng(1)
    hori = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    vert = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    hm32, gcn32 = jax.jit(lambda h, v: f32.apply(variables, h, v))(hori, vert)
    hm16, gcn16 = jax.jit(lambda h, v: bf16.apply(variables, h, v))(hori,
                                                                    vert)
    assert gcn16.dtype == jnp.float32      # outputs cast back to f32
    d_hm = float(jnp.max(jnp.abs(hm16 - hm32)))
    d_gcn = float(jnp.max(jnp.abs(gcn16 - gcn32)))
    assert d_hm < HEATMAP_ATOL, d_hm
    assert d_gcn < HEATMAP_ATOL, d_gcn

    k, h = gcn32.shape[2], gcn32.shape[3]
    p32, _ = get_max_preds(gcn32.reshape(-1, k, h, h))
    p16, _ = get_max_preds(gcn16.reshape(-1, k, h, h))
    agree = np.mean(np.all(np.asarray(p32) == np.asarray(p16), axis=-1))
    assert agree >= 1.0 - DECODE_DISAGREE_FRAC, agree


def test_bf16_train_step_grads():
    """grad through the bf16 forward works and stays finite (a bf16 logit
    leaking into the f32 BCE custom VJP crashes sigmoid's backward with a
    cotangent dtype mismatch — pose_from_maps casts the boundary)."""
    from hupr_tpu.config import config_from_dict
    from hupr_tpu.engine.steps import (TrainState, make_optimizer,
                                       make_train_step)
    from hupr_tpu.utils.synthetic import synthetic_variables

    cfg = config_from_dict({"MODEL": {"numFilters": 2,
                                      "computeDtype": "bfloat16"}})
    from hupr_tpu.models import build_model
    model = build_model(cfg)
    shape = (2, 8, 8, 2, 64, 64, 8)
    variables = synthetic_variables(model, shape)
    tx = make_optimizer(cfg)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    batch = {"hori": rng.standard_normal(shape).astype(np.float32),
             "vert": rng.standard_normal(shape).astype(np.float32),
             "jointsGroup": rng.uniform(20, 230, (2, 14, 2))}
    step = make_train_step(model, tx)
    state, metrics = step(state, batch, 1e-4, 0.0)
    assert np.isfinite(float(metrics["loss"]))
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(state.params))


@pytest.mark.slow
def test_bf16_golden_ap_within_bound(tmp_path):
    """The full benchmark-eval pipeline under bf16 compute stays within
    GOLDEN_AP_ATOL of the pinned f32 golden vector (sequence-eval path)."""
    from test_golden_ap import GOLDEN_SEQ, _golden_workspace, _run_eval

    cfg = _golden_workspace(tmp_path)
    cfg.MODEL.computeDtype = "bfloat16"
    stats = _run_eval(tmp_path, cfg)
    np.testing.assert_allclose(stats, GOLDEN_SEQ, rtol=0,
                               atol=GOLDEN_AP_ATOL)
