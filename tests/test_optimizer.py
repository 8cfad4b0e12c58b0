"""The optax chain must reproduce torch.optim semantics exactly: torch Adam
applies weight_decay as L2-into-gradient (not decoupled), then the moment
updates, scaled by the *current* lr each step (reference tools/base.py:44-47
with the mutable-lr schedule at :66-72)."""

import numpy as np
import jax.numpy as jnp
import torch

from hupr_tpu.config import config_from_dict
from hupr_tpu.engine.steps import make_optimizer


def _run_torch(opt_name, w0, grads, lrs, wd=1e-4):
    w = torch.nn.Parameter(torch.tensor(w0))
    if opt_name == "adam":
        opt = torch.optim.Adam([w], lr=lrs[0], betas=(0.9, 0.999),
                               weight_decay=wd)
    else:
        opt = torch.optim.SGD([w], lr=lrs[0], momentum=0.9, weight_decay=wd)
    traj = []
    for g, lr in zip(grads, lrs):
        for group in opt.param_groups:
            group["lr"] = lr
        opt.zero_grad()
        w.grad = torch.tensor(g)
        opt.step()
        traj.append(w.detach().numpy().copy())
    return traj


def _run_optax(opt_name, w0, grads, lrs, wd=1e-4):
    cfg = config_from_dict({"TRAINING": {"optimizer": opt_name,
                                         "weightDecay": wd}})
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    traj = []
    for g, lr in zip(grads, lrs):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"] * lr}
        traj.append(np.asarray(params["w"]).copy())
    return traj


def _check(opt_name, atol):
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(8)]
    lrs = [1e-3 * (0.999 ** i) for i in range(8)]  # mutating lr like adjustLR
    want = _run_torch(opt_name, w0, grads, lrs)
    got = _run_optax(opt_name, w0, grads, lrs)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, atol=atol)


def test_adam_matches_torch():
    _check("adam", atol=1e-6)


def test_sgd_matches_torch():
    _check("sgd", atol=1e-6)
