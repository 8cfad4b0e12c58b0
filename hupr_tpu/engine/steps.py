"""Jitted train/eval step functions (the compute core of the Runner, L4).

The reference's per-batch work (tools/run.py:65-86, misc/losses.py:23-45) —
normalize in DataLoader workers, forward, CPU Gaussian-target loop, BCE,
backward, Adam step — is here one fused XLA program per step:
  batch (un-normalized radar windows + integer joints)
    -> device-side Normalize -> forward(+BN stats) -> vectorized targets
    -> BCE(main)+BCE(GCN) -> grads -> torch-semantics Adam/SGD update.

Optimizer parity: torch.optim.Adam(lr, betas=(0.9, 0.999), weight_decay=1e-4)
applies L2 into the gradient (not decoupled), so the optax chain is
add_decayed_weights -> scale_by_adam -> scale(-1); the current learning rate
multiplies the update explicitly each step, mirroring the reference's
param_group lr mutation (tools/base.py:66-72).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hupr_tpu.ops.heatmap import bce_loss, generate_target_batch, get_max_preds
from hupr_tpu.ops.normalize import normalize_radar_window


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg) -> optax.GradientTransformation:
    wd = cfg.TRAINING.weightDecay
    if cfg.TRAINING.optimizer == "adam":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-1.0),
        )
    if cfg.TRAINING.optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.trace(decay=0.9, nesterov=False),
            optax.scale(-1.0),
        )
    raise ValueError(cfg.TRAINING.optimizer)


def init_state(model, cfg, rng, tx=None) -> TrainState:
    """tx: the optax chain whose update will consume this state; pass the
    same instance given to make_train_step (defaults to make_optimizer(cfg),
    correct as long as the caller doesn't customize the chain)."""
    d = cfg.DATASET
    shape = (1, d.numGroupFrames, d.numFrames, 2, d.rangeSize, d.azimuthSize,
             d.elevationSize)
    hori = jnp.zeros(shape, jnp.float32)
    variables = model.init(rng, hori, hori)
    if tx is None:
        tx = make_optimizer(cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _losses(model, params, batch_stats, batch, train: bool,
            geometry=(14, 64, 256)):
    # planes may arrive in the half-width wire format (SETUP.transferDtype,
    # utils/transfer.py); compute is always f32 from here on
    hori = normalize_radar_window(batch["hori"].astype(jnp.float32))
    vert = normalize_radar_window(batch["vert"].astype(jnp.float32))
    num_keypoints, heatmap_size, img_size = geometry
    targets, gt2d = generate_target_batch(
        batch["jointsGroup"], num_keypoints=num_keypoints,
        heatmap_size=heatmap_size, img_size=img_size)
    k, h = targets.shape[1], targets.shape[2]
    # rows padded by parallel.shard_batch (non-device-divisible batches)
    # carry mask 0: excluded from the loss means AND from train-mode BN stats
    mask = batch.get("mask")

    if train:
        (heatmap, gcn), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            hori, vert, train=True, row_mask=mask, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        heatmap, gcn = model.apply(
            {"params": params, "batch_stats": batch_stats}, hori, vert)
        new_stats = batch_stats

    main = heatmap.reshape(-1, k, h, h)
    refined = gcn.reshape(-1, k, h, h)
    loss1 = bce_loss(main, targets, mask)
    loss2 = bce_loss(refined, targets, mask)
    return loss1, loss2, refined, targets, gt2d, new_stats


def make_train_step(model, tx, loss_decay: float = -1.0,
                    geometry=(14, 64, 256)):
    """Returns jitted train_step(state, batch, lr, alpha) -> (state, metrics).

    alpha only matters when lossDecay != -1 (loss annealing,
    misc/losses.py:36-42); the default combines loss1 + loss2. The caller
    (Runner) advances alpha BEFORE each step — the reference increments
    inside computeLoss prior to combining the losses (losses.py:36-40).
    `geometry` = (numKeypoints, heatmapSize, imgSize) from cfg.DATASET.
    """

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, alpha):
        def loss_fn(params):
            loss1, loss2, _, _, _, new_stats = _losses(
                model, params, state.batch_stats, batch, train=True,
                geometry=geometry)
            if loss_decay != -1.0:
                loss = alpha * loss1 + (1.0 - alpha) * loss2
            else:
                loss = loss1 + loss2
            return loss, (loss1, loss2, new_stats)

        (loss, (loss1, loss2, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss, "loss1": loss1, "loss2": loss2}
        return new_state, metrics

    return train_step


def make_eval_step(model, loss_decay: float = -1.0, geometry=(14, 64, 256)):
    """Returns jitted eval_step(state, batch, alpha) -> metrics with decoded
    2D predictions from the GCN heatmap (the reference decodes preds2:
    misc/losses.py:43-44). The reference's LossComputer advances its
    annealing alpha on EVERY computeLoss call — eval batches included
    (losses.py:36-42) — so eval also takes the caller-advanced alpha."""

    @partial(jax.jit, donate_argnums=())
    def eval_step(state: TrainState, batch, alpha=0.0):
        loss1, loss2, refined, targets, gt2d, _ = _losses(
            model, state.params, state.batch_stats, batch, train=False,
            geometry=geometry)
        if loss_decay != -1.0:
            loss = alpha * loss1 + (1.0 - alpha) * loss2
        else:
            loss = loss1 + loss2
        pred2d, maxvals = get_max_preds(refined)
        gt_dec, _ = get_max_preds(targets)
        return {"loss": loss, "loss1": loss1, "loss2": loss2,
                "pred2d": pred2d, "gt2d": gt_dec, "maxvals": maxvals,
                "predHeatmap": refined}

    return eval_step
