"""Gaussian GT heatmap rasterization, argmax decoding and BCE loss — all as
vectorized, jittable JAX (L3' of the layer map).

Parity targets:
  - generateTarget   (/root/reference/misc/utils.py:6-65): per-joint Python
    loop pasting a 13x13 Gaussian patch; here a masked dense evaluation over
    the full 64x64 grid, bitwise-identical because the patch border (|dx|>3σ)
    is exactly where the reference writes nothing.
  - get_max_preds    (/root/reference/misc/metrics.py:10-38)
  - nn.BCELoss on probabilities (/root/reference/misc/losses.py:22,47-48)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def generate_target(joints: jnp.ndarray, num_keypoints: int, heatmap_size: int,
                    img_size: int, is_coord: bool = False, sigmas=None):
    """joints (K, 2) int image-space coords -> (target (K, H, W), peak (K, 2)).

    sigma = 2 for 64x64 maps, 3 for 128x128 (reference misc/utils.py:12-15);
    Gaussian is unnormalized with center value 1, written only inside the
    [mu-3σ, mu+3σ] window and clipped at the map boundary. Optional modes of
    the reference API (utils.py:30-36, unused by the benchmark pipeline):
    `sigmas` gives per-joint sigmas (x10 scale), `is_coord` treats joints as
    normalized [0,1) coordinates.
    """
    if sigmas is not None:
        sigma_flat = jnp.asarray(sigmas, jnp.float32).reshape(-1) * 10.0
    else:
        s = float(2 if heatmap_size == 64 else 3)
        sigma_flat = jnp.full((num_keypoints,), s, jnp.float32)
    sigma = sigma_flat[:, None, None]
    tmp_flat = sigma_flat * 3.0                 # (K,) float, can be fractional
    feat_stride = img_size / heatmap_size

    # the reference casts with int(), which truncates toward zero — NOT
    # floor: int(-0.25) == 0 (off-image negative joints shift one bin
    # under floor; misc/utils.py:33-38)
    if is_coord:
        mu = jnp.trunc(joints[:, :2].astype(jnp.float32) * heatmap_size
                       ).astype(jnp.int32)
    else:
        mu = jnp.trunc(joints[:, :2].astype(jnp.float32) / feat_stride + 0.5
                       ).astype(jnp.int32)
    mu_f = mu.astype(jnp.float32)

    # patch geometry exactly as the reference pastes it (utils.py:40-61):
    # ul = int(mu - 3σ), br = int(mu + 3σ + 1) (trunc), and the Gaussian
    # center sits at patch index (2·3σ+1)//2 == floor(3σ+0.5), i.e. at image
    # coordinate ul + floor(3σ+0.5). For integer 3σ that center is mu; for
    # fractional 3σ the window is asymmetric (e.g. dx ∈ [-8,+7] at 3σ=7.5)
    # and near the left edge (trunc ≠ floor) the center shifts off mu —
    # reference quirks, reproduced bit-for-bit.
    ul = jnp.trunc(mu_f - tmp_flat[:, None]).astype(jnp.int32)      # (K,2)
    br = jnp.trunc(mu_f + tmp_flat[:, None] + 1.0).astype(jnp.int32)
    center = ul.astype(jnp.float32) + jnp.floor(tmp_flat + 0.5)[:, None]

    xs = jnp.arange(heatmap_size, dtype=jnp.int32)[None, None, :]
    ys = jnp.arange(heatmap_size, dtype=jnp.int32)[None, :, None]
    dx = xs.astype(jnp.float32) - center[:, 0][:, None, None]
    dy = ys.astype(jnp.float32) - center[:, 1][:, None, None]
    g = jnp.exp(-(dx ** 2 + dy ** 2) / (2.0 * sigma * sigma))
    inside = ((xs >= ul[:, 0][:, None, None]) & (xs < br[:, 0][:, None, None])
              & (ys >= ul[:, 1][:, None, None]) & (ys < br[:, 1][:, None, None]))
    target = jnp.where(inside, g, 0.0)
    # joints whose whole window falls outside the map are skipped entirely —
    # including their peak coords (reference utils.py:41-43 `continue`)
    in_bounds = ((ul[:, 0] < heatmap_size) & (ul[:, 1] < heatmap_size)
                 & (br[:, 0] >= 0) & (br[:, 1] >= 0))
    target = target * in_bounds[:, None, None].astype(jnp.float32)
    peak = mu.astype(jnp.float32) * in_bounds[:, None].astype(jnp.float32)
    return target.astype(jnp.float32), peak


@partial(jax.jit, static_argnames=("num_keypoints", "heatmap_size", "img_size"))
def generate_target_batch(joints: jnp.ndarray, num_keypoints: int = 14,
                          heatmap_size: int = 64, img_size: int = 256):
    """(B, K, 2) -> ((B, K, H, W), (B, K, 2)) — replaces the reference's
    per-sample CPU loop in LossComputer (misc/losses.py:27-30)."""
    return jax.vmap(
        lambda j: generate_target(j, num_keypoints, heatmap_size, img_size)
    )(joints)


def get_max_preds(batch_heatmaps: jnp.ndarray):
    """(B, K, H, W) -> (preds (B, K, 2) xy, maxvals (B, K, 1)).

    Argmax over the flattened map; x = idx % W, y = idx // W; coordinates are
    zeroed where the peak value is <= 0 (reference misc/metrics.py:10-38).
    """
    b, k, h, w = batch_heatmaps.shape
    flat = batch_heatmaps.reshape(b, k, h * w)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2)[..., None]
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([x, y], axis=-1)
    preds = preds * (maxvals > 0.0).astype(jnp.float32)
    return preds, maxvals


@jax.custom_vjp
def bce_elements(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on probabilities with torch
    nn.BCELoss numerics: forward clamps log at -100; backward clamps the
    p(1-p) denominator at 1e-12 so saturated sigmoid outputs yield
    large-but-finite gradients instead of inf/NaN."""
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1p = jnp.maximum(jnp.log(1.0 - probs), -100.0)
    return -(targets * log_p + (1.0 - targets) * log_1p)


def _bce_fwd(probs, targets):
    return bce_elements(probs, targets), (probs, targets)


def _bce_bwd(res, g):
    probs, targets = res
    denom = jnp.maximum(probs * (1.0 - probs), 1e-12)
    dp = g * (probs - targets) / denom
    # d/dtarget of -(t log p + (1-t) log(1-p)) with the forward's log clamp
    dt = g * (jnp.maximum(jnp.log(1.0 - probs), -100.0)
              - jnp.maximum(jnp.log(probs), -100.0))
    return dp, dt


bce_elements.defvjp(_bce_fwd, _bce_bwd)


def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray,
             sample_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean BCE (torch nn.BCELoss, misc/losses.py:47-48). With `sample_mask`
    (B,) the mean runs over unmasked samples only — used to neutralize the
    rows shard_batch pads onto non-device-divisible batches."""
    elems = bce_elements(probs, targets)
    if sample_mask is None:
        return jnp.mean(elems)
    w = sample_mask.reshape((-1,) + (1,) * (elems.ndim - 1))
    per_sample = elems.shape[0]
    inner = elems.size // per_sample
    return jnp.sum(elems * w) / (jnp.sum(sample_mask) * inner)
