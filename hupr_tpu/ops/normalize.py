"""Per-channel radar-map normalization, on device.

Parity target: datasets/base.py:13-24 (Normalize) applied per (frame, chirp,
real/imag) slice in HuPR3D_horivert.__getitem__ (datasets/dataset.py:146-150):
each (elevation-channel, 64x64) map is min-max scaled to [0,1], then
standardized with the *unbiased* (N-1) torch.std_mean. The reference runs this
in DataLoader workers on CPU per chirp; here one fused jitted op normalizes a
whole (..., R, A, E) window at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize_map(x: jnp.ndarray) -> jnp.ndarray:
    """x (..., R, A): min-max to [0,1] then zero-mean/unit-std (ddof=1) over
    the trailing two axes.

    Degenerate (constant) planes map to ZEROS instead of NaN: the cube's
    Doppler-0 chirp is mathematically zero after clutter removal, and the
    TPU FFT computes it EXACTLY zero while numpy/CPU leave ~1e-10 rounding
    residue — the reference (datasets/base.py:13-24) never divides by an
    exact zero only thanks to that residue, and a 0/0 here poisoned every
    fused-ADC forward on TPU (all-NaN chirp plane -> NaN loss). The where-
    guards change nothing when mx/var > 0: the divides are bit-identical
    for every non-degenerate plane (pinned by the torch-twin tests)."""
    mn = jnp.min(x, axis=(-2, -1), keepdims=True)
    x0 = x - mn
    mx = jnp.max(x0, axis=(-2, -1), keepdims=True)
    xn = x0 / jnp.where(mx > 0, mx, 1.0)
    mean = jnp.mean(xn, axis=(-2, -1), keepdims=True)
    n = x.shape[-1] * x.shape[-2]
    var = jnp.sum((xn - mean) ** 2, axis=(-2, -1), keepdims=True) / (n - 1)
    return (xn - mean) / jnp.sqrt(jnp.where(var > 0, var, 1.0))


@jax.jit
def normalize_radar_window(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize each (R, A) slice of a (..., R, A, E) real window per
    elevation channel — the channel axis of the reference's per-chirp
    torchvision pipeline is the elevation axis (ToTensor HWC->CHW)."""
    moved = jnp.moveaxis(x, -1, -3)        # (..., E, R, A)
    normed = _normalize_map(moved)
    return jnp.moveaxis(normed, -3, -1)
