"""Linear resize with PyTorch align_corners=True semantics.

The reference model relies on torch F.interpolate / nn.Upsample with
align_corners=True in four places (bilinear up x2 in the decoder,
trilinear "up" x0.5 downsampling in Encoder3D, bilinear x0.5 / x2.0 in PRGCN:
/root/reference/models/layers.py:84,91,199,205, gcn_networks.py:49,63).
jax.image.resize has no align_corners mode, so we build explicit 1-D
interpolation matrices (out, in) at trace time (shapes are static) and apply
them as matmuls — separable linear interpolation that the MXU executes
natively, instead of gather-based resampling.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row r holds the linear-interpolation weights over the input grid for
    output coordinate r * (in-1)/(out-1) (align_corners=True mapping)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - w
    m[np.arange(out_size), hi] += w
    return m


def _apply_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    mat = jnp.asarray(_interp_matrix(in_size, out_size))
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(moved, mat.T)
    return jnp.moveaxis(out, -1, axis)


def resize_linear_align_corners(x: jnp.ndarray, out_sizes, axes) -> jnp.ndarray:
    """Separable linear resize of `axes` to `out_sizes` (align_corners=True).

    Matches torch F.interpolate(mode='bilinear'/'trilinear', align_corners=True)
    for both integer upsampling and the reference's scale_factor=0.5 downsampling
    (output size floor(in*0.5), source coord i*(in-1)/(out-1)).
    """
    for axis, out_size in zip(axes, out_sizes):
        x = _apply_axis(x, int(out_size), axis)
    return x


def scale_by_factor(x: jnp.ndarray, factor: float, axes) -> jnp.ndarray:
    """torch nn.Upsample(scale_factor=...) output-size rule: floor(in * factor)."""
    out_sizes = [int(np.floor(x.shape[a] * factor)) for a in axes]
    return resize_linear_align_corners(x, out_sizes, axes)
