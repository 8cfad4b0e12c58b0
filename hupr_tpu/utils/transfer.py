"""Half-precision host->device wire format for radar planes.

Every transfer-bound path in the framework (classic BatchLoader windows,
chunk-train frame unions, sequence-eval planes) ships raw radar cube values
as float32 by default — bit-faithful to the reference, whose DataLoader
hands torch float32 tensors (datasets/dataset.py:146-159). On hosts where
the host->device link is the bottleneck (this dev TPU sits behind a
~30-100 MB/s tunnel; production serving hosts are often NIC-bound too),
`SETUP.transferDtype: bfloat16` halves the bytes on the wire: the loader
threads cast once on the host, device_put ships the half-width array, and
each XLA program casts back to float32 at entry BEFORE normalization — so
normalize/forward/loss numerics stay in f32 and only the raw cube values
are quantized (bfloat16 keeps f32's exponent range, ~3 significant decimal
digits). float16 is also accepted for links that prefer it; radar cubes
after the preprocessing FFTs fit comfortably inside f16 range, but bfloat16
is the safe default recommendation.
"""

from __future__ import annotations

import numpy as np

_DTYPES = None


def _table():
    global _DTYPES
    if _DTYPES is None:
        import ml_dtypes  # shipped with jax
        _DTYPES = {
            "float32": np.dtype(np.float32),
            "bfloat16": np.dtype(ml_dtypes.bfloat16),
            "float16": np.dtype(np.float16),
        }
    return _DTYPES


def transfer_dtype(name: str) -> np.dtype:
    """SETUP.transferDtype string -> numpy dtype (ValueError on unknown)."""
    try:
        return _table()[name]
    except KeyError:
        raise ValueError(
            f"SETUP.transferDtype must be one of {sorted(_table())}, "
            f"got {name!r}") from None


def cast_for_transfer(arr: np.ndarray, dtype: np.dtype) -> np.ndarray:
    """Cast a host array to the wire dtype (no copy when already there)."""
    if arr.dtype == dtype:
        return arr
    return arr.astype(dtype)
