"""SPMD data parallelism over a device mesh (the reference has no distributed
backend at all — SURVEY.md §2.10; this is the TPU-idiomatic green-field
design: batch-sharded inputs + replicated params under jit, XLA inserting the
gradient all-reduce over ICI automatically).

Scaling model: HuPRNet is a few-M-parameter conv net with a 20-sample batch —
pure data parallelism is the only strategy that pays (SURVEY.md §2.10), so the
mesh has one axis ('data'); params/opt-state are replicated, every batch leaf
is sharded on its leading axis. Multi-host would reuse the same code via
jax.distributed.initialize + a global mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _pad_to_multiple(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad the batch axis to a device-count multiple (remainder batches at
    epoch end keep a static per-device shape; padded rows are sliced off by
    the caller using the true batch size)."""
    b = arr.shape[0]
    rem = (-b) % n
    if rem == 0:
        return arr
    pad = np.repeat(arr[-1:], rem, axis=0)
    return np.concatenate([arr, pad], axis=0)


def shard_batch(batch: dict, mesh: Mesh) -> tuple[dict, int]:
    """device_put every leaf with its leading axis split over the data axis.
    Non-divisible batches are padded by repeating the last sample; a "mask"
    leaf (1.0 real / 0.0 padded) lets the loss ignore the padding. Returns
    (sharded_batch, true_batch_size)."""
    n = mesh.devices.size
    true_b = next(iter(batch.values())).shape[0]
    sharding = batch_sharding(mesh)
    out = {k: jax.device_put(_pad_to_multiple(np.asarray(v), n), sharding)
           for k, v in batch.items()}
    padded_b = true_b + ((-true_b) % n)
    mask = (np.arange(padded_b) < true_b).astype(np.float32)
    out["mask"] = jax.device_put(mask, sharding)
    return out, true_b


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))


def device_prefetch(batch_iter, mesh: Mesh, keys=("hori", "vert",
                                                  "jointsGroup")):
    """Double-buffer host batches onto the device: batch i+1 transfers while
    the step for batch i runs (JAX dispatch is async, so yielding immediately
    after device_put overlaps transfer with compute).

    Yields (device_batch, host_batch, true_batch_size)."""
    pending = None
    for batch in batch_iter:
        nxt = (shard_batch({k: batch[k] for k in keys}, mesh), batch)
        if pending is not None:
            (dev, true_b), host = pending
            yield dev, host, true_b
        pending = nxt
    if pending is not None:
        (dev, true_b), host = pending
        yield dev, host, true_b
