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


def _pad_batch_axis(arr: np.ndarray, target: int) -> np.ndarray:
    """Pad the batch axis to `target` rows by repeating the last sample
    (remainder batches keep a static per-device shape; padded rows are
    masked out of loss/BN-stats and sliced off by the caller)."""
    rem = target - arr.shape[0]
    if rem == 0:
        return arr
    pad = np.repeat(arr[-1:], rem, axis=0)
    return np.concatenate([arr, pad], axis=0)


def shard_batch(batch: dict, mesh: Mesh,
                pad_to: Optional[int] = None) -> tuple[dict, int]:
    """device_put every leaf with its leading axis split over the data axis.
    Non-divisible batches are padded by repeating the last sample; a "mask"
    leaf (1.0 real / 0.0 padded) lets the loss and train-mode BN statistics
    ignore the padding. `pad_to` additionally pads every batch up to a fixed
    size (the configured batchSize) so XLA compiles ONE program per phase
    instead of one per distinct remainder size. Returns
    (sharded_batch, true_batch_size)."""
    n = mesh.devices.size
    true_b = next(iter(batch.values())).shape[0]
    target = max(true_b, pad_to or 0)
    padded_b = target + ((-target) % n)
    sharding = batch_sharding(mesh)
    out = {k: jax.device_put(_pad_batch_axis(np.asarray(v), padded_b),
                             sharding)
           for k, v in batch.items()}
    mask = (np.arange(padded_b) < true_b).astype(np.float32)
    out["mask"] = jax.device_put(mask, sharding)
    return out, true_b


def replicate_state(state, mesh: Mesh):
    if jax.process_count() > 1:
        # device_put can't address other hosts' devices; every process holds
        # the same values (same-seed init or a shared checkpoint)
        from hupr_tpu.parallel.multihost import replicate_tree
        return replicate_tree(state, mesh)
    return jax.device_put(state, replicated(mesh))


def device_prefetch(batch_iter, mesh: Mesh, keys=("hori", "vert",
                                                  "jointsGroup"),
                    pad_to: Optional[int] = None):
    """Double-buffer host batches onto the device: batch i+1 transfers while
    the step for batch i runs (JAX dispatch is async, so yielding immediately
    after device_put overlaps transfer with compute).

    Batches carrying a "trueRows" count come from a process-sliced
    BatchLoader (multi-host): each leaf holds only this process's rows of
    the padded global batch and is assembled into a global jax.Array.

    Yields (device_batch, host_batch, true_batch_size)."""
    def stage(batch):
        if "trueRows" in batch:
            from hupr_tpu.parallel.multihost import global_shard_batch
            padded = batch[keys[0]].shape[0] * jax.process_count()
            return global_shard_batch({k: batch[k] for k in keys}, mesh,
                                      padded, batch["trueRows"])
        return shard_batch({k: batch[k] for k in keys}, mesh, pad_to)

    pending = None
    for batch in batch_iter:
        nxt = (stage(batch), batch)
        if pending is not None:
            (dev, true_b), host = pending
            yield dev, host, true_b
        pending = nxt
    if pending is not None:
        (dev, true_b), host = pending
        yield dev, host, true_b
