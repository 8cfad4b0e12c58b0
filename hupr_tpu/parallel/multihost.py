"""Multi-host (multi-process) SPMD support: per-host-sharded data loading
and distributed evaluation (SURVEY.md §2.10: "jax.distributed.initialize +
DCN only for multi-host; data loading sharded per host").

Model: `HUPR_MULTIHOST=1 python main.py ...` on every process (main.py calls
jax.distributed.initialize). Training runs ONE global data-parallel mesh over
all processes' devices; each host assembles only its own slice of every
(padded) global batch and contributes it via
jax.make_array_from_process_local_data — the gradient all-reduce spans hosts
over DCN. Evaluation is embarrassingly parallel instead: each host runs
sequence-mode eval (engine/seq_eval.py) over its round-robin share of the
sequences on its LOCAL devices (no cross-host traffic), writes a rank file,
and process 0 merges + scores; the AP is broadcast so every process agrees
on best-model tracking.

Requirement: the data dir and the ./logs output dir must live on a
filesystem shared by all processes (rank-file merge, process-0-only
checkpointing, resume). Runner verifies this at startup with
assert_shared_dir.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def assert_shared_dir(path: str) -> None:
    """Fail fast if `path` is not on a filesystem every process can see —
    the rank-file eval merge and process-0-only checkpointing require one.
    Process 0 drops a probe file; everyone else must observe it."""
    probe = os.path.join(path, ".hupr_shared_fs_probe")
    if process_index() == 0:
        os.makedirs(path, exist_ok=True)
        with open(probe, "w") as fp:
            fp.write("probe")
    barrier("hupr_shared_fs_probe_written")
    if not os.path.exists(probe):
        raise RuntimeError(
            f"multi-host runs need a shared output/data filesystem: process "
            f"{process_index()} cannot see {probe} written by process 0")
    barrier("hupr_shared_fs_probe_checked")
    if process_index() == 0:
        os.remove(probe)


def local_row_range(padded_rows: int) -> tuple:
    """This process's contiguous slice [lo, hi) of a padded global batch.
    Rows map to devices in order, so process p (owning the p-th block of
    the mesh's device axis) owns the p-th block of rows. `padded_rows` must
    divide the process count (shard_batch pads to a device-count multiple,
    and devices divide evenly across processes)."""
    n = process_count()
    rows = padded_rows // n
    lo = process_index() * rows
    return lo, lo + rows


def global_shard_batch(local_batch: dict, mesh, padded_rows: int,
                       true_rows: int) -> tuple:
    """Multi-host analogue of parallel.mesh.shard_batch: `local_batch` holds
    ONLY this process's rows (local_row_range of the padded global batch);
    every leaf becomes a global jax.Array sharded over the mesh's data axis.
    Adds the global loss/BN "mask" leaf. Returns (sharded, true_rows)."""
    import jax

    from hupr_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh)
    lo, hi = local_row_range(padded_rows)
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape=(padded_rows,) + v.shape[1:])
    mask = (np.arange(lo, hi) < true_rows).astype(np.float32)
    out["mask"] = jax.make_array_from_process_local_data(
        sharding, mask, global_shape=(padded_rows,))
    return out, true_rows


def replicate_tree(tree, mesh):
    """Replicate a host-identical pytree over a (possibly multi-host) mesh.
    Every process must hold the same values (e.g. same-seed init or a
    checkpoint read by all)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x)), tree)


def barrier(tag: str) -> None:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def broadcast_scalar(value: float) -> float:
    """Process 0's value, on every process."""
    from jax.experimental import multihost_utils
    return float(multihost_utils.broadcast_one_to_all(
        np.asarray(value, np.float32)))


def rank_result_path(out_dir: str, phase: str, pid: Optional[int] = None
                     ) -> str:
    pid = process_index() if pid is None else pid
    return os.path.join(out_dir, f"{phase}_results.rank{pid}.json")


def merge_rank_results(out_dir: str, phase: str, final_path: str) -> None:
    """Process 0: concatenate every rank's keypoint blocks (deterministic
    image_id order — the evaluator is order-independent, the file is not),
    write the standard results JSON, and remove the rank files."""
    blocks = []
    for pid in range(process_count()):
        path = rank_result_path(out_dir, phase, pid)
        with open(path) as fp:
            blocks.extend(json.load(fp))
        os.remove(path)
    blocks.sort(key=lambda b: b["image_id"])
    with open(final_path, "w") as fp:
        json.dump(blocks, fp)
