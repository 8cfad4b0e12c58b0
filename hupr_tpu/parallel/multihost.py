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
checkpointing, resume). Runner verifies the logs dir at startup with
assert_shared_dir (a probe file), and catches divergent per-host data
copies by asserting cross-host agreement on the dataset sizes
(assert_agreement) — hosts with different annotation files would otherwise
run different batch counts and hang the pod at a skewed collective.
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
    barrier("shared_fs_probe_written")
    # exchange the verdict through the coordination-service KV store BEFORE
    # anyone raises: a lone process raising between two barriers would leave
    # the rest hanging at the next barrier instead of failing fast with this
    # error — every process publishes what it saw, reads everyone else's,
    # and they all raise (or pass) together
    client = _coord_client()
    visible = [os.path.exists(probe)]
    if client is not None:
        key = _next_id("hupr_kv/fs_probe")
        client.key_value_set(f"{key}/{process_index()}",
                             "1" if visible[0] else "0")
        visible = [
            client.blocking_key_value_get(f"{key}/{p}",
                                          _SYNC_TIMEOUT_MS) == "1"
            for p in range(process_count())]
    if process_index() == 0:
        # everyone has looked (all verdicts were published before any read
        # completes, and process 0 read them all)
        os.remove(probe)
    if not all(visible):
        bad = [i for i, v in enumerate(visible) if not v]
        raise RuntimeError(
            f"multi-host runs need a shared output/data filesystem: "
            f"process(es) {bad} cannot see {probe} written by process 0")


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


# Control-plane sync (barriers, verdicts, scalar broadcasts) rides the
# jax.distributed coordination service, NOT device collectives: the first
# device collective between two processes initializes its communicator
# (Gloo on CPU, ICI/DCN on TPU) with a hard ~30 s rendezvous window, so any
# sync point whose arrival skew can exceed it — e.g. right after
# per-process jit compiles, where one process may hit the persistent
# compile cache and the other not — would poison the whole program. The
# coordination service tolerates _SYNC_TIMEOUT_MS of skew.
_SYNC_TIMEOUT_MS = 600_000
_seq: dict = {}


def _coord_client():
    """The coordination-service client (None outside jax.distributed)."""
    from jax._src import distributed
    return distributed.global_state.client


def _next_id(tag: str) -> str:
    """Barrier ids / KV keys are single-use on the coordination service;
    suffix a per-tag sequence number. SPMD call order keeps it identical
    across processes."""
    n = _seq.get(tag, 0)
    _seq[tag] = n + 1
    return f"{tag}/{n}"


def barrier(tag: str) -> None:
    client = _coord_client()
    if client is None:   # single-process / no coordination service
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)
        return
    client.wait_at_barrier(_next_id(f"hupr_b/{tag}"), _SYNC_TIMEOUT_MS)


def broadcast_scalar(value: float) -> float:
    """Process 0's value, on every process."""
    client = _coord_client()
    if client is None:
        from jax.experimental import multihost_utils
        return float(multihost_utils.broadcast_one_to_all(
            np.asarray(value, np.float32)))
    key = _next_id("hupr_kv/bcast")
    if process_index() == 0:
        client.key_value_set(key, repr(float(value)))
    return float(client.blocking_key_value_get(key, _SYNC_TIMEOUT_MS))


def allgather_scalar(value: float) -> list:
    """Every process's value, in process order, via the coordination-service
    KV store (no device collectives — tolerant of arbitrary skew, and every
    process sees the same list, so agreement checks raise on ALL processes
    together instead of leaving the others hanging at the next collective)."""
    client = _coord_client()
    if client is None:
        return [float(value)]
    key = _next_id("hupr_kv/ag")
    client.key_value_set(f"{key}/{process_index()}", repr(float(value)))
    return [
        float(client.blocking_key_value_get(f"{key}/{p}", _SYNC_TIMEOUT_MS))
        for p in range(process_count())]


def assert_agreement(tag: str, value: float) -> None:
    """Fail fast — on EVERY process together — if `value` differs across
    hosts. Rides the KV-store allgather, so a disagreement raises everywhere
    with the per-process values instead of stranding the others at the next
    collective."""
    if process_count() == 1:
        return
    vals = allgather_scalar(float(value))
    if any(v != vals[0] for v in vals):
        raise RuntimeError(
            f"multi-host disagreement on {tag}: per-process values "
            f"{vals} — all hosts must see the same data/config")


def warmup_device_collectives(mesh) -> None:
    """Establish the cross-process device-collective communicator while
    processes are tightly synchronized (right after the coordination
    barrier), so its one-time ~30 s rendezvous never races per-process
    compile skew; later collectives (train-step gradient psums) reuse it."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if process_count() == 1:
        return
    barrier("collective_warmup")
    ndev = mesh.devices.size
    nloc = ndev // process_count()
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    x = jax.make_array_from_process_local_data(
        sharding, np.ones((nloc,), np.float32), global_shape=(ndev,))
    s = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    np.asarray(s.addressable_data(0))  # block until the all-reduce ran


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
