"""Worker program for the 2-process jax.distributed CPU test
(test_multihost.py). Each process contributes 4 virtual CPU devices to a
global 8-device data-parallel mesh and runs one full sharded train step —
the exact code path HUPR_MULTIHOST=1 enables in main.py (multi-host SPMD
over DCN, SURVEY.md §2.10).

Usage: python multihost_worker.py <coordinator_port> <process_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hupr_tpu.config import Config
    from hupr_tpu.engine.steps import (init_state, make_optimizer,
                                       make_train_step)
    from hupr_tpu.models import build_model

    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    # reduced 32x32 geometry: identical graph + cross-process all-reduce
    # structure to the flagship 64x64, several-fold faster concurrent
    # cold compiles on this 1-core host
    cfg = Config()
    cfg.MODEL.numFilters = 2
    cfg.DATASET.rangeSize = cfg.DATASET.azimuthSize = 32
    cfg.DATASET.heatmapSize = 32
    cfg.DATASET.imgSize = 128
    model = build_model(cfg)
    tx = make_optimizer(cfg)

    # identical seed on every process -> identical replicated state
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x)), state)

    # each process contributes its local half of the global batch of 8
    rng = np.random.default_rng(7)  # same stream; rows split below
    shape = (8, 8, 8, 2, 32, 32, 8)
    full = {
        "hori": rng.standard_normal(shape).astype(np.float32),
        "vert": rng.standard_normal(shape).astype(np.float32),
        "jointsGroup": rng.uniform(10, 115, (8, 14, 2)),
    }
    lo, hi = pid * 4, pid * 4 + 4
    sharding = NamedSharding(mesh, P("data"))
    batch = {k: jax.make_array_from_process_local_data(sharding, v[lo:hi],
                                                       global_shape=v.shape)
             for k, v in full.items()}

    train_step = make_train_step(
        model, tx, geometry=(cfg.DATASET.numKeypoints,
                             cfg.DATASET.heatmapSize, cfg.DATASET.imgSize))
    state, metrics = train_step(state, batch, 1e-4, 0.0)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"MULTIHOST_OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
