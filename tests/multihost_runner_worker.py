"""Worker for the 2-process full-Runner multihost tests
(test_multihost.py::test_two_process_runner_*): each process contributes 4
virtual CPU devices to an 8-device global mesh, assembles only its own rows
of every padded train batch (BatchLoader process mode — or its block of
every padded chunk axis in chunk mode), runs one epoch incl. the per-epoch
distributed eval (per-host sequence shares, rank-file merge on process 0,
AP broadcast) and checkpointing on process 0.

Usage: python multihost_runner_worker.py <port> <pid> <workdir> [mode]
  mode: "classic" (default) | "chunk" (TRAINING.chunkTrain sharded per host)
"""

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4"
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hupr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(jax, "/tmp/jax_test_cache")


def main():
    port, pid, workdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "classic"
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    os.chdir(workdir)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_e2e import tiny_cfg

    from hupr_tpu.engine import Runner

    cfg = tiny_cfg("data")
    cfg.DATASET.trainName = [1, 2]
    cfg.DATASET.valName = [1, 2]
    cfg.DATASET.testName = [1, 2]
    # reduced 32x32 geometry matching the test's make_tiny_dataset(r=32,
    # a=32, img_size=128): same graph + collective structure as the
    # flagship, several-fold faster concurrent cold compiles on 1 core
    cfg.DATASET.rangeSize = cfg.DATASET.azimuthSize = 32
    cfg.DATASET.heatmapSize = 32
    cfg.DATASET.imgSize = 128
    # divisible by the 4 local devices: eval's per-host local mesh shards
    cfg.TEST.batchSize = 4
    if mode == "chunk":
        cfg.TRAINING.chunkTrain = True
    args = argparse.Namespace(seed=0, dir="mh", visDir="none", eval=False,
                              sampling_ratio=1, keypoints=False)
    runner = Runner(args, cfg)
    assert runner.n_proc == 2
    if mode == "chunk":
        assert runner._chunk_loader is not None
        assert runner._chunk_loader.process == (pid, 2)
    runner.train()
    print(f"MHRUNNER_OK pid={pid} best={runner.logger.show_best_ap():.6f}",
          flush=True)


if __name__ == "__main__":
    main()
