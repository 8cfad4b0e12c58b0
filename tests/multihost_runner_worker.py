"""Worker for the multi-process full-Runner multihost tests
(test_multihost.py::test_two_process_runner_* / test_four_process_*): the
`nproc` processes each contribute `8 // nproc` virtual CPU devices to an
8-device global mesh, assemble only their own rows of every padded train
batch (BatchLoader process mode — or their block of every padded chunk axis
in chunk mode), run one epoch incl. the per-epoch distributed eval
(per-host round-robin sequence shares, rank-file merge on process 0, AP
broadcast) and checkpointing on process 0.

Usage: python multihost_runner_worker.py <port> <pid> <workdir> [mode] [nproc]
  mode: "classic" (default) | "chunk" (TRAINING.chunkTrain sharded per host)
  nproc: 2 (default) | 4 — 4 uses three sequences, so ranks beyond 1 hold
    real eval shares AND rank 3 holds an EMPTY share (3 sequences round-robin
    over 4 ranks), the nproc>2 edge cases VERDICT r4 flagged.
"""

import argparse
import os
import sys

_NPROC = int(sys.argv[5]) if len(sys.argv) > 5 else 2

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={8 // _NPROC}").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hupr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(jax, "/tmp/jax_test_cache")


def main():
    port, pid, workdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "classic"
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=_NPROC, process_id=pid)
    assert jax.process_count() == _NPROC and len(jax.devices()) == 8

    os.chdir(workdir)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_e2e import tiny_cfg

    from hupr_tpu.engine import Runner

    cfg = tiny_cfg("data")
    seqs = [1, 2] if _NPROC == 2 else [1, 2, 3]
    cfg.DATASET.trainName = seqs
    cfg.DATASET.valName = seqs
    cfg.DATASET.testName = seqs
    # reduced 32x32 geometry matching the test's make_tiny_dataset(r=32,
    # a=32, img_size=128): same graph + collective structure as the
    # flagship, several-fold faster concurrent cold compiles on 1 core
    cfg.DATASET.rangeSize = cfg.DATASET.azimuthSize = 32
    cfg.DATASET.heatmapSize = 32
    cfg.DATASET.imgSize = 128
    # divisible by the local device count: eval's per-host local mesh shards
    cfg.TEST.batchSize = 4
    if mode == "chunk":
        cfg.TRAINING.chunkTrain = True
    args = argparse.Namespace(seed=0, dir="mh", visDir="none", eval=False,
                              sampling_ratio=1, keypoints=False)
    runner = Runner(args, cfg)
    assert runner.n_proc == _NPROC
    if mode == "chunk":
        assert runner._chunk_loader is not None
        assert runner._chunk_loader.process == (pid, _NPROC)
    runner.train()
    print(f"MHRUNNER_OK pid={pid} best={runner.logger.show_best_ap():.6f}",
          flush=True)


if __name__ == "__main__":
    main()
