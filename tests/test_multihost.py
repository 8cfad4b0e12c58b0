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
            out, _ = p.communicate(timeout=540)
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
