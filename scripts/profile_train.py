"""Profile the flagship train step (or serving program with MODE=serve) on
the TPU and print per-op time attribution from the xplane trace.

Usage: [MODE=serve] [PROF_BATCH=128 PROF_DTYPE=bfloat16 PROF_REMAT=1]
       python scripts/profile_train.py
The PROF_* knobs profile alternative train operating points (e.g. the
config/mscsa_prgcn_tpu_max.yaml composition). DMA lines overlap compute,
so sums are attribution hints, not wall time (DEVNOTES profiling recipe).
"""

import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    from bench import _init_variables_host
    from hupr_tpu.models import HuPRNet

    rng = np.random.default_rng(0)
    dtype = {"float32": None, "bfloat16": jnp.bfloat16}[
        os.environ.get("PROF_DTYPE", "float32")]
    model = HuPRNet(num_filters=32, attn_impl="pallas", dtype=dtype,
                    remat=os.environ.get("PROF_REMAT", "0") == "1")
    ex = np.zeros((1, 8, 8, 2, 64, 64, 8), np.float32)
    variables = _init_variables_host(model, ex)
    trace_dir = "/tmp/hupr_profile"

    if os.environ.get("MODE") == "serve":
        from hupr_tpu.engine.pipeline import make_e2e_infer
        n_frames = 32
        shape = (n_frames, 4, 192, 256)
        dev = [jax.device_put(rng.standard_normal(shape).astype(np.float32))
               for _ in range(4)]
        run = make_e2e_infer(model, variables, duration=n_frames)
        out = run(*dev)
        float(np.asarray(out[1]).sum())
        jax.profiler.start_trace(trace_dir)
        out = run(*dev)
        float(np.asarray(out[1]).sum())
        jax.profiler.stop_trace()
    else:
        from hupr_tpu.config import Config
        from hupr_tpu.engine.steps import (TrainState, make_optimizer,
                                           make_train_step)
        cfg = Config()
        tx = make_optimizer(cfg)
        params = jax.tree.map(jnp.array, variables["params"])
        state = TrainState(params=params,
                           batch_stats=jax.tree.map(
                               jnp.array, variables.get("batch_stats", {})),
                           opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        b = int(os.environ.get("PROF_BATCH", cfg.TRAINING.batchSize))
        tshape = (b, 8, 8, 2, 64, 64, 8)
        batch = {
            "hori": jax.device_put(
                rng.standard_normal(tshape).astype(np.float32)),
            "vert": jax.device_put(
                rng.standard_normal(tshape).astype(np.float32)),
            "jointsGroup": jax.device_put(rng.uniform(20, 230, (b, 14, 2))),
        }
        train_step = make_train_step(model, tx)
        state, metrics = train_step(state, batch, 1e-4, 0.0)
        float(metrics["loss"])
        jax.profiler.start_trace(trace_dir)
        state, metrics = train_step(state, batch, 1e-4, 0.0)
        float(metrics["loss"])
        jax.profiler.stop_trace()

    # ---- parse the xplane and attribute time per op name
    import glob
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb"))
    latest = max(paths, key=os.path.getmtime)
    pd = jax.profiler.ProfileData.from_file(latest)
    per_op = defaultdict(float)
    total = 0.0
    for plane in pd.planes:
        # plane naming varies by runtime version: 'TPU ... #Chip0' vs
        # '/device:TPU:0'; take any TPU plane that actually carries lines
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "dma" in lname or "transfer" in lname:
                continue  # attribution: compute lines only
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name.split(".")[0]
                per_op[name] += dur
                total += dur
    print(f"total attributed compute: {total:.2f} ms")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.3f} ms  {100*ms/max(total,1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
