"""Device-side A/B for MODEL.remat (models/hupr.py:40-48).

tests/test_remat.py pins the numerics (identical) and the program structure
(checkpoint barriers + encoder recompute survive lowering); this script
measures what only the real backend can answer — the HBM saving and the
recompute cost of the flagship train step:

    python scripts/remat_memory.py            # memory A/B (compile only)
    python scripts/remat_memory.py --time 5   # + timed steps (ships a batch)
    python scripts/remat_memory.py --batch 64 # the scaling story

Prints one JSON line: temp/argument/output bytes per variant and, with
--time, ms/step. XLA:CPU's buffer accounting reports no delta for this knob
(see the test's docstring) — run this on the TPU backend.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(batch: int, filters: int, remat: bool):
    import jax
    import jax.numpy as jnp

    from hupr_tpu.config import config_from_dict
    from hupr_tpu.engine.steps import (TrainState, make_optimizer,
                                       make_train_step)
    from hupr_tpu.models import build_model
    from hupr_tpu.utils.synthetic import synthetic_variables

    cfg = config_from_dict({"MODEL": {"numFilters": filters,
                                      "remat": remat,
                                      "attention": os.environ.get(
                                          "BENCH_ATTN", "pallas")}})
    model = build_model(cfg)
    shape = (batch, 8, 8, 2, 64, 64, 8)
    variables = synthetic_variables(model, shape)
    tx = make_optimizer(cfg)
    params = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(params=params,
                       batch_stats=jax.tree.map(
                           jnp.array, variables.get("batch_stats", {})),
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(1)
    batch_np = {
        "hori": rng.standard_normal(shape).astype(np.float32),
        "vert": rng.standard_normal(shape).astype(np.float32),
        "jointsGroup": rng.uniform(20, 230, (batch, 14, 2)),
    }
    return make_train_step(model, tx), state, batch_np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--filters", type=int, default=32)
    ap.add_argument("--time", type=int, default=0, metavar="REPS",
                    help="also run REPS timed steps per variant")
    args = ap.parse_args()

    import jax

    # raw (un-keyed) dir on purpose, like bench.py: this script compiles
    # TPU-target programs, whose cache entries are host-CPU-independent —
    # utils/cache.enable_persistent_cache's machine keying exists for CPU
    # AOT entries and would strand TPU entries across VM migrations
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {"batch": args.batch, "filters": args.filters,
           "backend": jax.devices()[0].platform}
    for remat in (False, True):
        tag = "remat" if remat else "base"
        step, state, batch_np = build(args.batch, args.filters, remat)
        t0 = time.perf_counter()
        compiled = step.lower(state, batch_np, 1e-4, 0.0).compile()
        out[f"{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
        ma = compiled.memory_analysis()
        if ma is not None:
            out[f"{tag}_temp_mb"] = round(ma.temp_size_in_bytes / 1e6, 1)
            out[f"{tag}_arg_mb"] = round(ma.argument_size_in_bytes / 1e6, 1)
            out[f"{tag}_out_mb"] = round(ma.output_size_in_bytes / 1e6, 1)
        if args.time:
            batch_dev = {k: jax.device_put(v) for k, v in batch_np.items()}
            state, metrics = compiled(state, batch_dev, 1e-4, 0.0)
            assert np.isfinite(float(metrics["loss"]))  # warmup + sync
            t0 = time.perf_counter()
            for _ in range(args.time):
                state, metrics = compiled(state, batch_dev, 1e-4, 0.0)
            float(metrics["loss"])  # host fetch -> true completion
            out[f"{tag}_ms_per_step"] = round(
                (time.perf_counter() - t0) / args.time * 1000.0, 1)
    if "base_temp_mb" in out and "remat_temp_mb" in out:
        out["temp_saved_mb"] = round(
            out["base_temp_mb"] - out["remat_temp_mb"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
