"""Train-step batch-size sweep: ms/step, samples/s, TFLOP/s, MFU per batch.

The flagship config trains at the reference's batch 20 (parity), but a
production run is free to raise it — this maps the throughput/MFU curve so
that choice is measured, not vibes. MODEL.remat=true trades FLOPs for
activation memory when a batch stops fitting HBM.

    python scripts/batch_sweep.py                 # B = 20 40 64, f32
    BS_LIST=20,64 BS_REMAT=1 python scripts/batch_sweep.py
    BS_DTYPE=bfloat16 python scripts/batch_sweep.py

One JSON line per configuration (not a bench.py replacement — findings go
to DEVNOTES/README with the date + tunnel context).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# raw (un-keyed) dir on purpose, like bench.py: TPU-target cache entries
# are host-CPU-independent; utils/cache's machine keying is for CPU AOT
# entries and would strand TPU entries across VM migrations
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    # the dev tunnel occasionally stalls on first contact (DEVNOTES);
    # bench's subprocess preflight retries before this process touches it
    from bench import _wait_for_backend
    _wait_for_backend()

    from hupr_tpu.config import Config
    from hupr_tpu.engine.steps import TrainState, make_optimizer, \
        make_train_step
    from hupr_tpu.models import build_model
    from hupr_tpu.utils.synthetic import synthetic_variables

    sizes = [int(b) for b in os.environ.get("BS_LIST", "20,40,64").split(",")]
    remat = os.environ.get("BS_REMAT", "0") == "1"
    dtype = os.environ.get("BS_DTYPE", "float32")
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    reps = int(os.environ.get("BS_REPS", "5"))

    cfg = Config()
    cfg.MODEL.attention = "pallas"
    cfg.MODEL.remat = remat
    cfg.MODEL.computeDtype = dtype
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    variables = synthetic_variables(model, (1, 8, 8, 2, 64, 64, 8))
    rng = np.random.default_rng(0)

    for b in sizes:
        # fresh device copies per size: the jitted step donates its state,
        # so reusing one params tree across sizes reads deleted buffers
        params = jax.tree.map(jnp.array, variables["params"])
        stats = jax.tree.map(jnp.array, variables.get("batch_stats", {}))
        state = TrainState(params=params, batch_stats=stats,
                           opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        shape = (b, 8, 8, 2, 64, 64, 8)
        batch = {
            "hori": jax.device_put(
                rng.standard_normal(shape).astype(np.float32)),
            "vert": jax.device_put(
                rng.standard_normal(shape).astype(np.float32)),
            "jointsGroup": jax.device_put(rng.uniform(20, 230, (b, 14, 2))),
        }
        step = make_train_step(model, tx)
        try:
            # bench.py's helper: handles the older-jax [dict] return shape
            # and degrades to 0.0 instead of aborting the measurement
            from bench import _compiled_flops
            flops = _compiled_flops(step, state, batch)
            if flops > 0:
                # cost_analysis can't see inside the Pallas custom calls;
                # add the decoder's 12 fwd+bwd attentions explicitly
                from hupr_tpu.ops.attention import mscsa_attention_flops
                flops += mscsa_attention_flops(b, include_backward=True)
            state, metrics = step(state, batch, 1e-4, 0.0)
            loss = float(metrics["loss"])
            assert np.isfinite(loss), f"non-finite loss at B={b}"
            t0 = time.perf_counter()
            for _ in range(reps):
                state, metrics = step(state, batch, 1e-4, 0.0)
            float(metrics["loss"])        # host fetch -> true completion
            dt = (time.perf_counter() - t0) / reps
        except Exception as exc:          # OOM et al: report, keep sweeping
            print(json.dumps({"batch": b, "remat": remat, "dtype": dtype,
                              "error": type(exc).__name__,
                              "detail": str(exc)[:200]}), flush=True)
            continue
        print(json.dumps({
            "batch": b, "remat": remat, "dtype": dtype,
            "ms_per_step": round(dt * 1e3, 2),
            "samples_per_sec": round(b / dt, 2),
            "tflops_per_step": round(flops / 1e12, 3),
            "tflops_per_sec": round(flops / dt / 1e12, 2),
            "mfu_vs_bf16_peak": round(flops / dt / peak, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
