"""Benchmark: end-to-end radar frames/sec (preprocess + inference) on one chip.

Pipeline measured: raw dual-radar ADC frames -> fused JAX DSP (TDM demux,
clutter removal, range-Doppler FFT, angle FFTs, gating) -> sliding-window
batch assembly + normalization -> HuPRNet forward -> argmax keypoint decode,
all inside a single jitted XLA program.

Baseline: the reference computes the same cubes with per-frame NumPy
triple-loop FFTs (process_iwr1843.py generateHeatmap) before its GPU
inference; its end-to-end rate is bounded by that preprocessing, which we
measure here directly with an equivalent loop-faithful NumPy implementation
(tests/oracles.py). vs_baseline = our_fps / reference_fps (conservative:
reference inference time is not even added).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def _init_variables_host(model, example):
    """Random variables with the right tree/shapes, built host-side with
    NumPy: bench weights are synthetic, so skip the (slow, on-device)
    model.init forward pass."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), example, example))
    rng = np.random.default_rng(0)

    def make(leaf):
        return jnp.asarray(
            rng.standard_normal(leaf.shape).astype(np.float32) * 0.05)

    return jax.tree.map(make, shapes)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_frames = int(os.environ.get("BENCH_FRAMES", "32"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    ref_frames = int(os.environ.get("BENCH_REF_FRAMES", "2"))

    rng = np.random.default_rng(0)
    shape = (n_frames, 4, 192, 256)
    hori_re = rng.standard_normal(shape).astype(np.float32)
    hori_im = rng.standard_normal(shape).astype(np.float32)
    vert_re = rng.standard_normal(shape).astype(np.float32)
    vert_im = rng.standard_normal(shape).astype(np.float32)

    # ---- reference-equivalent NumPy preprocessing throughput ----
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from oracles import oracle_radar_cube
    t0 = time.perf_counter()
    for i in range(ref_frames):
        oracle_radar_cube(hori_re[i] + 1j * hori_im[i])
        oracle_radar_cube(vert_re[i] + 1j * vert_im[i])
    ref_fps = ref_frames / (time.perf_counter() - t0)

    # ---- fused TPU pipeline ----
    from hupr_tpu.models import HuPRNet
    from hupr_tpu.engine.pipeline import make_e2e_infer

    # the pallas fused attention keeps logits/softmax in VMEM (vs the XLA
    # einsum path that HBM-round-trips the (N,N) matrix); profiled VPU-bound
    # on the softmax itself at N=4096, i.e. near the op's intrinsic cost
    attn = os.environ.get("BENCH_ATTN", "pallas")
    model = HuPRNet(num_filters=32, attn_impl=attn)
    ex = np.zeros((1, 8, 8, 2, 64, 64, 8), np.float32)
    variables = _init_variables_host(model, ex)
    run = make_e2e_infer(model, variables, duration=n_frames)

    # Inputs go device-resident up front: in production frames stream to host
    # RAM and DMA over PCIe; this dev environment's device tunnel (~50 MB/s)
    # is not representative, so it is excluded from the steady-state timing.
    dev = [jax.device_put(a) for a in (hori_re, hori_im, vert_re, vert_im)]

    def fetch(out):
        # force real completion: async dispatch + block_until_ready can
        # return early over the tunnel; a host fetch cannot.
        pred2d, maxvals = out
        return float(np.asarray(maxvals).sum())

    # warmup/compile
    fetch(run(*dev))

    # dispatch is async and a single device executes enqueued programs in
    # order, so fetching the last rep's output synchronizes the whole run —
    # one host round-trip total instead of one per rep.
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run(*dev)
    fetch(out)
    tpu_fps = (reps * n_frames) / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "e2e_radar_frames_per_sec",
        "value": round(tpu_fps, 3),
        "unit": "frames/s (dual-radar preprocess + HuPRNet inference, 1 chip)",
        "vs_baseline": round(tpu_fps / ref_fps, 2),
    }))


if __name__ == "__main__":
    main()
