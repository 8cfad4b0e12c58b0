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

Prints ONE JSON line. Primary keys {"metric", "value", "unit",
"vs_baseline"} are the device-resident serving rate; extra keys cover the
other BASELINE configs:
  train_ms_per_step / train_samples_per_sec — flagship batch-20 fused
    train step (fwd+bwd+Adam), reference config #4 (tools/run.py:65-86)
  ingest_frames_per_sec — serving INCLUDING host->device raw-ADC transfer
    (double-buffered via async dispatch; tunnel-bound in this dev env)
  stream_latency_ms — per-frame latency of the fused streaming estimator,
    device-resident steady state incl. the single packed (K,3) result fetch
  loader_samples_per_sec — host-side BatchLoader assembly rate over real
    .npy files (warm page cache, cold FrameCache, best-of-3),
    SETUP.numWorkers threads
  epoch_samples_per_sec — the COMPOSED training loop (BatchLoader +
    device_prefetch + train_step over real .npy files, best-of-3 epochs):
    the end-to-end rate a real epoch sustains, host- or device-bound
  chunk_epoch_samples_per_sec — the composed loop with TRAINING.chunkTrain
    (engine/chunk_train.py): frame unions ship once, windows gather on
    device — the fix for the host-bound classic loop
  adc_epoch_samples_per_sec — the composed FUSED-ADC training loop
    (TRAINING.chunkSource: adc): raw int16 stream slices memmap'd straight
    from capture .bin files, decode + DSP + train in one XLA program — the
    north-star "fused preprocessing -> train" config, no .npy hop at all
  adc_seq_eval_frames_per_sec — the composed FUSED-ADC eval loop
    (TEST.sequenceSource: adc): raw int16 capture slices -> device decode +
    DSP + windowed eval, no .npy hop (the eval twin of the adc epoch key)
  seq_eval_frames_per_sec — full eval-path rate (reference config #3) in
    sequence mode (engine/seq_eval.py): real .npy reads + host->device
    per-frame planes + device windowing/forward/loss/decode + deferred
    result fetch (best-of-3 passes)
  ref_frames_per_sec — the reference-equivalent NumPy preprocessing rate
    the vs_baseline ratio divides by. Definition (since r04): per-frame
    best-of (min per-frame time — robust to this 1-core VM's scheduling
    noise, which only ever slows a frame down), sampled until
    >= BENCH_REF_SECONDS elapsed (r03 used best-of-2 frames; r01/r02 used
    a 2-frame mean — cross-round vs_baseline comparisons are not
    like-for-like across those definition changes)
  train_tflops_per_step / train_tflops_per_sec / train_mfu_vs_bf16_peak —
    XLA cost-model FLOPs of the compiled train step (plus the Pallas
    attentions' flops, invisible to cost_analysis — see
    ops/attention.mscsa_attention_flops) and the sustained rate vs the
    chip's bf16 peak (BENCH_PEAK_TFLOPS, default 197 = v5e)
  *_bf16wire — chunk-epoch / seq-eval with SETUP.transferDtype=bfloat16
    (half the host->device bytes; the best shippable transfer-bound config)
  e2e_frames_per_sec_bf16compute / train_ms_per_step_bf16compute —
    MODEL.computeDtype=bfloat16 A/B (numerics: tests/test_bf16_compute.py)
  train_max_batch / train_max_ms_per_step / train_max_samples_per_sec /
    train_max_mfu_vs_bf16_peak — the max-throughput training operating
    point (config/mscsa_prgcn_tpu_max.yaml: batch 128 + bf16 compute +
    MODEL.remat; remat lifts the no-remat HBM wall at B~64-96)
  attn_impl — the attention implementation all model-path keys measure

Env knobs: BENCH_FRAMES, BENCH_REPS, BENCH_REF_FRAMES, BENCH_REF_SECONDS,
BENCH_ATTN, BENCH_PEAK_TFLOPS; BENCH_TRAIN=0, BENCH_STREAM=0,
BENCH_INGEST=0, BENCH_LOADER=0, BENCH_SEQEVAL=0, BENCH_EPOCH=0,
BENCH_WIRE_AB=0, BENCH_BF16=0 to skip parts. BENCH_WIRE=bfloat16|float16
additionally runs the CLASSIC epoch path with the half-width
SETUP.transferDtype wire format (chunk/seq-eval record both formats
unconditionally); the driver default stays float32 (bit-faithful).
"""

import json
import os
import sys
import time

import numpy as np


def _init_variables_host(model, example):
    """Random variables with the right tree/shapes, built host-side with
    NumPy: bench weights are synthetic, so skip the (slow, on-device)
    model.init forward pass. Running variances are drawn positive — a naive
    all-leaves normal draw NaN'd every forward via rsqrt(negative var)."""
    from hupr_tpu.utils.synthetic import synthetic_variables

    return synthetic_variables(model, example.shape)


def _wait_for_backend(attempts=4, probe_timeout=300, sleep_s=30):
    """The dev TPU tunnel occasionally stalls or refuses the first contact
    after heavy use; a retry has always recovered it (DEVNOTES.md). Probe in
    a subprocess so a failed init isn't cached in this process, and only
    fall through (to the real error) after several spaced attempts.
    BENCH_PREFLIGHT=0 skips."""
    import subprocess

    if os.environ.get("BENCH_PREFLIGHT", "1") == "0":
        return
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace").strip().splitlines()
            err = err[-1] if err else "(no stderr)"
        except subprocess.TimeoutExpired:
            err = f"probe hung > {probe_timeout}s"
        print(f"bench preflight: backend probe {attempt + 1}/{attempts} "
              f"failed: {err}", file=sys.stderr)
        if attempt < attempts - 1:
            time.sleep(sleep_s)


def main():
    import jax

    _wait_for_backend()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_frames = int(os.environ.get("BENCH_FRAMES", "32"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    ref_frames = int(os.environ.get("BENCH_REF_FRAMES", "3"))
    ref_secs = float(os.environ.get("BENCH_REF_SECONDS", "10"))

    rng = np.random.default_rng(0)
    shape = (n_frames, 4, 192, 256)
    hori_re = rng.standard_normal(shape).astype(np.float32)
    hori_im = rng.standard_normal(shape).astype(np.float32)
    vert_re = rng.standard_normal(shape).astype(np.float32)
    vert_im = rng.standard_normal(shape).astype(np.float32)

    # ---- reference-equivalent NumPy preprocessing throughput ----
    # per-frame best-of: scheduling contention on this shared VM only ever
    # SLOWS a frame down, so min(per-frame time) is the stable estimate
    # (the single-interval mean swung 4x between rounds on unchanged code).
    # Frames are timed until >= BENCH_REF_SECONDS have elapsed AND at least
    # BENCH_REF_FRAMES were measured (best-of-2 was still a 2-sample
    # estimator of a ~4 s/frame oracle; ~10 s of samples stabilizes it).
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from oracles import oracle_radar_cube
    best_dt = float("inf")
    i, t_ref = 0, time.perf_counter()
    while i < ref_frames or time.perf_counter() - t_ref < ref_secs:
        j = i % n_frames
        t0 = time.perf_counter()
        oracle_radar_cube(hori_re[j] + 1j * hori_im[j])
        oracle_radar_cube(vert_re[j] + 1j * vert_im[j])
        best_dt = min(best_dt, time.perf_counter() - t0)
        i += 1
    ref_fps = 1.0 / best_dt

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

    # ---- max-throughput training point (config/mscsa_prgcn_tpu_max.yaml:
    # batch 128 + bf16 compute + MODEL.remat — the measured 183 samples/s
    # 48% MFU operating point, scripts/batch_sweep.py 2026-08-20). Runs
    # FIRST, on a pristine device: the program wants nearly the whole
    # 16 GB HBM (the no-remat wall is 15.83/15.75 GB) and the later
    # sections' residency/fragmentation tips it into RESOURCE_EXHAUSTED
    # (observed when this section ran last, even with buffers freed).
    # Wrapped so an HBM regression or tunnel hiccup degrades to missing
    # keys, not a dead bench line.
    result_max = {}
    if os.environ.get("BENCH_MAXTRAIN", "1") != "0" and \
            os.environ.get("BENCH_TRAIN", "1") != "0":
        import gc

        import jax.numpy as jnp
        try:
            model_max = HuPRNet(num_filters=32, attn_impl=attn,
                                dtype=jnp.bfloat16, remat=True)
            b_max = int(os.environ.get("BENCH_MAXTRAIN_BATCH", "128"))
            dt, b_max, mstep, mstate, mbatch = _time_train_step(
                model_max, variables, reps, batch_size=b_max)
            result_max["train_max_batch"] = b_max
            result_max["train_max_ms_per_step"] = round(dt * 1000.0, 2)
            result_max["train_max_samples_per_sec"] = round(b_max / dt, 2)
            flops = _compiled_flops(mstep, mstate, mbatch)
            if flops > 0:
                if attn == "pallas":
                    from hupr_tpu.ops.attention import mscsa_attention_flops
                    flops += mscsa_attention_flops(b_max,
                                                   include_backward=True)
                peak = float(os.environ.get("BENCH_PEAK_TFLOPS",
                                            "197")) * 1e12
                result_max["train_max_mfu_vs_bf16_peak"] = round(
                    flops / dt / peak, 4)
        except Exception as exc:
            print(f"bench: max-throughput train point skipped: {exc}",
                  file=sys.stderr)
        # release the ~15 GB of B=128 residency before the serving sections
        model_max = mstep = mstate = mbatch = None
        gc.collect()
        jax.clear_caches()

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

    # warmup/compile (+ guard: a NaN forward times the same but measures
    # a garbage program — this bit round 1-3 via negative synthetic BN vars)
    assert np.isfinite(fetch(run(*dev))), "e2e forward non-finite"

    # dispatch is async and a single device executes enqueued programs in
    # order, so fetching the last rep's output synchronizes the whole run —
    # one host round-trip total instead of one per rep.
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run(*dev)
    fetch(out)
    tpu_fps = (reps * n_frames) / (time.perf_counter() - t0)

    result = {
        "metric": "e2e_radar_frames_per_sec",
        "value": round(tpu_fps, 3),
        "unit": "frames/s (dual-radar preprocess + HuPRNet inference, 1 chip)",
        "vs_baseline": round(tpu_fps / ref_fps, 2),
        "ref_frames_per_sec": round(ref_fps, 4),
        # the attention implementation every model-path key below measures
        # (the parity config config/mscsa_prgcn.yaml ships attention: xla;
        # the TPU-tuned mscsa_prgcn_tpu.yaml and this bench default pallas)
        "attn_impl": attn,
    }

    # ---- ingest-inclusive serving: host->device transfer in the loop,
    # double-buffered (async dispatch overlaps the next device_put with the
    # current compute). Tunnel-bound here (~50 MB/s); on a production host
    # this is the PCIe/DMA-inclusive number.
    if os.environ.get("BENCH_INGEST", "1") != "0":
        # ship int16 I/Q planes — the DCA1000's native sample format — and
        # cast on device: half the wire bytes of f32, bit-exact result
        host = tuple((a * 100).astype(np.int16)
                     for a in (hori_re, hori_im, vert_re, vert_im))
        fetch(run(*[jax.device_put(a) for a in host]))  # compile int16 entry
        ingest_reps = max(2, reps // 3)
        t0 = time.perf_counter()
        out = None
        for _ in range(ingest_reps):
            dev_i = [jax.device_put(a) for a in host]
            out = run(*dev_i)
        fetch(out)
        result["ingest_frames_per_sec"] = round(
            (ingest_reps * n_frames) / (time.perf_counter() - t0), 3)

    # ---- training throughput: flagship batch-20 fused train step
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        dt, b, train_step, state, batch = _time_train_step(
            model, variables, reps)
        result["train_ms_per_step"] = round(dt * 1000.0, 2)
        result["train_samples_per_sec"] = round(b / dt, 2)

        # FLOPs accounting: XLA's own cost model for the compiled step is
        # the efficiency denominator ("is N ms/step good?"). MFU is quoted
        # against the chip's bf16 MXU peak (v5e / v5 lite: 197 TFLOP/s;
        # BENCH_PEAK_TFLOPS overrides for other chips) — deliberately the
        # HARSH denominator: the step runs exact-torch-semantics f32 convs,
        # so this number prices the remaining bf16 headroom instead of
        # hiding it behind an f32 peak.
        flops = _compiled_flops(train_step, state, batch)
        if flops > 0:
            # cost_analysis() sees zero flops inside custom calls, so when
            # the decoder runs Pallas attention its 12 fused attentions
            # (fwd+bwd under autodiff) must be added by hand — otherwise
            # the MFU key silently understates exactly when the fast path
            # is on (ops/attention.FWD_MATMULS/BWD_MATMULS derivation).
            if attn == "pallas":
                from hupr_tpu.ops.attention import mscsa_attention_flops
                flops += mscsa_attention_flops(b, include_backward=True)
            peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
            result["train_tflops_per_step"] = round(flops / 1e12, 3)
            result["train_tflops_per_sec"] = round(flops / dt / 1e12, 2)
            result["train_mfu_vs_bf16_peak"] = round(flops / dt / peak, 4)

    # ---- streaming latency: fused per-frame step, device-resident inputs,
    # including the per-frame packed (K, 3) result fetch
    if os.environ.get("BENCH_STREAM", "1") != "0":
        from hupr_tpu.engine.streaming import StreamingPoseEstimator

        est = StreamingPoseEstimator(model, variables)
        frame = (jax.device_put(hori_re[0]), jax.device_put(hori_im[0]))
        vframe = (jax.device_put(vert_re[0]), jax.device_put(vert_im[0]))
        for _ in range(3):  # compile first_step + step, reach steady state
            est.process_frame(frame, vframe)
        stream_n = 20
        t0 = time.perf_counter()
        for _ in range(stream_n):
            est.process_frame(frame, vframe)
        result["stream_latency_ms"] = round(
            (time.perf_counter() - t0) / stream_n * 1000.0, 2)

    # ---- host-side loader assembly rate over real .npy files (cold cache)
    if os.environ.get("BENCH_LOADER", "1") != "0":
        result["loader_samples_per_sec"] = round(_bench_loader(), 2)

    # ---- composed training loop: loader + prefetch + train step per epoch
    if os.environ.get("BENCH_TRAIN", "1") != "0" and \
            os.environ.get("BENCH_EPOCH", "1") != "0":
        result["epoch_samples_per_sec"] = round(
            _bench_epoch(model, variables), 2)

    # ---- chunk-mode composed training loop (TRAINING.chunkTrain): frames
    # shipped once + device-side window gather — the host-bound path's fix.
    # Recorded BOTH wire formats: f32 (bit-faithful default) and the
    # half-width SETUP.transferDtype=bfloat16 knob, so the best shippable
    # configuration of the transfer-bound paths is in the artifact of record
    # (BENCH_WIRE_AB=0 skips the bf16-wire passes).
    wire_ab = os.environ.get("BENCH_WIRE_AB", "1") != "0"
    if os.environ.get("BENCH_TRAIN", "1") != "0" and \
            os.environ.get("BENCH_EPOCH", "1") != "0":
        result["chunk_epoch_samples_per_sec"] = round(
            _bench_chunk_epoch(model, variables, wire=_wire_dtype()), 2)
        if wire_ab:
            from hupr_tpu.utils.transfer import transfer_dtype
            result["chunk_epoch_samples_per_sec_bf16wire"] = round(
                _bench_chunk_epoch(model, variables,
                                   wire=transfer_dtype("bfloat16")), 2)

    # ---- FUSED ADC composed training loop (TRAINING.chunkSource: adc):
    # raw int16 stream slices straight from capture .bin files, decode +
    # DSP + train inside one XLA program — no .npy hop at all. ~2.7x fewer
    # wire bytes than f32 cube planes; int16 is the sensor-native floor.
    if os.environ.get("BENCH_TRAIN", "1") != "0" and \
            os.environ.get("BENCH_EPOCH", "1") != "0":
        result["adc_epoch_samples_per_sec"] = round(
            _bench_adc_epoch(model, variables), 2)

    # ---- sequence-mode eval: the full benchmark-eval path over real files
    if os.environ.get("BENCH_SEQEVAL", "1") != "0":
        result["seq_eval_frames_per_sec"] = round(
            _bench_seq_eval(model, variables, wire_name=os.environ.get(
                "BENCH_WIRE", "float32")), 2)
        if wire_ab:
            result["seq_eval_frames_per_sec_bf16wire"] = round(
                _bench_seq_eval(model, variables, wire_name="bfloat16"), 2)
        # fused-ADC eval (TEST.sequenceSource: adc): int16 capture wire,
        # decode + DSP on device — the eval twin of adc_epoch_samples_per_sec
        result["adc_seq_eval_frames_per_sec"] = round(
            _bench_seq_eval(model, variables, adc=True), 2)

    # ---- MODEL.computeDtype=bfloat16 A/B: same params, matmul/conv compute
    # in bf16 (models/hupr.py dtype). Numerics are guarded by
    # tests/test_bf16_compute.py; this records whether the knob pays on the
    # chip (DEVNOTES: XLA already runs several f32 convs as bf16 passes, so
    # the expected win is small — measured here instead of vibes).
    if os.environ.get("BENCH_BF16", "1") != "0":
        import jax.numpy as jnp

        model_bf16 = HuPRNet(num_filters=32, attn_impl=attn,
                             dtype=jnp.bfloat16)
        run16 = make_e2e_infer(model_bf16, variables, duration=n_frames)
        # same garbage-program guard as the f32 path: a NaN forward times
        # identically but the recorded rate would describe nothing
        assert np.isfinite(fetch(run16(*dev))), "bf16 e2e forward non-finite"
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = run16(*dev)
        fetch(out)
        result["e2e_frames_per_sec_bf16compute"] = round(
            (reps * n_frames) / (time.perf_counter() - t0), 3)
        if os.environ.get("BENCH_TRAIN", "1") != "0":
            result["train_ms_per_step_bf16compute"] = round(
                _bench_train_bf16(model_bf16, variables, reps), 2)

    result.update(result_max)
    print(json.dumps(result))


def _compiled_flops(step_fn, state, batch) -> float:
    """Total FLOPs of one compiled train step per XLA's cost analysis.
    lower().compile() re-produces the identical HLO the jit call compiled,
    so the persistent cache absorbs the cost; returns 0.0 if the backend
    doesn't expose a cost model (never blocks the bench)."""
    try:
        ca = step_fn.lower(state, batch, 1e-4, 0.0).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):   # older jax returns [dict]
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as exc:
        print(f"bench: cost_analysis unavailable: {exc}", file=sys.stderr)
        return 0.0


def _wire_dtype():
    """BENCH_WIRE env knob -> numpy dtype for the transfer-bound benches
    (utils/transfer.py). Default float32 = the driver-recorded bit-faithful
    configuration; bfloat16/float16 A/B the half-width wire format."""
    from hupr_tpu.utils.transfer import transfer_dtype
    return transfer_dtype(os.environ.get("BENCH_WIRE", "float32"))


def _time_train_step(model, variables, reps: int, batch_size: int = None,
                     check_finite: bool = True):
    """Flagship fused train step at `batch_size` (default: the parity
    config's 20): build donated state + synthetic batch, compile (asserting
    a finite loss — a NaN program times the same but measures garbage), and
    time it. One definition shared by the f32, bf16-compute, and
    max-throughput keys so the A/Bs can never drift on setup. Returns
    (seconds/step, batch size, step fn, state, batch) — main() reuses the
    compiled step for the FLOPs/MFU keys."""
    import jax
    import jax.numpy as jnp

    from hupr_tpu.config import Config
    from hupr_tpu.engine.steps import (TrainState, make_optimizer,
                                       make_train_step)

    cfg = Config()
    tx = make_optimizer(cfg)
    # train_step donates its state: give it copies so the serving /
    # streaming sections keep their (shared) buffers alive
    params = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(
        params=params,
        batch_stats=jax.tree.map(jnp.array, variables.get("batch_stats", {})),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(1)
    b = batch_size if batch_size else cfg.TRAINING.batchSize  # 20
    tshape = (b, 8, 8, 2, 64, 64, 8)
    batch = {
        "hori": jax.device_put(rng.standard_normal(tshape).astype(np.float32)),
        "vert": jax.device_put(rng.standard_normal(tshape).astype(np.float32)),
        "jointsGroup": jax.device_put(rng.uniform(20, 230, (b, 14, 2))),
    }
    step = make_train_step(model, tx)
    state, metrics = step(state, batch, 1e-4, 0.0)  # compile
    if check_finite:
        assert np.isfinite(float(metrics["loss"])), "train loss non-finite"
    train_reps = max(3, reps // 2)
    t0 = time.perf_counter()
    for _ in range(train_reps):
        state, metrics = step(state, batch, 1e-4, 0.0)
    float(metrics["loss"])  # host fetch -> true completion
    return ((time.perf_counter() - t0) / train_reps, b, step, state, batch)


def _bench_train_bf16(model_bf16, variables, reps: int) -> float:
    """ms/step of the flagship batch-20 train step with
    MODEL.computeDtype=bfloat16 (same f32 params; matmul/conv compute in
    bf16). The A/B partner of train_ms_per_step."""
    dt, _, _, _, _ = _time_train_step(model_bf16, variables, reps)
    return dt * 1000.0


def _write_synthetic_dataset(root: str, duration: int, cubes: bool = True):
    """One sequence of full-size cubes + annotations under `root`
    (cubes=False writes only the annotations — the fused ADC bench never
    touches .npy cubes)."""
    from hupr_tpu.config import config_from_dict

    rng = np.random.default_rng(0)
    annots = []
    for view in ("hori", "vert"):
        os.makedirs(os.path.join(root, "single_1", view), exist_ok=True)
    blocks = []
    for f in range(duration):
        if cubes:
            cube = (rng.standard_normal((16, 64, 64, 8))
                    + 1j * rng.standard_normal((16, 64, 64, 8))
                    ).astype(np.complex64)
            for view in ("hori", "vert"):
                np.save(os.path.join(root, f"single_1/{view}/{f:09d}.npy"),
                        cube)
        joints = rng.uniform(40, 210, (14, 2)).tolist()
        xs = [j[0] for j in joints]
        ys = [j[1] for j in joints]
        blocks.append({"image": "%09d.jpg" % f, "joints": joints,
                       "bbox": [min(xs), min(ys), max(xs), max(ys)]})
    annots.append(blocks)
    for phase in ("train", "val", "test"):
        with open(os.path.join(root, f"hrnet_annot_{phase}.json"),
                  "w") as fp:
            json.dump(annots, fp)
    return config_from_dict({"DATASET": {
        "duration": duration, "dataDir": root,
        "trainName": [1], "valName": [1], "testName": [1]}})


def _write_synthetic_captures(cfg, root: str, duration: int, rp):
    """Per-view raw int16 capture .bin files for the fused-ADC paths, wired
    into cfg.DATASET.adcDir; returns the ADCFrameSource over them. One
    definition so the train and eval ADC benches can never drift apart on
    capture geometry/layout."""
    from hupr_tpu.data.adc import ADCFrameSource

    adc_root = os.path.join(root, "raw")
    cfg.DATASET.adcDir = adc_root
    rng = np.random.default_rng(0)
    s = 2 * rp.num_rx * rp.num_chirp * rp.num_adc_samples
    for view in ("hori", "vert"):
        d = os.path.join(adc_root, "single_1", view)
        os.makedirs(d, exist_ok=True)
        rng.integers(-300, 300, (duration * s,)).astype(
            np.int16).tofile(os.path.join(d, "adc_data.bin"))
    return ADCFrameSource(adc_root, rp)


def _bench_loader(duration: int = 24, batch: int = 8, workers: int = 4):
    """Write one sequence of full-size cubes to /tmp and measure BatchLoader
    sample-assembly throughput (mmap .npy read + chirp slice + stack):
    warm page cache, cold FrameCache, SETUP.numWorkers-threaded, best-of-3
    (this 1-core VM schedules erratically)."""
    import shutil
    import tempfile

    from hupr_tpu.data import BatchLoader, get_dataset

    root = tempfile.mkdtemp(prefix="hupr_bench_loader_")
    try:
        cfg = _write_synthetic_dataset(root, duration)

        def one_pass(ds):
            loader = BatchLoader(ds, batch, shuffle=False, workers=workers)
            n = 0
            for b in loader:
                n += len(b["imageId"])
            return n

        one_pass(get_dataset("val", cfg, 1))  # absorb cold-page-cache noise
        best = 0.0
        for _ in range(3):
            ds = get_dataset("val", cfg, 1)   # fresh FrameCache, untimed
            t0 = time.perf_counter()
            n = one_pass(ds)
            best = max(best, n / (time.perf_counter() - t0))
        return best
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_epoch(model, variables, duration: int = 60):
    """The COMPOSED training loop over real .npy files: BatchLoader (threaded
    host window assembly) + device_prefetch (transfer overlapped with
    compute) + fused train_step, with loss fetches deferred one step exactly
    as Runner.train runs it. Best-of-3 epochs, fresh FrameCache each.
    This is the number a real epoch sustains — min(loader, device) rate plus
    pipeline losses (the reference equivalent: tools/run.py:65-86)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from hupr_tpu.data import BatchLoader, get_dataset
    from hupr_tpu.engine.steps import (TrainState, make_optimizer,
                                       make_train_step)
    from hupr_tpu.parallel import make_mesh
    from hupr_tpu.parallel.mesh import device_prefetch

    root = tempfile.mkdtemp(prefix="hupr_bench_epoch_")
    try:
        cfg = _write_synthetic_dataset(root, duration)
        b = cfg.TRAINING.batchSize  # 20, the flagship recipe
        tx = make_optimizer(cfg)
        t_params = jax.tree.map(jnp.array, variables["params"])
        state = TrainState(
            params=t_params,
            batch_stats=jax.tree.map(jnp.array,
                                     variables.get("batch_stats", {})),
            opt_state=tx.init(t_params),
            step=jnp.zeros((), jnp.int32))
        train_step = make_train_step(model, tx)
        mesh = make_mesh()

        def one_epoch(ds, state):
            loader = BatchLoader(ds, b, shuffle=True, seed=0,
                                 workers=cfg.SETUP.numWorkers,
                                 transfer_dtype=_wire_dtype())
            n, pending = 0, None
            for dev_batch, _, true_b in device_prefetch(loader, mesh,
                                                        pad_to=b):
                state, metrics = train_step(state, dev_batch, 1e-4, 0.0)
                if pending is not None:
                    float(pending["loss"])  # deferred: Runner.train's pattern
                pending = metrics
                n += true_b
            if pending is not None:
                float(pending["loss"])
            return n, state

        _, state = one_epoch(get_dataset("train", cfg, 1), state)  # compile
        best = 0.0
        for _ in range(3):
            ds = get_dataset("train", cfg, 1)  # fresh FrameCache, untimed
            t0 = time.perf_counter()
            n, state = one_epoch(ds, state)
            best = max(best, n / (time.perf_counter() - t0))
        return best
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_chunk_epoch(model, variables, duration: int = 60,
                       wire=np.float32):
    """The composed CHUNK-mode training loop (TRAINING.chunkTrain,
    engine/chunk_train.py) over the same on-disk dataset as _bench_epoch:
    per-chunk frame unions ship once (~6x less host memcpy + transfer than
    the classic loader), windows gather + MNet-encode-dedup on device. The
    delta vs epoch_samples_per_sec is the shipped fix for the host-bound
    train loop (BENCH_r02: loader 46 vs device 118 samples/s)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from hupr_tpu.data import get_dataset
    from hupr_tpu.engine.chunk_train import (ChunkTrainLoader,
                                             device_put_chunk,
                                             make_chunk_train_step)
    from hupr_tpu.engine.steps import TrainState, make_optimizer

    root = tempfile.mkdtemp(prefix="hupr_bench_chunk_")
    try:
        cfg = _write_synthetic_dataset(root, duration)
        b = cfg.TRAINING.batchSize  # 20, the flagship recipe
        d = cfg.DATASET
        tx = make_optimizer(cfg)
        t_params = jax.tree.map(jnp.array, variables["params"])
        state = TrainState(
            params=t_params,
            batch_stats=jax.tree.map(jnp.array,
                                     variables.get("batch_stats", {})),
            opt_state=tx.init(t_params),
            step=jnp.zeros((), jnp.int32))
        step = make_chunk_train_step(
            model, tx, (d.numKeypoints, d.heatmapSize, d.imgSize))

        def one_epoch(ds, state):
            loader = ChunkTrainLoader(ds, b, shuffle=True, seed=0,
                                      transfer_dtype=wire)
            n, pending = 0, None
            for batch in loader:
                dev, true_b = device_put_chunk(batch)
                state, metrics = step(state, dev, 1e-4, 0.0)
                if pending is not None:
                    float(pending["loss"])  # deferred: Runner's pattern
                pending = metrics
                n += true_b
            if pending is not None:
                float(pending["loss"])
            return n, state

        _, state = one_epoch(get_dataset("train", cfg, 1), state)  # compile
        best = 0.0
        for _ in range(3):
            ds = get_dataset("train", cfg, 1)  # fresh FrameCache, untimed
            t0 = time.perf_counter()
            n, state = one_epoch(ds, state)
            best = max(best, n / (time.perf_counter() - t0))
        return best
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_adc_epoch(model, variables, duration: int = 60):
    """The composed FUSED-ADC training loop: per-chunk raw int16 stream
    slices memmap'd straight from synthetic capture .bin files
    (data/adc.py), decode + DSP + MNet dedup + window gather + train step
    in one XLA program (engine/chunk_train.make_adc_frame_prep). The delta
    vs chunk_epoch_samples_per_sec is the last .npy hop being deleted:
    fewer wire bytes (int16 sensor format) and zero offline preprocessing."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from hupr_tpu.data import get_dataset
    from hupr_tpu.engine.chunk_train import (ADCChunkLoader,
                                             device_put_chunk,
                                             make_adc_chunk_train_step)
    from hupr_tpu.engine.steps import TrainState, make_optimizer
    from hupr_tpu.ops.dsp import RadarParams

    root = tempfile.mkdtemp(prefix="hupr_bench_adc_")
    try:
        cfg = _write_synthetic_dataset(root, duration, cubes=False)
        rp = RadarParams()
        src = _write_synthetic_captures(cfg, root, duration, rp)

        b = cfg.TRAINING.batchSize  # 20, the flagship recipe
        dd = cfg.DATASET
        tx = make_optimizer(cfg)
        t_params = jax.tree.map(jnp.array, variables["params"])
        state = TrainState(
            params=t_params,
            batch_stats=jax.tree.map(jnp.array,
                                     variables.get("batch_stats", {})),
            opt_state=tx.init(t_params),
            step=jnp.zeros((), jnp.int32))
        step = make_adc_chunk_train_step(
            model, tx, (dd.numKeypoints, dd.heatmapSize, dd.imgSize),
            radar_params=rp, num_frames=dd.numFrames)

        def one_epoch(ds, state):
            loader = ADCChunkLoader(ds, b, src, shuffle=True, seed=0)
            n, pending = 0, None
            for batch in loader:
                dev, true_b = device_put_chunk(batch)
                state, metrics = step(state, dev, 1e-4, 0.0)
                if pending is not None:
                    float(pending["loss"])  # deferred: Runner's pattern
                pending = metrics
                n += true_b
            if pending is not None:
                float(pending["loss"])
            return n, state

        _, state = one_epoch(get_dataset("train", cfg, 1), state)  # compile
        best = 0.0
        for _ in range(3):
            ds = get_dataset("train", cfg, 1)
            t0 = time.perf_counter()
            n, state = one_epoch(ds, state)
            best = max(best, n / (time.perf_counter() - t0))
        return best
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_seq_eval(model, variables, duration: int = 64,
                    wire_name: str = "float32", adc: bool = False):
    """End-to-end eval-path throughput in sequence mode: host .npy reads ->
    per-frame plane transfer -> device windowing + forward + loss + decode ->
    per-batch result consumption, with fetches deferred one batch (the
    Runner.eval pattern: batch i's loss/pred2d convert while batch i+1 runs,
    so the ~25-30 ms tunnel RTT overlaps compute instead of serializing).
    The classic per-window path is bounded by loader_samples_per_sec; this
    is the shipped default (TEST.sequenceEval). Best-of-3 passes.

    adc=True benches the FUSED-ADC eval path (TEST.sequenceSource: adc):
    raw int16 capture slices memmap'd from .bin files, decode + DSP inside
    the encode program — no .npy anywhere, 768 KB/frame on the wire."""
    import shutil
    import tempfile

    from hupr_tpu.data import get_dataset
    from hupr_tpu.engine.seq_eval import SequenceEvaluator

    root = tempfile.mkdtemp(prefix="hupr_bench_seqeval_")
    try:
        cfg = _write_synthetic_dataset(root, duration, cubes=not adc)
        cfg.SETUP.transferDtype = wire_name
        src = None
        if adc:
            from hupr_tpu.ops.dsp import RadarParams
            src = _write_synthetic_captures(cfg, root, duration,
                                            RadarParams())
        ev = SequenceEvaluator(model, cfg, adc_source=src)

        def one_pass(ds):
            n, pending = 0, None
            for out, ids, bbox, true_b in ev.eval_batches(ds, variables):
                if pending is not None:
                    np.asarray(pending["pred2d"])  # consume like Runner.eval
                    float(pending["loss"])
                pending = out
                n += true_b
            if pending is not None:
                np.asarray(pending["pred2d"])
                float(pending["loss"])
            return n

        one_pass(get_dataset("val", cfg, 1))  # compile both programs
        # fresh dataset = cold FrameCache (real per-epoch frame reads stay
        # in the timing); construction/GT-JSON regeneration stays outside
        best = 0.0
        for _ in range(3):
            ds = get_dataset("val", cfg, 1)
            t0 = time.perf_counter()
            n = one_pass(ds)
            best = max(best, n / (time.perf_counter() - t0))
        return best
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
