"""Attribute the fused-ADC composed-epoch gap (VERDICT r4 weak #5).

BENCH_r04: adc_epoch_samples_per_sec ~23-25 vs train_samples_per_sec ~118 —
the composed fused-ADC loop reaches only ~21% of step capacity on this dev
host. The candidates: (a) host assembly (memmap .bin reads + slicing into
the padded frame block), (b) host->device transfer over the ~30-100 MB/s
tunnel, (c) the device step itself. This probe times each in isolation:

  1. loader-only rate, memmap-backed captures  (disk + slicing, no device)
  2. loader-only rate, RAM-backed captures     (slicing only — A/B vs 1
     isolates the memmap read cost)
  3. device_put-only rate of pre-assembled chunks (tunnel bytes only)
  4. composed loop (loader + device_put + step)
  5. step-only rate on a resident chunk (device capacity)

One JSON line per measurement. Findings go to DEVNOTES with date + tunnel
context (the tunnel-bound rows swing 2-3x intraday — compare WITHIN a run).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class _RamADCSource:
    """ADCFrameSource twin serving from one preloaded array: same
    read_frames contract, zero disk involvement."""

    def __init__(self, streams, frame_samples):
        self.streams = streams            # {view: (F, S) int16}
        self.frame_samples = frame_samples

    def read_frames(self, image_ids, lo, n, view, out):
        f0 = image_ids[lo] % 100000
        out[:n] = self.streams[view][f0:f0 + n]

    def available(self, image_ids):
        return True


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import tempfile

    from hupr_tpu.config import Config
    from hupr_tpu.data.adc import ADCFrameSource
    from hupr_tpu.engine.chunk_train import (ADCChunkLoader,
                                             device_put_chunk,
                                             make_adc_chunk_train_step)
    from hupr_tpu.engine.steps import TrainState, make_optimizer
    from hupr_tpu.models import build_model
    from hupr_tpu.ops.dsp import RadarParams
    from hupr_tpu.utils.synthetic import synthetic_variables

    duration = int(os.environ.get("GAP_FRAMES", "120"))
    batch = int(os.environ.get("GAP_BATCH", "20"))
    cfg = Config()
    cfg.MODEL.attention = os.environ.get("GAP_ATTN", "pallas")
    rp = RadarParams()
    samples = 2 * rp.num_rx * rp.num_chirp * rp.num_adc_samples

    # one synthetic flagship-size sequence on disk (768 KB/frame/view)
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="adc_gap_")
    streams = {}
    for view in ("hori", "vert"):
        d = os.path.join(tmp, "single_1", view)
        os.makedirs(d)
        arr = rng.integers(-300, 300, (duration, samples)).astype(np.int16)
        arr.tofile(os.path.join(d, "adc_data.bin"))
        streams[view] = arr
    _emit(probe="setup", frames=duration, batch=batch,
          frame_mb=round(samples * 2 / 2**20, 2))

    # a minimal dataset surface (the fields ADCChunkLoader touches), with
    # a REAL windows table built the way data/dataset.py builds it
    from hupr_tpu.data.dataset import window_indices
    ds = type("DS", (), {})()
    ds.num_group_frames = 8
    ds.duration = duration
    ds.sampling_ratio = 1
    ds.windows = window_indices(duration, duration, 8)
    ds.joints = rng.uniform(20, 230, (duration, 14, 2)).astype(np.float32)
    ds.image_ids = [100000 + f for f in range(duration)]

    disk_src = ADCFrameSource(tmp, rp)
    ram_src = _RamADCSource(streams, samples)

    def loader_rate(src, label):
        loader = ADCChunkLoader(ds, batch, src, seed=0, shuffle=False)
        # warm epoch (page cache, thread spin-up), then timed epoch
        for _ in loader:
            pass
        n = 0
        t0 = time.perf_counter()
        for chunk in loader:
            n += int(chunk["trueB"])
        dt = time.perf_counter() - t0
        _emit(probe=label, samples_per_sec=round(n / dt, 2),
              chunks=len(loader))
        return loader

    loader_rate(disk_src, "loader_only_memmap")
    loader_rate(ram_src, "loader_only_ram")

    # pre-assemble every chunk once; then time transfer and step separately
    loader = ADCChunkLoader(ds, batch, disk_src, seed=0, shuffle=False)
    chunks = list(loader)

    n = sum(int(c["trueB"]) for c in chunks)
    t0 = time.perf_counter()
    for c in chunks:
        dev, _ = device_put_chunk(c)
        jax.block_until_ready(dev["hori"])
    dt = time.perf_counter() - t0
    wire_mb = sum(c["hori"].nbytes + c["vert"].nbytes
                  for c in chunks) / 2**20
    _emit(probe="device_put_only", samples_per_sec=round(n / dt, 2),
          mb_per_sec=round(wire_mb / dt, 1))

    model = build_model(cfg)
    tx = make_optimizer(cfg)
    variables = synthetic_variables(model, (1, 8, 8, 2, 64, 64, 8))
    import jax.numpy as jnp
    params = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(params=params,
                       batch_stats=jax.tree.map(
                           jnp.array, variables.get("batch_stats", {})),
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_adc_chunk_train_step(model, tx, radar_params=rp,
                                     num_frames=8)

    dev0, _ = device_put_chunk(chunks[0])
    state, m = step(state, dev0, 1e-4, 0.0)   # compile
    loss0 = float(m["loss"])
    if not np.isfinite(loss0):
        # timings below stay valid (NaN propagates at full speed); surface
        # it loudly for numerics follow-up rather than aborting the probe
        _emit(probe="warning", nonfinite_first_loss=loss0)

    # step-only: resident chunk, chained steps
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, dev0, 1e-4, 0.0)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    _emit(probe="step_only", samples_per_sec=round(batch / dt, 2),
          ms_per_step=round(dt * 1e3, 1))

    # composed loop: loader -> device_put -> step (one-deep overlap via the
    # loader's internal prefetch thread, same as Runner._train_chunks)
    loader = ADCChunkLoader(ds, batch, disk_src, seed=0, shuffle=True)
    n = 0
    t0 = time.perf_counter()
    for c in loader:
        dev, true_b = device_put_chunk(c)
        state, m = step(state, dev, 1e-4, 0.0)
        n += true_b
    float(m["loss"])
    dt = time.perf_counter() - t0
    _emit(probe="composed_epoch", samples_per_sec=round(n / dt, 2))


if __name__ == "__main__":
    main()
