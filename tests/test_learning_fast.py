"""LEARNING proof for the composed max-throughput recipe
(config/mscsa_prgcn_tpu_fast.yaml): chunk-mode training over RAW int16
DCA1000 captures with bf16 compute — the fast path's SGD dynamics, not just
its per-step numerics (those are pinned by test_chunk_train /
test_adc_train / test_bf16_compute).

Chunk mode changes epoch semantics (chunks shuffle, windows inside a chunk
stay consecutive) and the ADC source adds int16 quantization + the device
DSP in the gradient path; this test pins that the composition still drives
AP from 0.0 past 0.1 on a localization task, mirroring what
test_learning.py proves for the classic recipe (reference training loop,
tools/run.py:65-86).

Synthetic data is generated in the SENSOR's format: point-target ADC
streams (complex exponentials matching the range/Doppler/angle FFT bins of
ops/dsp.radar_cube_single_frame) whose radar cube carries a ~300x-contrast
spike at (range=y/4, azimuth=x/4) of the (colocated) joints. Doppler bin 1
keeps the target out of the static-clutter notch (DSP subtracts the
per-chirp mean). The whole train path runs capture-native: no .npy cube is
ever written.

Run at batch 40 — the measured max-throughput operating point
(scripts/batch_sweep.py, DEVNOTES) — with lr 3e-3, ~sqrt-scaled from the
classic test's 1e-3 at batch 4 (Adam scales closer to sqrt than linear).
MODEL.attention stays 'xla' here: the Pallas kernel does not lower on the
CPU test backend (scripts/live_serve.py applies the same downgrade); its
equivalence to the XLA path is pinned separately by test_attention.
"""

import argparse
import json
import os

import numpy as np
import pytest

from hupr_tpu.config import config_from_dict
from hupr_tpu.ops.dsp import RadarParams

# reduced 32x32 geometry (the dryrun's layout): full DSP/graph structure,
# 16x less attention work — the learning dynamics under test (chunk
# shuffling, int16 quantization, bf16 compute) are size-independent
ADC_PARAMS = dict(num_adc_samples=128, num_chirp=96, idx_proc_chirp=32,
                  num_group_chirp=2, range_gate_start=94)


def point_target_frame(r_out: int, a_out: int, rp: RadarParams,
                       amp: float = 300.0, doppler: int = 1) -> np.ndarray:
    """One frame of complex ADC (RX, num_chirp, num_adc) whose radar cube
    peaks exactly at (range_bin=r_out, azimuth_bin=a_out).

    Inverts radar_cube_single_frame's selections: range FFT bin
    range_gate_start - r_out (the descending range gate), Doppler bin
    `doppler` over the TDM-demuxed chirp index (bin 0 would be removed as
    static clutter), azimuth FFT bin (nab/2 - 1 - a_out) mod nab (the
    fftshift + flip at the end of the cube chain), phased across the
    virtual array (tx0 -> rows 0-3, tx1/elev -> rows 2-5, tx2 -> rows
    4-7)."""
    nab = rp.num_angle_bins
    kr = rp.range_gate_start - r_out
    ka = (nab // 2 - 1 - a_out) % nab
    t = np.arange(rp.num_adc_samples)
    j = np.arange(rp.num_chirp)
    rx = np.arange(rp.num_rx)
    rng_ph = np.exp(2j * np.pi * kr * t / rp.num_adc_samples)
    dop_ph = np.exp(2j * np.pi * doppler * (j // 3) / rp.idx_proc_chirp)
    n = rx[:, None] + np.where(j % 3 == 0, 0,
                               np.where(j % 3 == 1, 2, 4))[None, :]
    ant_ph = np.exp(2j * np.pi * ka * n / nab)
    return (amp * ant_ph[:, :, None] * dop_ph[None, :, None]
            * rng_ph[None, None, :])


def serialize_dca1000(complex_data: np.ndarray) -> np.ndarray:
    """(RX, chirps, ADC) complex -> DCA1000 int16 stream (the inverse of
    ops/dsp.decode_dca1000; same layout as tests/test_preprocess.py)."""
    i_flat = np.real(complex_data).transpose(1, 0, 2).reshape(-1)
    q_flat = np.imag(complex_data).transpose(1, 0, 2).reshape(-1)
    raw = np.zeros((i_flat.size // 2, 4), dtype=np.int16)
    raw[:, 0] = i_flat[0::2]
    raw[:, 1] = i_flat[1::2]
    raw[:, 2] = q_flat[0::2]
    raw[:, 3] = q_flat[1::2]
    return raw.reshape(-1)


def make_learnable_adc_dataset(root, rp: RadarParams, duration=80, seed=0,
                               img_size=128):
    """Point-target captures + annotations; joints colocated at the target.
    Writes ONLY annotation JSONs and raw adc_data.bin files — the fast path
    never reads preprocessed cubes."""
    rng = np.random.default_rng(seed)
    adc_dir = os.path.join(root, "adc")
    frames_h, frames_v, blocks = [], [], []
    for f in range(duration):
        x = float(rng.uniform(24, img_size - 24))
        y = float(rng.uniform(24, img_size - 24))
        sig = point_target_frame(int(y / 4), int(x / 4), rp)
        noisy = []
        for _ in range(2):  # independent receiver noise per view
            noise = (rng.integers(-10, 10, sig.shape)
                     + 1j * rng.integers(-10, 10, sig.shape))
            noisy.append(np.round(sig.real) + 1j * np.round(sig.imag)
                         + noise)
        frames_h.append(noisy[0])
        frames_v.append(noisy[1])
        blocks.append({"image": "%09d.jpg" % f, "joints": [[x, y]] * 14,
                       "bbox": [x - 25, y - 25, x + 25, y + 25]})
    for view, frames in (("hori", frames_h), ("vert", frames_v)):
        d = os.path.join(adc_dir, "single_1", view)
        os.makedirs(d, exist_ok=True)
        stream = np.concatenate(
            [serialize_dca1000(fr) for fr in frames])
        stream.tofile(os.path.join(d, "adc_data.bin"))
    for phase in ("train", "val", "test"):
        with open(os.path.join(root, f"hrnet_annot_{phase}.json"),
                  "w") as fp:
            json.dump([blocks], fp)
    return adc_dir


def fast_cfg(data_dir, adc_dir, duration=80, batch=40):
    """The mscsa_prgcn_tpu_fast.yaml composition at the reduced geometry:
    chunkTrain + chunkSource adc + sequenceSource adc + bf16 compute/wire.
    attention stays xla on the CPU backend (see module docstring)."""
    return config_from_dict({
        "DATASET": {"duration": duration, "dataDir": data_dir,
                    "adcDir": adc_dir, "adcParams": ADC_PARAMS,
                    "trainName": [1], "valName": [1], "testName": [1],
                    "rangeSize": 32, "azimuthSize": 32, "heatmapSize": 32,
                    "imgSize": 128},
        "MODEL": {"numFilters": 2, "computeDtype": "bfloat16"},
        "TRAINING": {"batchSize": batch, "epochs": 1, "lr": 3e-3,
                     "chunkTrain": True, "chunkSource": "adc"},
        "TEST": {"batchSize": 8, "sequenceEval": True,
                 "sequenceSource": "adc"},
        "SETUP": {"transferDtype": "bfloat16"},
    })


@pytest.mark.slow
def test_fast_recipe_learns_localization_to_nonzero_ap(tmp_path):
    import jax

    from hupr_tpu.data import get_dataset
    from hupr_tpu.data.adc import ADCFrameSource
    from hupr_tpu.engine.chunk_train import (ADCChunkLoader,
                                             device_put_chunk,
                                             make_adc_chunk_train_step)
    from hupr_tpu.engine.steps import init_state, make_optimizer
    from hupr_tpu.models import build_model

    duration, batch, epochs, lr = 80, 40, 50, 3e-3
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    rp = RadarParams(**ADC_PARAMS)
    adc_dir = make_learnable_adc_dataset(data_dir, rp, duration)
    cfg = fast_cfg(data_dir, adc_dir, duration, batch)
    assert cfg.DATASET.radar_params() == rp

    ds = get_dataset("train", cfg)
    adc_source = ADCFrameSource(adc_dir, rp)
    assert ADCChunkLoader.applicable(ds, cfg, adc_source)
    loader = ADCChunkLoader(ds, batch, adc_source, seed=0, shuffle=True)

    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    d = cfg.DATASET
    step = make_adc_chunk_train_step(
        model, tx, geometry=(d.numKeypoints, d.heatmapSize, d.imgSize),
        radar_params=rp, num_frames=d.numFrames)

    first_loss, last_loss = None, None
    for _ in range(epochs):
        for batch_host in loader:          # fresh epoch = reshuffled chunks
            dev, _ = device_put_chunk(batch_host)
            state, metrics = step(state, dev, lr, 0.0)
            if first_loss is None:
                first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert np.isfinite(last_loss)
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    # score through the fast EVAL path too: Runner -> sequence-mode eval
    # over the same raw captures (TEST.sequenceSource: adc) -> OKS AP
    from hupr_tpu.engine.runner import Runner
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = argparse.Namespace(seed=0, dir="learn_fast", visDir="none",
                                  eval=True, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        runner.state = state
        ap = runner.eval(visualization=False)
    finally:
        os.chdir(cwd)
    assert ap > 0.1, ap
