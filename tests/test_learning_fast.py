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

Scale notes: chunk batches of 12 windows over a 16-frame sequence — the
smallest geometry where chunk mode is non-trivial (two chunks per epoch,
one a padded tail) while the memorization task stays CI-sized; lr 3e-3,
~sqrt-scaled from the classic test's 1e-3 at batch 4. The production
max-throughput operating point (batch 64-128 on TPU) is pinned by
scripts/batch_sweep.py / the README perf table, not here — batch size
does not change the gradient path this test proves. Convergence shape
(observed, seed 0): BCE first matches the background prior (decoded
predictions collapse to a near-constant argmax through ~step 100), then
peaks form quickly once loss reaches ~0.2 and pixel error drops 35 -> ~2
by step 150. MODEL.attention stays 'xla' here: the Pallas kernel does
not lower on the CPU test backend (scripts/live_serve.py applies the
same downgrade); its equivalence to the XLA path is pinned separately by
test_attention.
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
    # Hamming taper across the 8-element virtual aperture: the range and
    # Doppler tones sit on exact integer FFT bins (no leakage), but the
    # azimuth FFT zero-pads 8 antennas to nab bins — untapered, its -13 dB
    # Dirichlet sidelobes 6-10 bins off the target made the decoded argmax
    # (and the model's heatmap mode) hop between lobes. The taper trades a
    # slightly wider main lobe for ~-40 dB sidelobes: a clean unimodal
    # azimuth response, standard radar aperture weighting.
    ant_ph = ant_ph * (0.54 - 0.46 * np.cos(2 * np.pi * n / 7))
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
    never reads preprocessed cubes.

    Mirrors the sensor's two-view geometry: the range FFT is bin-sharp (the
    ADC tone picks one of 256 bins) while the 8-virtual-antenna azimuth FFT
    spreads a ~4-bin Dirichlet lobe, so ONE view localizes only one axis
    precisely. The horizontal view carries y on its (sharp) range axis and
    x on its (broad) azimuth axis; the vertical view carries the transpose
    — exactly how the physical horizontal/vertical arrays complement each
    other, and what makes both coordinates learnable to a bin."""
    rng = np.random.default_rng(seed)
    adc_dir = os.path.join(root, "adc")
    frames_h, frames_v, blocks = [], [], []
    for f in range(duration):
        x = float(rng.uniform(24, img_size - 24))
        y = float(rng.uniform(24, img_size - 24))
        for sig, frames in ((point_target_frame(int(y / 4), int(x / 4), rp),
                             frames_h),
                            (point_target_frame(int(x / 4), int(y / 4), rp),
                             frames_v)):
            noise = (rng.integers(-10, 10, sig.shape)
                     + 1j * rng.integers(-10, 10, sig.shape))
            frames.append(np.round(sig.real) + 1j * np.round(sig.imag)
                          + noise)
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


def fast_cfg(data_dir, adc_dir, duration=16, batch=12):
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
        # lr 3e-3 ~ sqrt(12/4) x the classic test's 1e-3 @ batch 4
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

    duration, batch, steps_max, lr = 16, 12, 160, 3e-3
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

    first_loss, last_loss, i = None, None, 0
    while i < steps_max:
        for batch_host in loader:          # fresh epoch = reshuffled chunks
            dev, _ = device_put_chunk(batch_host)
            state, metrics = step(state, dev, lr, 0.0)
            i += 1
            if first_loss is None:
                first_loss = float(metrics["loss"])
            elif i >= steps_max:
                break
    last_loss = float(metrics["loss"])
    assert np.isfinite(last_loss)
    # well past the ~0.2 peak-formation threshold (module docstring)
    assert last_loss < 0.2 * first_loss, (first_loss, last_loss)

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
