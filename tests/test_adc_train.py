"""Fused raw-ADC chunk training (TRAINING.chunkSource: adc): shipping raw
int16 DCA1000 stream slices and running decode + DSP inside the train step
must be a pure pipeline optimization — the per-step loss, parameter update,
and BN statistics EQUAL the cube-fed chunk step on the same windows, because
the stored .npy cubes are themselves just the offline product of the same
DSP (preprocessing/process_iwr1843.py; ops/dsp.py is pinned bit-exact vs
the reference's generateHeatmap in test_dsp_differential.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_chunk_train import _assert_equal_steps, _copy_state
from test_e2e import tiny_cfg

from hupr_tpu.data import get_dataset
from hupr_tpu.data.adc import ADCFrameSource
from hupr_tpu.engine.chunk_train import (ADCChunkLoader, ChunkTrainLoader,
                                         chunk_table, device_put_chunk,
                                         make_adc_chunk_train_step,
                                         make_chunk_train_step)
from hupr_tpu.engine.steps import init_state, make_optimizer
from hupr_tpu.models import build_model
from hupr_tpu.ops.dsp import RadarParams, decode_dca1000, \
    radar_cube_single_frame

# reduced capture geometry (the dryrun's): cube (8 chirps, 32, 32, 8)
TINY_ADC = dict(num_adc_samples=128, num_chirp=48, idx_proc_chirp=16,
                num_group_chirp=2, range_gate_start=94)
TINY_RP = RadarParams(**TINY_ADC)


def make_adc_dataset(tmp_path, duration=8, seed=0):
    """Synthetic captures + the cubes the preprocessing CLI would write from
    them + annotations. Returns a config with adcDir/adcParams set."""
    data_dir = str(tmp_path / "data")
    adc_dir = str(tmp_path / "raw")
    rng = np.random.default_rng(seed)
    s = 2 * TINY_RP.num_rx * TINY_RP.num_chirp * TINY_RP.num_adc_samples

    cube = jax.jit(lambda r: radar_cube_single_frame(
        decode_dca1000(r, TINY_RP), TINY_RP))
    import json
    blocks = []
    for view in ("hori", "vert"):
        os.makedirs(os.path.join(adc_dir, "single_1", view), exist_ok=True)
        os.makedirs(os.path.join(data_dir, "single_1", view), exist_ok=True)
        stream = rng.integers(-300, 300, (duration, s)).astype(np.int16)
        stream.tofile(os.path.join(adc_dir, "single_1", view,
                                   "adc_data.bin"))
        for f in range(duration):
            c = np.asarray(cube(stream[f])).astype(np.complex64)
            np.save(os.path.join(data_dir, f"single_1/{view}/{f:09d}.npy"),
                    c)
    for f in range(duration):
        joints = rng.uniform(20, 105, (14, 2)).tolist()
        xs = [j[0] for j in joints]
        ys = [j[1] for j in joints]
        blocks.append({"image": "%09d.jpg" % f, "joints": joints,
                       "bbox": [min(xs) - 5, min(ys) - 5,
                                max(xs) + 5, max(ys) + 5]})
    for phase in ("train", "val", "test"):
        with open(os.path.join(data_dir, f"hrnet_annot_{phase}.json"),
                  "w") as fp:
            json.dump([blocks], fp)

    cfg = tiny_cfg(data_dir, duration=duration)
    d = cfg.DATASET
    d.rangeSize = d.azimuthSize = 32
    d.heatmapSize = 32
    d.imgSize = 128
    d.numChirps = TINY_RP.num_kept_chirps        # 8: cubes store all kept
    d.adcDir = adc_dir
    d.adcParams = dict(TINY_ADC)
    return cfg


def test_radar_params_validation():
    cfg = tiny_cfg("unused")
    cfg.DATASET.adcParams = dict(TINY_ADC)      # 32-bin capture geometry...
    with pytest.raises(ValueError):              # ...vs 64-bin cube config
        cfg.DATASET.radar_params()
    cfg.DATASET.adcParams = {}
    assert cfg.DATASET.radar_params() == RadarParams()


def test_adc_source_reads_bin_slices(tmp_path):
    cfg = make_adc_dataset(tmp_path)
    src = ADCFrameSource(cfg.DATASET.adcDir, TINY_RP)
    ds = get_dataset("train", cfg, 1)
    assert src.available(ds.image_ids)
    out = np.empty((3, src.frame_samples), np.int16)
    src.read_frames(ds.image_ids, 2, 3, "hori", out)
    raw = np.fromfile(src.bin_path(1, "hori"), np.int16)
    np.testing.assert_array_equal(
        out, raw[2 * src.frame_samples:5 * src.frame_samples].reshape(3, -1))
    # a truncated capture is not available
    assert not ADCFrameSource("", TINY_RP).available(ds.image_ids)
    short = ADCFrameSource(cfg.DATASET.adcDir, TINY_RP)
    assert not short.available(ds.image_ids + [100000 + 999])


def test_adc_chunk_step_equals_cube_chunk_step(tmp_path):
    """Same windows, same init: raw-ADC step == cube step (the DSP consumes
    data, not params, so gradients match up to f32 program-shape noise)."""
    cfg = make_adc_dataset(tmp_path)
    ds = get_dataset("train", cfg, 1)
    b = 4
    cfg.TRAINING.batchSize = b
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx=tx)
    d = cfg.DATASET
    geometry = (d.numKeypoints, d.heatmapSize, d.imgSize)

    cube_loader = ChunkTrainLoader(ds, b, shuffle=False)
    adc_loader = ADCChunkLoader(ds, b, ADCFrameSource(d.adcDir, TINY_RP),
                                shuffle=False)
    chunk_c = cube_loader.chunks[0]
    chunk_a = adc_loader.chunks[0]
    np.testing.assert_array_equal(chunk_c["rel"], chunk_a["rel"])

    cube_step = make_chunk_train_step(model, tx, geometry)
    dev_c, tb_c = device_put_chunk(cube_loader._assemble(chunk_c))
    s1, m1 = cube_step(_copy_state(state), dev_c, 1e-4, 0.0)

    adc_step = make_adc_chunk_train_step(model, tx, geometry,
                                         radar_params=TINY_RP,
                                         num_frames=d.numFrames)
    assembled = adc_loader._assemble(chunk_a)
    assert assembled["hori"].dtype == np.int16
    dev_a, tb_a = device_put_chunk(assembled)
    s2, m2 = adc_step(_copy_state(state), dev_a, 1e-4, 0.0)
    assert tb_c == tb_a
    _assert_equal_steps((s1, m1), (s2, m2))


def test_adc_loader_epoch_coverage(tmp_path):
    cfg = make_adc_dataset(tmp_path)
    ds = get_dataset("train", cfg, 1)
    loader = ADCChunkLoader(ds, 3, ADCFrameSource(cfg.DATASET.adcDir,
                                                  TINY_RP), seed=5)
    ids = []
    for batch in loader:
        assert batch["hori"].dtype == np.int16
        assert batch["hori"].shape[0] == loader.f_pad
        ids.extend(int(i) for i in batch["imageId"])
    assert sorted(ids) == sorted(ds.image_ids)


def test_adc_process_blocks_cover_full_assembly(tmp_path):
    """Multi-host ADC mode: per-process blocks concatenate to the
    single-process assembly (incl. the all-clamp tail block case)."""
    cfg = make_adc_dataset(tmp_path)
    ds = get_dataset("train", cfg, 1)
    src = ADCFrameSource(cfg.DATASET.adcDir, TINY_RP)
    full = ADCChunkLoader(ds, 4, src, shuffle=False, pad_multiple=8)
    parts = [ADCChunkLoader(ds, 4, src, shuffle=False, pad_multiple=8,
                            process=(p, 4)) for p in range(4)]
    for ci in range(len(full.chunks)):
        whole = full._assemble(full.chunks[ci])
        slices = [p._assemble(p.chunks[ci]) for p in parts]
        for k in ("hori", "vert", "rel", "jointsGroup", "mask"):
            np.testing.assert_array_equal(
                np.concatenate([s[k] for s in slices]), whole[k],
                err_msg=f"chunk {ci} leaf {k}")


def test_runner_installs_adc_loader_and_falls_back(tmp_path):
    import argparse

    cfg = make_adc_dataset(tmp_path)
    cfg.TRAINING.batchSize = 3
    cfg.TRAINING.chunkTrain = True
    cfg.TRAINING.chunkSource = "adc"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from hupr_tpu.engine import Runner
        args = argparse.Namespace(seed=0, dir="adc", visDir="none",
                                  eval=False, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        assert isinstance(runner._chunk_loader, ADCChunkLoader)
        # missing captures -> cube chunks, not a crash
        cfg2 = make_adc_dataset(tmp_path / "second")
        cfg2.TRAINING.batchSize = 3
        cfg2.TRAINING.chunkTrain = True
        cfg2.TRAINING.chunkSource = "adc"
        cfg2.DATASET.adcDir = str(tmp_path / "nowhere")
        runner2 = Runner(args, cfg2)
        assert runner2._chunk_loader is not None
        assert not isinstance(runner2._chunk_loader, ADCChunkLoader)
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_runner_adc_train_end_to_end(tmp_path):
    """A full fused-ADC epoch trains, checkpoints, and evals through the
    standard pipeline (eval still reads the cube dataset)."""
    import argparse

    cfg = make_adc_dataset(tmp_path)
    cfg.TRAINING.batchSize = 3
    cfg.TRAINING.chunkTrain = True
    cfg.TRAINING.chunkSource = "adc"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from hupr_tpu.engine import Runner
        args = argparse.Namespace(seed=0, dir="adc_e2e", visDir="none",
                                  eval=False, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        assert isinstance(runner._chunk_loader, ADCChunkLoader)
        runner.train()
        assert os.path.exists("logs/adc_e2e/checkpoint.ckpt")
        assert os.path.exists("logs/adc_e2e/val_results.json")
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_runner_fast_composition_end_to_end(tmp_path):
    """The shipped max-throughput composition (config/mscsa_prgcn_tpu_fast
    .yaml: bf16 compute + bf16 wire + fused-ADC chunk train + fused-ADC
    sequence eval) trains, checkpoints, and evals through the standard
    Runner — the levers are individually tested; this pins that they
    COMPOSE (e.g. the ADC step must honor computeDtype, and the bf16 wire
    knob must not break the int16 capture path, which ignores it)."""
    import argparse

    cfg = make_adc_dataset(tmp_path)
    cfg.TRAINING.batchSize = 3
    cfg.TRAINING.chunkTrain = True
    cfg.TRAINING.chunkSource = "adc"
    cfg.TEST.sequenceSource = "adc"
    cfg.MODEL.computeDtype = "bfloat16"
    cfg.SETUP.transferDtype = "bfloat16"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from hupr_tpu.engine import Runner
        args = argparse.Namespace(seed=0, dir="fastcomp", visDir="none",
                                  eval=False, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        assert isinstance(runner._chunk_loader, ADCChunkLoader)
        runner.train()
        assert os.path.exists("logs/fastcomp/checkpoint.ckpt")
        assert os.path.exists("logs/fastcomp/val_results.json")
        import json
        with open("logs/fastcomp/train_loss_list_0.json") as fp:
            losses = json.load(fp)
        assert losses and all(np.isfinite(v) for v in losses)
    finally:
        os.chdir(cwd)
