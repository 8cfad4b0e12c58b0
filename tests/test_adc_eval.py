"""Fused raw-ADC sequence eval (TEST.sequenceSource: adc): shipping raw
int16 capture slices and running decode + DSP inside the encode program
must be a pure pipeline optimization — batch-for-batch results equal the
cube-fed sequence evaluator, because the .npy cubes are the offline product
of the same DSP (ops/dsp.py, bit-exact vs the reference per
test_dsp_differential.py)."""

import argparse
import os

import numpy as np
import pytest

from test_adc_train import TINY_RP, make_adc_dataset

from hupr_tpu.data import get_dataset
from hupr_tpu.data.adc import ADCFrameSource
from hupr_tpu.engine.seq_eval import SequenceEvaluator


def _variables(cfg, seed=0):
    import jax

    from hupr_tpu.engine.steps import init_state
    from hupr_tpu.models import build_model

    model = build_model(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(seed))
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def test_adc_eval_matches_cube_eval(tmp_path):
    cfg = make_adc_dataset(tmp_path)
    cfg.TEST.batchSize = 3          # 8 = 3 + 3 + 2: exercises the masked tail
    ds = get_dataset("test", cfg, 1)
    model, variables = _variables(cfg)

    adc = ADCFrameSource(cfg.DATASET.adcDir, TINY_RP)
    assert SequenceEvaluator.adc_applicable(ds, cfg, adc)

    cube_ev = SequenceEvaluator(model, cfg)
    adc_ev = SequenceEvaluator(model, cfg, adc_source=adc)
    got_c = list(cube_ev.eval_batches(ds, variables))
    got_a = list(adc_ev.eval_batches(ds, variables))
    assert len(got_c) == len(got_a) == 3

    for (oc, idc, bbc, tc), (oa, ida, bba, ta) in zip(got_c, got_a):
        assert tc == ta
        np.testing.assert_array_equal(idc, ida)
        np.testing.assert_array_equal(bbc, bba)
        # same math, different program shapes (the DSP runs in f32 on
        # device either way; the cube path round-trips complex64 .npy):
        # losses agree to f32 noise, near-tied argmax bins may flip
        np.testing.assert_allclose(float(oa["loss"]), float(oc["loss"]),
                                   rtol=2e-5)
        same = np.mean(np.asarray(oa["pred2d"]) == np.asarray(oc["pred2d"]))
        assert same >= 0.95, f"only {same:.2%} of coords match"


def test_adc_eval_applicability_gates(tmp_path):
    cfg = make_adc_dataset(tmp_path)
    ds = get_dataset("test", cfg, 1)
    adc = ADCFrameSource(cfg.DATASET.adcDir, TINY_RP)
    assert SequenceEvaluator.adc_applicable(ds, cfg, adc)
    # missing captures
    assert not SequenceEvaluator.adc_applicable(
        ds, cfg, ADCFrameSource(str(tmp_path / "nowhere"), TINY_RP))
    assert not SequenceEvaluator.adc_applicable(ds, cfg, None)
    # the base sequence-eval gates still apply
    cfg.TRAINING.lossDecay = 0.1
    assert not SequenceEvaluator.adc_applicable(ds, cfg, adc)


def test_runner_installs_adc_eval_and_falls_back(tmp_path):
    cfg = make_adc_dataset(tmp_path)
    cfg.TEST.sequenceSource = "adc"
    cfg.TEST.batchSize = 4
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from hupr_tpu.engine import Runner
        args = argparse.Namespace(seed=0, dir="adceval", visDir="none",
                                  eval=True, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        assert runner._adc_eval_source() is not None
        # a full eval runs end-to-end on the ADC path and writes results
        runner.eval(visualization=False)
        assert runner._seq_eval is not None and runner._seq_eval.adc \
            is not None
        assert os.path.exists("logs/adceval/test_results.json")

        # missing captures -> cube planes, not a crash
        cfg2 = make_adc_dataset(tmp_path / "second")
        cfg2.TEST.sequenceSource = "adc"
        cfg2.DATASET.adcDir = str(tmp_path / "nowhere")
        runner2 = Runner(args, cfg2)
        assert runner2._adc_eval_source() is None
    finally:
        os.chdir(cwd)
