"""Golden end-to-end AP: the FULL benchmark-eval pipeline — synthetic
fixed dataset -> reference-format .pth checkpoint -> converter ->
Runner.eval (device forward + argmax decode + keypoint export JSON) ->
KeypointEvaluator — must keep producing this exact 10-stat COCO vector.

Rationale (reference datasets/dataset.py:68-88 is the protocol being
pinned): real-data AP parity is environment-blocked (no HuPR dataset or
released model_best.pth here), so this canary freezes every protocol stage
end-to-end on fixed synthetic inputs. Any drift — keypoint export scaling,
xywh->center/scale, results-JSON schema, OKS matching, the converter's
layout mapping, the eval path's decode — moves at least one stat and fails
the test. The goldens are values of THIS pipeline (computed at authoring
time), not reference-derived; cross-checking the evaluator itself against
the reference's cocoeval.py is test_cocoeval_differential.py's job.

Both eval paths are pinned: sequence mode (the shipped default) and the
classic per-window loader path (the reference's DataLoader shape). Their
stats may legitimately differ from each other (f32 reassociation between
the two program shapes can flip near-tied argmax bins) — each is frozen
independently.
"""

import argparse
import json
import os

import numpy as np
import pytest
import torch

from test_e2e import make_tiny_dataset, tiny_cfg
from test_model import _synthetic_reference_state_dict


def _golden_workspace(tmp_path):
    """Fixed dataset + fixed converted reference checkpoint under tmp_path.

    GT bboxes are inflated to a fixed 1500x1500 extent: OKS divides the
    keypoint error by the gt AREA (eval/cocoeval.py), and a random-init
    model's predictions sit ~150 px from the random GT — with the natural
    ~170x170 boxes every OKS is ~0 and the golden vector degenerates to all
    zeros (useless as a drift canary). The huge area grades per-keypoint OKS
    across (0, 1), so every one of the 10 stats is off the floor/ceiling and
    ANY drift in decode/export/xywh->cs/OKS/matching moves at least one."""
    data_dir = str(tmp_path / "data")
    make_tiny_dataset(data_dir, [1], seed=0)
    for phase in ("train", "val", "test"):
        p = os.path.join(data_dir, f"hrnet_annot_{phase}.json")
        with open(p) as fp:
            annots = json.load(fp)
        for seq in annots:
            for block in seq:
                block["bbox"] = [0.0, 0.0, 1500.0, 1500.0]
        with open(p, "w") as fp:
            json.dump(annots, fp)
    cfg = tiny_cfg(data_dir)
    log_dir = tmp_path / "logs" / "golden"
    log_dir.mkdir(parents=True)
    torch.manual_seed(0)
    sd = _synthetic_reference_state_dict(f=2)
    torch.save({"model_state_dict": sd, "epoch": 3, "accuracy": 0.5},
               str(log_dir / "model_best.pth"))
    return cfg


def _run_eval(tmp_path, cfg):
    from hupr_tpu.engine import Runner
    from hupr_tpu.eval import KeypointEvaluator

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = argparse.Namespace(seed=0, dir="golden", visDir="none",
                                  eval=True, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        runner.load_model_weight("model_best")
        ap = runner.eval(visualization=False)
        with open("logs/golden/test_results.json") as fp:
            dts = json.load(fp)
        stats = KeypointEvaluator(runner.test_set.gt_dataset,
                                  dts).run(verbose=False)
        assert abs(float(stats[0]) - ap) < 1e-12
        return [float(s) for s in stats]
    finally:
        os.chdir(cwd)


GOLDEN_SEQ = [0.20735502121640736, 1.0, 0.0, -1.0, 0.22574257425742575,
              0.225, 1.0, 0.0, -1.0, 0.225]
GOLDEN_CLASSIC = [0.20735502121640736, 1.0, 0.0, -1.0, 0.22574257425742575,
                  0.225, 1.0, 0.0, -1.0, 0.225]

# Two-tier check so a failure is diagnosable: the LOOSE tier failing means
# the protocol itself drifted (decode/export/OKS/matching — a real bug);
# the EXACT tier alone failing means only the float bits moved, which a
# jax/XLA upgrade or different CPU codegen can legitimately do — regenerate
# the pins with `python tests/test_golden_ap.py` after ruling out real
# drift (DEVNOTES.md "golden regeneration").
PROTOCOL_ATOL = 5e-3


def _check_golden(stats, golden):
    np.testing.assert_allclose(
        stats, golden, rtol=0, atol=PROTOCOL_ATOL,
        err_msg="PROTOCOL DRIFT: the eval pipeline's AP stats moved beyond "
                "float-noise — investigate before touching the pins")
    np.testing.assert_allclose(
        stats, golden, rtol=0, atol=1e-12,
        err_msg="bit-level drift only (protocol tier passed): likely a "
                "toolchain change — regenerate pins via "
                "`python tests/test_golden_ap.py` after review")


@pytest.mark.slow
def test_golden_ap_sequence_eval(tmp_path):
    cfg = _golden_workspace(tmp_path)
    assert cfg.TEST.sequenceEval          # the shipped default path
    stats = _run_eval(tmp_path, cfg)
    assert 0.0 < stats[0] < 1.0           # discriminating, not degenerate
    _check_golden(stats, GOLDEN_SEQ)


@pytest.mark.slow
def test_golden_ap_classic_eval(tmp_path):
    cfg = _golden_workspace(tmp_path)
    cfg.TEST.sequenceEval = False         # the reference's DataLoader shape
    stats = _run_eval(tmp_path, cfg)
    _check_golden(stats, GOLDEN_CLASSIC)


if __name__ == "__main__":
    # regenerate the goldens (prints both vectors; paste above)
    import sys
    import tempfile
    from pathlib import Path

    for seq in (True, False):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = _golden_workspace(Path(tmp))
            cfg.TEST.sequenceEval = seq
            print(("GOLDEN_SEQ" if seq else "GOLDEN_CLASSIC"), "=",
                  _run_eval(Path(tmp), cfg), file=sys.stderr)
