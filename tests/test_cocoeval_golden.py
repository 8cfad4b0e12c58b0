"""Golden regression for the OKS evaluator: a fixed multi-image scenario with
mixed hit/miss/partial detections must keep producing these exact stats.
Guards future refactors of matching/accumulation against silent drift.

These values are REFERENCE-TRUE, not self-referential:
test_cocoeval_differential.py::test_golden_scenario_values_are_reference_true
asserts the reference's own misc/cocoeval.py yields the same numbers on this
scenario (including the pycocotools gt-id-0-means-unmatched quirk that image
0 deliberately triggers)."""

import numpy as np

from hupr_tpu.eval import KeypointEvaluator
from test_cocoeval import _gt_dataset, _det, _rand_joints


def _scenario():
    rng = np.random.default_rng(42)
    images, dets = [], []
    for i in range(6):
        joints = _rand_joints(rng)
        bbox = (30 + i, 30, 100 + 10 * i, 150)
        images.append((i, joints, bbox))
        if i == 0:
            dets.append(_det(i, joints, score=0.9))          # perfect
        elif i == 1:
            dets.append(_det(i, joints + rng.normal(0, 8, joints.shape),
                             score=0.8))                      # partial
        elif i == 2:
            pass                                              # miss
        elif i == 3:
            dets.append(_det(i, joints + 120.0, score=0.7))   # far off
        else:
            dets.append(_det(i, joints + rng.normal(0, 2, joints.shape),
                             score=0.95))                     # near-perfect
    return _gt_dataset(images), dets


GOLDEN_STATS = [0.4376237623762376, 0.4628712871287129, 0.4628712871287129,
                0.26930693069306927, 0.6633663366336634, 0.4666666666666666,
                0.5, 0.5, 0.26666666666666666, 0.6666666666666667]


def test_golden_stats_exact():
    gt, dets = _scenario()
    stats = KeypointEvaluator(gt, dets).run(verbose=False)
    np.testing.assert_allclose(stats, GOLDEN_STATS, rtol=0, atol=1e-12)
