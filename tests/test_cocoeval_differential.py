"""Differential validation of the OKS evaluator against the REFERENCE's own
patched pycocotools (misc/cocoeval.py + misc/coco.py).

The keypoint path of the reference evaluator is pure NumPy; its only native
dependency (`from . import mask`) is used for bbox/segm IoU exclusively, so a
stub in sys.modules suffices — pycocotools is NOT needed. Randomized
scenarios (multi-detection images, score ties, misses, empty images,
area-range mixes, maxDets overflow, invisible keypoints, per-keypoint
idx_keypoint) must produce all 10 summary stats equal to 1e-10. This proves
the repo's metric equals the reference's benchmark metric, rather than
pinning the repo's own output.

Reference protocol mirrored: datasets/dataset.py:48-88 (COCO gt -> loadRes
-> COCOeval(..., 'keypoints') -> evaluate[ (idx)] -> accumulate ->
summarize -> stats).
"""

import importlib.util
import io
import os
import sys
import types
from contextlib import redirect_stdout

import numpy as np
import pytest

from hupr_tpu.eval import KeypointEvaluator

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE, "misc", "cocoeval.py")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference's misc.coco / misc.cocoeval under an isolated
    package name with the pycocotools mask C extension stubbed out."""
    # the reference targets numpy 1.20 (environment.yml): restore the
    # removed np.float alias for the duration of these tests
    np.float = float
    pkg = types.ModuleType("refmisc")
    pkg.__path__ = [os.path.join(REFERENCE, "misc")]
    sys.modules["refmisc"] = pkg
    mask_stub = types.ModuleType("refmisc.mask")
    mask_stub.iou = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("mask.iou must not be called on the keypoint path"))
    sys.modules["refmisc.mask"] = mask_stub
    mods = {}
    for name in ("coco", "cocoeval"):
        spec = importlib.util.spec_from_file_location(
            f"refmisc.{name}", os.path.join(REFERENCE, "misc", f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmisc.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _run_reference(ref_modules, gt_dataset, detections, idx_keypoint=-1):
    with redirect_stdout(io.StringIO()):
        coco = ref_modules["coco"].COCO()
        coco.dataset = gt_dataset
        coco.createIndex()
        coco_dt = coco.loadRes([dict(d) for d in detections])
        ev = ref_modules["cocoeval"].COCOeval(coco, coco_dt, "keypoints")
        ev.params.useSegm = None
        if idx_keypoint != -1:
            ev.evaluate(idx_keypoint)
        else:
            ev.evaluate()
        ev.accumulate()
        ev.summarize()
    return np.asarray(ev.stats, dtype=np.float64)


def _run_ours(gt_dataset, detections, idx_keypoint=-1):
    ev = KeypointEvaluator(gt_dataset, [dict(d) for d in detections])
    return np.asarray(ev.run(idx_keypoint=idx_keypoint, verbose=False),
                      dtype=np.float64)


def _random_scenario(rng):
    """One randomized gt dataset + detection list covering the protocol's
    edge cases (single-person HuPR images but the evaluator is multi-object:
    exercise multi-gt/multi-dt too)."""
    n_imgs = int(rng.integers(2, 7))
    images, anns, dets = [], [], []
    ann_id = 0
    for img_id in range(1, n_imgs + 1):
        images.append({"id": img_id, "height": 256, "width": 256})
        n_gt = int(rng.choice([0, 1, 1, 1, 2]))
        for _ in range(n_gt):
            joints = rng.uniform(10, 246, (14, 2))
            vis = rng.choice([0, 2], size=14,
                             p=[0.15, 0.85]).astype(np.float64)
            if rng.random() < 0.1:
                vis[:] = 0.0  # no visible keypoints: gaussian bbox fallback
            kpts = []
            for (x, y), v in zip(joints, vis):
                kpts += [float(x), float(y), float(v)]
            # area mix across the medium/large OKS ranges
            w = float(rng.uniform(40, 220))
            h = float(rng.uniform(40, 220))
            ann_id += 1
            # occasional crowd gt: ignored, but matchable repeatedly
            # (cocoeval.py:283 `gtm>0 and not iscrowd -> continue`)
            iscrowd = int(rng.random() < 0.15)
            anns.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "iscrowd": iscrowd, "num_keypoints": int((vis > 0).sum()),
                "keypoints": kpts,
                "bbox": [float(rng.uniform(0, 30)),
                         float(rng.uniform(0, 30)), w, h],
                "area": w * h / 2.0,
            })
            # detections per gt: 0 (miss) to 3 (duplicates w/ score ties)
            n_dt = int(rng.choice([0, 1, 1, 2, 3]))
            for d in range(n_dt):
                noise = rng.normal(0, rng.choice([0.5, 4.0, 25.0]),
                                   joints.shape)
                dkpts = []
                for x, y in joints + noise:
                    dkpts += [float(x), float(y), 1.0]
                score = float(rng.choice([0.5, 0.8, 0.8, 0.9,
                                          rng.uniform(0, 1)]))
                dets.append({"image_id": img_id, "category_id": 1,
                             "keypoints": dkpts, "score": score})
        if n_gt == 0 and rng.random() < 0.5:
            # false positive on an empty image
            joints = rng.uniform(10, 246, (14, 2))
            dkpts = []
            for x, y in joints:
                dkpts += [float(x), float(y), 1.0]
            dets.append({"image_id": img_id, "category_id": 1,
                         "keypoints": dkpts, "score": 0.7})
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "person"}]}
    return gt, dets


def test_randomized_scenarios_match_reference(ref_modules):
    rng = np.random.default_rng(0)
    n_compared = 0
    for trial in range(100):
        gt, dets = _random_scenario(rng)
        if not dets:
            continue  # reference loadRes asserts a non-empty result list
        want = _run_reference(ref_modules, gt, dets)
        got = _run_ours(gt, dets)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10,
                                   err_msg=f"trial {trial}")
        n_compared += 1
    assert n_compared >= 90


def test_maxdets_overflow_matches_reference(ref_modules):
    """More than maxDets=20 detections in one image: truncation after the
    stable score sort must match (cocoeval.py evaluateImg dt[0:maxDet])."""
    rng = np.random.default_rng(7)
    joints = rng.uniform(40, 210, (14, 2))
    kpts = []
    for x, y in joints:
        kpts += [float(x), float(y), 2.0]
    gt = {"images": [{"id": 1, "height": 256, "width": 256}],
          "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                           "iscrowd": 0, "num_keypoints": 14,
                           "keypoints": kpts, "bbox": [30, 30, 120, 160],
                           "area": 120 * 160 / 2.0}],
          "categories": [{"id": 1, "name": "person"}]}
    dets = []
    for i in range(25):
        noise = rng.normal(0, 3.0, joints.shape)
        dkpts = []
        for x, y in joints + noise:
            dkpts += [float(x), float(y), 1.0]
        dets.append({"image_id": 1, "category_id": 1, "keypoints": dkpts,
                     "score": 0.8 if i % 3 else 0.9})  # heavy score ties
    want = _run_reference(ref_modules, gt, dets)
    got = _run_ours(gt, dets)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_per_keypoint_idx_matches_reference(ref_modules):
    """evaluateEach's idx_keypoint loop (datasets/dataset.py:48-66) —
    single-keypoint OKS slicing (cocoeval.py:232-235) for all 14 joints."""
    rng = np.random.default_rng(3)
    gt, dets = _random_scenario(rng)
    while not dets:
        gt, dets = _random_scenario(rng)
    for idx in range(14):
        want = _run_reference(ref_modules, gt, dets, idx_keypoint=idx)
        got = _run_ours(gt, dets, idx_keypoint=idx)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10,
                                   err_msg=f"idx_keypoint {idx}")


def test_golden_scenario_values_are_reference_true(ref_modules):
    """The pinned values in test_cocoeval_golden.py came from this repo's
    own evaluator; prove the same scenario yields them from the reference
    evaluator too (closing the self-reference loop)."""
    from test_cocoeval_golden import GOLDEN_STATS, _scenario
    gt, dets = _scenario()
    want = _run_reference(ref_modules, gt, dets)
    np.testing.assert_allclose(want, GOLDEN_STATS, rtol=0, atol=1e-12)
