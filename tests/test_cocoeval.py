import numpy as np

from hupr_tpu.eval import KeypointEvaluator, HUPR_OKS_SIGMAS


def _gt_dataset(images):
    """images: list of (image_id, joints (14,2), bbox xywh)."""
    anns, imgs = [], []
    for img_id, joints, bbox in images:
        kpts = []
        for x, y in joints:
            kpts += [float(x), float(y), 2.0]
        anns.append({
            "num_keypoints": 14, "iscrowd": 0, "keypoints": kpts,
            "image_id": img_id, "id": img_id, "category_id": 1,
            "bbox": list(bbox), "area": bbox[2] * bbox[3] / 2.0,
        })
        imgs.append({"id": img_id, "height": 256, "width": 256})
    return {"images": imgs, "annotations": anns,
            "categories": [{"id": 1, "name": "person"}]}


def _det(img_id, joints, score=1.0):
    kpts = []
    for x, y in joints:
        kpts += [float(x), float(y), 1.0]
    return {"image_id": img_id, "category_id": 1, "keypoints": kpts,
            "score": score}


def _rand_joints(rng, n=14):
    return rng.uniform(50, 200, (n, 2))


def test_perfect_predictions_ap1():
    rng = np.random.default_rng(0)
    # ids start at 1: pycocotools (and the reference) treat gt id 0 as
    # "unmatched" — see test_cocoeval_differential / test_cocoeval_golden
    images = [(i, _rand_joints(rng), (40, 40, 120, 160)) for i in range(1, 6)]
    dts = [_det(i, j) for (i, j, _) in images]
    ev = KeypointEvaluator(_gt_dataset(images), dts)
    stats = ev.run(verbose=False)
    assert np.isclose(stats[0], 1.0)   # AP
    assert np.isclose(stats[5], 1.0)   # AR


def _expected_oks(gt_joints, dt_joints, area, idx=-1):
    var = (HUPR_OKS_SIGMAS * 2) ** 2
    d2 = np.sum((np.asarray(dt_joints) - np.asarray(gt_joints)) ** 2, axis=1)
    e = d2 / var / (area + np.spacing(1)) / 2
    if idx != -1:
        e = e[idx:idx + 1]
    return float(np.mean(np.exp(-e)))


def test_ap_threshold_step():
    """One gt/dt pair with known OKS: AP must equal the fraction of OKS
    thresholds at or below the achieved OKS."""
    rng = np.random.default_rng(1)
    joints = _rand_joints(rng)
    bbox = (40, 40, 120, 160)
    area = bbox[2] * bbox[3] / 2.0
    shifted = joints + rng.normal(0, 9.0, joints.shape)
    oks = _expected_oks(joints, shifted, area)
    assert 0.5 < oks < 0.95  # ensure a non-trivial step

    ev = KeypointEvaluator(_gt_dataset([(1, joints, bbox)]),
                           [_det(1, shifted)])
    stats = ev.run(verbose=False)
    thrs = np.linspace(0.5, 0.95, 10)
    want_ap = np.mean([1.0 if oks >= t else 0.0 for t in thrs])
    assert abs(stats[0] - want_ap) < 1e-6
    assert abs(stats[5] - want_ap) < 1e-6


def test_per_keypoint_evaluation():
    """idx_keypoint isolates a single joint's OKS (misc/cocoeval.py:232-235)."""
    rng = np.random.default_rng(2)
    joints = _rand_joints(rng)
    bbox = (40, 40, 120, 160)
    bad = joints.copy()
    bad[3] += 150.0  # ruin L_Hip only
    ev = KeypointEvaluator(_gt_dataset([(1, joints, bbox)]), [_det(1, bad)])
    good_stats = ev.run(idx_keypoint=0, verbose=False)
    bad_stats = ev.run(idx_keypoint=3, verbose=False)
    assert np.isclose(good_stats[0], 1.0)
    assert bad_stats[0] == 0.0  # OKS ~0 for the ruined joint


def test_area_ranges():
    rng = np.random.default_rng(3)
    joints = _rand_joints(rng)
    bbox = (40, 40, 60, 60)          # area 1800 -> medium [1024, 9216]
    ev = KeypointEvaluator(_gt_dataset([(1, joints, bbox)]), [_det(1, joints)])
    stats = ev.run(verbose=False)
    assert np.isclose(stats[3], 1.0)  # AP medium
    assert stats[4] == -1.0          # AP large: no gt in range
    assert np.isclose(stats[0], 1.0)


def test_missed_and_spurious_detections():
    rng = np.random.default_rng(4)
    imgs = [(i, _rand_joints(rng), (40, 40, 120, 160)) for i in range(1, 5)]
    # detect half the images correctly, nothing for the rest
    dts = [_det(i, j) for (i, j, _) in imgs[:2]]
    ev = KeypointEvaluator(_gt_dataset(imgs), dts)
    stats = ev.run(verbose=False)
    # recall capped at 0.5; AP = mean precision over rec thresholds <= 0.5
    assert abs(stats[5] - 0.5) < 1e-6
    assert 0.4 < stats[0] < 0.6
