import json
import os

import numpy as np

from hupr_tpu.config import config_from_dict, load_config
from hupr_tpu.eval.coco_api import COCO, COCOeval
from hupr_tpu.utils.plot import plot_human_pose
from hupr_tpu.utils.profiling import StepTimer


def test_coco_api_surface(tmp_path):
    from test_cocoeval import _gt_dataset, _det, _rand_joints
    rng = np.random.default_rng(0)
    images = [(i, _rand_joints(rng), (40, 40, 120, 160)) for i in range(3)]
    gt_path = tmp_path / "gt.json"
    with open(gt_path, "w") as fp:
        json.dump(_gt_dataset(images), fp)
    dt_path = tmp_path / "dt.json"
    with open(dt_path, "w") as fp:
        json.dump([_det(i, j) for (i, j, _) in images], fp)

    coco = COCO(str(gt_path))
    assert coco.getImgIds() == [0, 1, 2]
    assert len(coco.loadAnns(coco.getAnnIds(imgIds=1))) == 1
    assert coco.loadImgs(2)[0]["id"] == 2

    dt = coco.loadRes(str(dt_path))
    assert dt.anns[1]["area"] > 0 and len(dt.anns[1]["bbox"]) == 4

    ev = COCOeval(coco, dt, "keypoints")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    assert np.isclose(ev.stats[0], 1.0)
    # per-keypoint mode (reference patch surface)
    ev.evaluate(0)
    ev.accumulate()
    ev.summarize()
    assert np.isclose(ev.stats[0], 1.0)


def test_plot_human_pose_without_frames(tmp_path):
    cfg = config_from_dict({"TEST": {"plotImgDir": ""}})
    joints = np.random.default_rng(0).uniform(10, 240, (2, 14, 2))
    image_ids = np.array([100001, 100002])
    plot_human_pose(joints, cfg, str(tmp_path), image_ids)
    out = tmp_path / "single_1" / "000000001.png"
    assert out.exists()


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["total_s"] >= 0


def test_config_yaml_loads_reference_schema():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "config", "mscsa_prgcn.yaml"))
    assert cfg.DATASET.heatmapSize == 64
    assert cfg.DATASET.numChirps == 16
    assert len(cfg.DATASET.trainName) == 193
    assert len(cfg.DATASET.valName) == 21
    assert len(cfg.DATASET.testName) == 21
    assert cfg.TRAINING.batchSize == 20
    assert cfg.TRAINING.optimizer == "adam"
    assert cfg.TEST.batchSize == 32
    assert cfg.DATASET.split_names("train") == cfg.DATASET.trainName
