import json
import os

import numpy as np
import pytest

from hupr_tpu.config import config_from_dict, load_config
from hupr_tpu.eval.coco_api import COCO, COCOeval
from hupr_tpu.utils.plot import plot_human_pose
from hupr_tpu.utils.profiling import StepTimer


def test_coco_api_surface(tmp_path):
    from test_cocoeval import _gt_dataset, _det, _rand_joints
    rng = np.random.default_rng(0)
    # ids start at 1 (gt id 0 == "unmatched" in pycocotools semantics)
    images = [(i, _rand_joints(rng), (40, 40, 120, 160)) for i in range(1, 4)]
    gt_path = tmp_path / "gt.json"
    with open(gt_path, "w") as fp:
        json.dump(_gt_dataset(images), fp)
    dt_path = tmp_path / "dt.json"
    with open(dt_path, "w") as fp:
        json.dump([_det(i, j) for (i, j, _) in images], fp)

    coco = COCO(str(gt_path))
    assert coco.getImgIds() == [1, 2, 3]
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


def test_plot_make_grid_pixel_geometry(tmp_path, monkeypatch):
    """Pixel parity with the reference's make_grid(padding=2, normalize=True)
    rendering (misc/plot.py:29-48): 260x260 canvas, 2px black border,
    min-max-normalized image, joints drawn at +2px offsets."""
    import cv2
    from PIL import Image

    # RGB frame at ../frames/<plotImgDir>/single_1/processed/images
    work = tmp_path / "work"
    img_dir = tmp_path / "frames" / "p" / "single_1" / "processed" / "images"
    img_dir.mkdir(parents=True)
    work.mkdir()
    rng = np.random.default_rng(1)
    rgb = rng.integers(40, 200, (256, 256, 3)).astype(np.uint8)
    Image.fromarray(rgb).save(img_dir / "000000007.jpg")
    monkeypatch.chdir(work)

    cfg = config_from_dict({"TEST": {"plotImgDir": "p"}})
    joints = np.full((1, 14, 2), 128.0)
    joints[0, 7] = [40.0, 60.0]  # Head: isolated, no edge overlaps circles
    plot_human_pose(joints, cfg, str(work / "vis"), np.array([100007]))
    out = cv2.imread(str(work / "vis" / "single_1" / "000000007.png"))[..., ::-1]

    assert out.shape == (260, 260, 3)
    # 2px border is black (make_grid pad_value=0)
    assert out[:2].max() == 0 and out[:, :2].max() == 0
    assert out[-2:].max() == 0 and out[:, -2:].max() == 0
    # interior equals the min-max normalized jpg (away from drawn joints)
    jpg = np.asarray(Image.open(img_dir / "000000007.jpg").convert("RGB"))
    t = jpg.astype(np.float64) / 255.0
    t = (t - t.min()) / max(t.max() - t.min(), 1e-5)
    want = np.clip(t * 255.0, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out[2:30, 2:30], want[:28, :28])
    # joint circle center lands at image coords + 2 (grid offset)
    assert tuple(out[62, 42]) == (255, 0, 0)


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


def test_config_empty_yaml_yields_defaults(tmp_path):
    """yaml.safe_load returns None for empty / comments-only files; loading
    one must produce the all-defaults Config, not a TypeError."""
    p = tmp_path / "empty.yaml"
    p.write_text("# nothing here\n")
    cfg = load_config(str(p))
    assert cfg.DATASET.heatmapSize == 64
    assert cfg.TRAINING.optimizer == "adam"


def test_config_warns_on_unknown_keys():
    import warnings as _w
    from hupr_tpu.config import config_from_dict
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        cfg = config_from_dict({"TRAINING": {"lrDeacy": 0.9, "lr": 1e-3},
                                "TRANING": {"lr": 5.0}})
    msgs = "\n".join(str(r.message) for r in rec)
    assert "lrDeacy" in msgs           # typo'd key warned
    assert "TRANING" in msgs           # typo'd section warned
    assert cfg.TRAINING.lr == 1e-3     # valid keys still applied
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        config_from_dict({"TRAINING": {"lr": 1e-3}})
    assert not rec                     # clean configs stay silent


def test_eval_params_pycocotools_alias_surface():
    """Reference-written code pokes pycocotools Params attribute names
    (e.g. datasets/dataset.py:53 sets useSegm); the facade params must
    expose them (misc/cocoeval.py:498-527)."""
    import numpy as np
    from hupr_tpu.eval.cocoeval import HUPR_OKS_SIGMAS, KeypointEvalParams
    p = KeypointEvalParams()
    p.useSegm = None
    np.testing.assert_allclose(p.kpt_oks_sigmas, HUPR_OKS_SIGMAS)
    assert p.maxDets == [20]
    assert p.areaRngLbl == ["all", "medium", "large"]
    assert p.areaRng[1] == [32.0 ** 2, 96.0 ** 2]
    assert len(p.iouThrs) == 10 and len(p.recThrs) == 101
    p.maxDets = [50]
    assert p.max_dets == 50
    p.kpt_oks_sigmas = np.ones(14) * 0.1
    np.testing.assert_allclose(p.sigmas, 0.1)


def test_reference_surface_compat_helpers(tmp_path):
    """getPaths/getAnnots/IMG_EXTENSIONS surface parity
    (reference datasets/base.py:10-11,115-137)."""
    import json as _json
    from hupr_tpu.data.dataset import (
        HuPRDataset, get_annots, get_dataset, get_paths, getDataset,
        is_image_file)
    assert is_image_file("x.npy") and is_image_file("a.JPG")
    assert not is_image_file("a.wav")
    d = tmp_path / "root" / "seq1" / "hori"
    d.mkdir(parents=True)
    (d / "annot.json").write_text(_json.dumps([{"frame": 0}, {"frame": 1}]))
    paths = get_paths([str(tmp_path / "root")], [["seq1"]], "hori",
                      ["000000000", "000000001"])
    assert paths == [str(d / "000000000.npy"), str(d / "000000001.npy")]
    annots = get_annots([str(tmp_path / "root")], [["seq1"]], "hori",
                        "annot.json")
    assert annots == [{"frame": 0}, {"frame": 1}]
    assert getDataset is get_dataset
    assert HuPRDataset.evaluateEach is HuPRDataset.evaluate_each


def test_scaffold_creates_reference_tree(tmp_path, monkeypatch):
    """scaffold.main mirrors reference setup.py:3-23's directory tree."""
    import scaffold
    monkeypatch.chdir(tmp_path)
    scaffold.main(num_sequences=3)
    for d in ("data/HuPR", "visualization", "logs",
              "preprocessing/raw_data/iwr1843"):
        assert (tmp_path / d).is_dir()
    for i in (1, 2, 3):
        for sub in ("vert", "hori", "annot", "visualization"):
            assert (tmp_path / f"data/HuPR/single_{i}" / sub).is_dir()
    assert not (tmp_path / "data/HuPR/single_4").exists()


def test_machine_cache_key_discriminates_cpuid_model(tmp_path):
    """Two hosts with identical templated flags/model-name but different
    raw cpuid (family, model) — the firecracker migration case that made
    XLA's CPU AOT cache reject same-day entries with multi-KB ERROR walls
    (DEVNOTES round-4) — must land in DIFFERENT cache dirs. gcc's
    -march=native is too coarse to tell them apart (both resolve to
    'cooperlake'); the raw model number is the discriminator."""
    from hupr_tpu.utils.cache import machine_cache_dir

    def cpuinfo(model):
        p = tmp_path / f"cpuinfo_{model}"
        p.write_text(
            "vendor_id\t: GenuineIntel\n"
            "cpu family\t: 6\n"
            f"model\t\t: {model}\n"
            "model name\t: Intel(R) Xeon(R) Processor @ 2.10GHz\n"
            "stepping\t: 2\n"
            "flags\t\t: fpu vme de pse tsc avx512f amx-bf16\n")
        return str(p)

    a = machine_cache_dir("/tmp/c", cpuinfo=cpuinfo(207))   # Emerald Rapids
    b = machine_cache_dir("/tmp/c", cpuinfo=cpuinfo(143))   # Sapphire Rapids
    a2 = machine_cache_dir("/tmp/c", cpuinfo=cpuinfo(207))
    assert a != b                      # cpuid model discriminates
    assert a == a2                     # and the key is stable
    assert a.startswith("/tmp/c_") and b.startswith("/tmp/c_")
    # unreadable cpuinfo still degrades to a usable (march-only) key
    assert machine_cache_dir("/tmp/c", cpuinfo=str(tmp_path / "absent"))

def test_config_base_include(tmp_path):
    """Top-level `BASE:` deep-merges the included file under the overlay
    (override wins per leaf; untouched sections inherit); resolution is
    relative to the INCLUDING file, and include cycles raise instead of
    recursing forever."""
    sub = tmp_path / "config"
    sub.mkdir()
    (sub / "base.yaml").write_text(
        "DATASET:\n  heatmapSize: 32\n  duration: 8\n"
        "MODEL:\n  numFilters: 4\n  attention: 'xla'\n")
    (sub / "variant.yaml").write_text(
        "BASE: base.yaml\nMODEL:\n  attention: 'pallas'\n"
        "TRAINING:\n  lr: 0.001\n")
    cfg = load_config(str(sub / "variant.yaml"))
    assert cfg.MODEL.attention == "pallas"      # overlay wins
    assert cfg.MODEL.numFilters == 4            # sibling key inherited
    assert cfg.DATASET.heatmapSize == 32        # untouched section inherited
    assert cfg.DATASET.duration == 8
    assert cfg.TRAINING.lr == 0.001             # overlay-only section applied

    (sub / "a.yaml").write_text("BASE: b.yaml\n")
    (sub / "b.yaml").write_text("BASE: a.yaml\n")
    with pytest.raises(ValueError, match="cycle"):
        load_config(str(sub / "a.yaml"))


def test_config_tpu_variants_are_flagship_overlays():
    """The shipped TPU configs must stay the flagship recipe + knobs: same
    geometry/splits/training hyperparameters (checkpoint + eval-protocol
    parity), differing ONLY in the documented speed levers."""
    root = os.path.join(os.path.dirname(__file__), "..", "config")
    base = load_config(os.path.join(root, "mscsa_prgcn.yaml"))
    tpu = load_config(os.path.join(root, "mscsa_prgcn_tpu.yaml"))
    fast = load_config(os.path.join(root, "mscsa_prgcn_tpu_fast.yaml"))
    for cfg in (tpu, fast):
        assert cfg.DATASET.trainName == base.DATASET.trainName
        assert cfg.DATASET.heatmapSize == base.DATASET.heatmapSize
        assert cfg.TRAINING.lr == base.TRAINING.lr
        assert cfg.TRAINING.batchSize == base.TRAINING.batchSize
        assert cfg.MODEL.numFilters == base.MODEL.numFilters
        assert cfg.MODEL.attention == "pallas"
    # tpu = bit-exact parity: ONLY the attention kernel changes
    assert tpu.MODEL.computeDtype == "float32"
    assert tpu.SETUP.transferDtype == "float32"
    assert not tpu.TRAINING.chunkTrain
    # fast = every measured lever composed
    assert fast.MODEL.computeDtype == "bfloat16"
    assert fast.SETUP.transferDtype == "bfloat16"
    assert fast.TRAINING.chunkTrain and fast.TRAINING.chunkSource == "adc"
    assert fast.TEST.sequenceSource == "adc"
    assert fast.DATASET.adcDir
    # max = fast + the measured operating point (batch 128 + remat +
    # sqrt-scaled lr) through a NESTED BASE chain (max -> fast -> parity)
    mx = load_config(os.path.join(root, "mscsa_prgcn_tpu_max.yaml"))
    assert mx.TRAINING.batchSize == 128 and mx.MODEL.remat
    assert mx.TRAINING.lr == pytest.approx(2.5e-4)
    assert mx.MODEL.computeDtype == "bfloat16"          # inherited via fast
    assert mx.MODEL.attention == "pallas"
    assert mx.TRAINING.chunkTrain and mx.TRAINING.chunkSource == "adc"
    assert mx.DATASET.trainName == base.DATASET.trainName
    assert mx.DATASET.heatmapSize == base.DATASET.heatmapSize
