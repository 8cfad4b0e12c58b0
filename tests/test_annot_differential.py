"""Differential validation of GT-annotation generation against the
reference's own generateGTAnnot (datasets/base.py:26-92): both read the same
hrnet_annot_{phase}.json and must write byte-equal {phase}_gt.json content
(image_id = frame + seq*100000, vis forced to 2, xyxy->xywh, area = w*h/2,
identical category/skeleton block).

torchvision (imported at the top of datasets/base.py) is not installed;
it is stubbed in sys.modules — generateGTAnnot itself never touches it.
"""

import importlib.util
import io
import json
import os
import sys
import types
from contextlib import redirect_stdout

import numpy as np
import pytest

from hupr_tpu.config import config_from_dict
from hupr_tpu.data.annot import generate_gt_annotations

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE, "datasets", "base.py")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_generate_gt():
    for name in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    spec = importlib.util.spec_from_file_location(
        "refdatasets_base", os.path.join(REFERENCE, "datasets", "base.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.generateGTAnnot


def _write_hrnet_annots(data_dir, seq_ids, frames=5, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(data_dir, exist_ok=True)
    for phase in ("train", "val", "test"):
        per_seq = []
        for _ in seq_ids:
            blocks = []
            for f in range(frames):
                joints = rng.uniform(10, 246, (14, 2)).tolist()
                xs = [j[0] for j in joints]
                ys = [j[1] for j in joints]
                blocks.append({
                    "image": "%09d.jpg" % f,
                    "joints": joints,
                    "bbox": [min(xs) - 3, min(ys) - 3,
                             max(xs) + 3, max(ys) + 3],
                })
            per_seq.append(blocks)
        with open(os.path.join(data_dir, f"hrnet_annot_{phase}.json"),
                  "w") as fp:
            json.dump(per_seq, fp)


def test_gt_json_matches_reference(ref_generate_gt, tmp_path):
    splits = {"trainName": [3, 17], "valName": [3, 17], "testName": [3, 17]}

    ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
    _write_hrnet_annots(ref_dir, [3, 17])
    _write_hrnet_annots(our_dir, [3, 17])

    for phase in ("train", "val", "test"):
        cfg_ref = config_from_dict({"DATASET": dict(splits, dataDir=ref_dir)})
        with redirect_stdout(io.StringIO()):
            ref_generate_gt(cfg_ref, phase)
        cfg_ours = config_from_dict({"DATASET": dict(splits,
                                                     dataDir=our_dir)})
        generate_gt_annotations(cfg_ours, phase)

        with open(os.path.join(ref_dir, f"{phase}_gt.json")) as fp:
            want = json.load(fp)
        with open(os.path.join(our_dir, f"{phase}_gt.json")) as fp:
            got = json.load(fp)
        assert got == want


def test_normalize_matches_real_reference_class(ref_generate_gt):
    """Run the reference's actual Normalize transform (datasets/base.py:13-24)
    on random per-chirp slices and compare with the fused device-side
    normalize (channel axis == elevation axis after ToTensor HWC->CHW)."""
    import importlib.util
    import jax.numpy as jnp
    import torch

    from hupr_tpu.ops.normalize import normalize_radar_window

    spec = importlib.util.spec_from_file_location(
        "refdatasets_base2", os.path.join(REFERENCE, "datasets", "base.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref_norm = mod.Normalize()

    rng = np.random.default_rng(5)
    x = (rng.standard_normal((3, 4, 64, 64, 8)) * 21.0 + 3.0
         ).astype(np.float32)  # (frames, chirps, R, A, E)
    got = np.asarray(normalize_radar_window(jnp.asarray(x)))
    for f in range(3):
        for c in range(4):
            t = torch.from_numpy(x[f, c]).permute(2, 0, 1)  # ToTensor
            want = ref_norm(t).permute(1, 2, 0).numpy()
            np.testing.assert_allclose(got[f, c], want, atol=2e-5)
