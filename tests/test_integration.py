"""L1 -> L2 seam: raw DCA1000 capture -> preprocessing CLI -> .npy cubes ->
GT annot generation -> HuPRDataset sample assembly."""

import json
import os

import numpy as np

from hupr_tpu.config import config_from_dict
from hupr_tpu.data import get_dataset
from hupr_tpu.preprocessing.process_iwr1843 import RadarPreprocessor
from test_preprocess import _serialize_dca1000


def test_capture_to_dataset(tmp_path):
    rng = np.random.default_rng(0)
    n_frames = 4
    raw_dir = tmp_path / "raw_data/iwr1843/HuPR/single_1"
    for view in ("hori", "vert"):
        os.makedirs(raw_dir / view)
        data = (rng.integers(-300, 300, (4, 192 * n_frames, 256))
                + 1j * rng.integers(-300, 300, (4, 192 * n_frames, 256))
                ).astype(np.complex128)
        _serialize_dca1000(data).tofile(raw_dir / view / "adc_data.bin")

    data_root = tmp_path / "data"
    pre = RadarPreprocessor(num_sequences=1,
                            raw_base=str(tmp_path / "raw_data"),
                            out_base=str(data_root), batch_frames=4)
    pre.process_radar_data_hori_vert()

    # annotations for the 4 frames
    blocks = []
    for f in range(n_frames):
        joints = rng.uniform(40, 210, (14, 2)).tolist()
        xs = [j[0] for j in joints]; ys = [j[1] for j in joints]
        blocks.append({"image": "%09d.jpg" % f, "joints": joints,
                       "bbox": [min(xs), min(ys), max(xs), max(ys)]})
    with open(data_root / "HuPR" / "hrnet_annot_val.json", "w") as fp:
        json.dump([blocks], fp)

    cfg = config_from_dict({
        "DATASET": {"duration": n_frames, "dataDir": str(data_root / "HuPR"),
                    "valName": [1], "trainName": [1], "testName": [1]},
        "MODEL": {"numFilters": 2},
    })
    ds = get_dataset("val", cfg)
    assert len(ds) == n_frames
    s = ds.raw_sample(2)
    assert s["hori"].shape == (8, 8, 2, 64, 64, 8)
    assert s["vert"].shape == (8, 8, 2, 64, 64, 8)
    assert np.isfinite(s["hori"]).all()
    assert s["imageId"] == 100002
