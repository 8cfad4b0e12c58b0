"""End-to-end LEARNING proof: the full framework loop — dataset -> Normalize
-> HuPRNet -> BCE-on-Gaussian-targets loss -> torch-semantics Adam -> argmax
decode -> keypoint export -> OKS evaluator — can actually learn a
localization task, not just run.

The reference has no such test (SURVEY.md §4: its only validation is
training on the real dataset); this pins the property that gradients,
optimizer wiring, target generation and the metric all point the same way:
synthetic radar cubes carry a bright complex spike at the (range, azimuth)
bin of the (colocated) joints, so a working pipeline must drive pixel error
down and AP up from chance level.
"""

import argparse
import json
import os

import numpy as np
import pytest

from hupr_tpu.config import config_from_dict


def make_learnable_dataset(root, duration=8, seed=0):
    """Cubes with a spike at (range=y/4, azimuth=x/4) across all chirps and
    elevations; all 14 joints colocated at the per-frame (x, y)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "single_1/hori"), exist_ok=True)
    os.makedirs(os.path.join(root, "single_1/vert"), exist_ok=True)
    blocks = []
    for f in range(duration):
        x = float(rng.uniform(48, 208))
        y = float(rng.uniform(48, 208))
        cube = (0.05 * (rng.standard_normal((16, 64, 64, 8))
                        + 1j * rng.standard_normal((16, 64, 64, 8)))
                ).astype(np.complex64)
        cube[:, int(y / 4), int(x / 4), :] += 3.0 + 3.0j
        np.save(os.path.join(root, f"single_1/hori/{f:09d}.npy"), cube)
        np.save(os.path.join(root, f"single_1/vert/{f:09d}.npy"), cube)
        blocks.append({"image": "%09d.jpg" % f, "joints": [[x, y]] * 14,
                       "bbox": [x - 50, y - 50, x + 50, y + 50]})
    for phase in ("train", "val", "test"):
        with open(os.path.join(root, f"hrnet_annot_{phase}.json"), "w") as fp:
            json.dump([blocks], fp)


@pytest.mark.slow
def test_model_learns_localization_to_nonzero_ap(tmp_path):
    import jax

    from hupr_tpu.data import BatchLoader, get_dataset
    from hupr_tpu.engine.steps import (init_state, make_eval_step,
                                       make_optimizer, make_train_step)
    from hupr_tpu.models import build_model

    duration, batch, steps = 8, 4, 150
    data_dir = str(tmp_path / "data")
    make_learnable_dataset(data_dir, duration)
    cfg = config_from_dict({
        "DATASET": {"duration": duration, "dataDir": data_dir,
                    "trainName": [1], "valName": [1], "testName": [1]},
        "MODEL": {"numFilters": 2},
        "TRAINING": {"batchSize": batch, "epochs": 1, "lr": 1e-3},
        "TEST": {"batchSize": batch},
    })
    ds = get_dataset("train", cfg)
    batches = list(BatchLoader(ds, batch, shuffle=False))
    device_batches = [{k: b[k] for k in ("hori", "vert", "jointsGroup")}
                      for b in batches]

    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    first_loss = None
    for i in range(steps):
        state, metrics = train_step(state, device_batches[i % len(batches)],
                                    1e-3, 0.0)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    # decoded pixel error on the train data: chance level is ~85 px
    # (uniform argmax over the 256-coord image vs uniform GT); a localizing
    # model is an order of magnitude below that
    errs = []
    for b, db in zip(batches, device_batches):
        out = eval_step(state, db, 0.0)
        pred = np.asarray(out["pred2d"]) * 4.0
        errs.append(np.abs(pred - np.asarray(b["jointsGroup"])).mean())
    assert float(np.mean(errs)) < 25.0, errs

    # the full Runner eval path: keypoint export -> OKS evaluator -> AP.
    # An untrained model scores 0.000 here; localization must clear it.
    from hupr_tpu.engine.runner import Runner
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = argparse.Namespace(seed=0, dir="learn", visDir="none",
                                  eval=True, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        runner.state = state
        ap = runner.eval(visualization=False)
    finally:
        os.chdir(cwd)
    assert ap > 0.1, ap
