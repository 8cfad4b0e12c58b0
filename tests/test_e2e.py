"""End-to-end: synthetic tiny dataset on disk -> train -> checkpoint -> eval
-> keypoint JSON -> OKS AP. Exercises L2 (data), L3 (model), L3' (loss/eval),
L4 (runner) together, on a virtual CPU mesh."""

import argparse
import json
import os

import numpy as np
import pytest

from hupr_tpu.config import Config, config_from_dict
from hupr_tpu.data.dataset import window_indices


def make_tiny_dataset(root, seq_ids, duration=8, chirps=16, r=64, a=64, e=8,
                      seed=0, img_size=256):
    """img_size scales the joint/bbox coordinate range (default keeps the
    historical uniform(40, 210) draw for 256-pixel images bit-exactly)."""
    rng = np.random.default_rng(seed)
    annots = {"train": [], "val": [], "test": []}
    for seq in seq_ids:
        for view in ("hori", "vert"):
            os.makedirs(os.path.join(root, f"single_{seq}", view),
                        exist_ok=True)
        blocks = []
        for f in range(duration):
            cube = (rng.standard_normal((chirps, r, a, e))
                    + 1j * rng.standard_normal((chirps, r, a, e))
                    ).astype(np.complex64)
            np.save(os.path.join(root, f"single_{seq}/hori/{f:09d}.npy"), cube)
            np.save(os.path.join(root, f"single_{seq}/vert/{f:09d}.npy"),
                    cube * 0.5)
            joints = rng.uniform(40 * (img_size / 256),
                                 210 * (img_size / 256), (14, 2)).tolist()
            xs = [j[0] for j in joints]; ys = [j[1] for j in joints]
            blocks.append({
                "image": "%09d.jpg" % f,
                "joints": joints,
                "bbox": [min(xs) - 5, min(ys) - 5, max(xs) + 5, max(ys) + 5],
            })
        for phase in annots:
            annots[phase].append(blocks)
    for phase, data in annots.items():
        with open(os.path.join(root, f"hrnet_annot_{phase}.json"), "w") as fp:
            json.dump(data, fp)


def tiny_cfg(data_dir, duration=8, spatial=64):
    """spatial=32 is the reduced 32x32 layout (the dryrun's: full graph
    structure, 16x less attention work) — pair it with
    make_tiny_dataset(r=32, a=32, img_size=128)."""
    dataset = {
        "duration": duration, "dataDir": data_dir,
        "trainName": [1], "valName": [1], "testName": [1],
    }
    if spatial != 64:
        dataset.update(rangeSize=spatial, azimuthSize=spatial,
                       heatmapSize=spatial, imgSize=4 * spatial)
    return config_from_dict({
        "DATASET": dataset,
        "MODEL": {"numFilters": 2},
        "TRAINING": {"batchSize": 2, "epochs": 1, "lr": 1e-4,
                     "lrDecayIter": 2},
        "TEST": {"batchSize": 2},
    })


def test_window_indices_boundaries():
    w = window_indices(20, duration=10, group=8)
    # middle of a sequence: contiguous window [i-4, i+3]
    assert list(w[5]) == [1, 2, 3, 4, 5, 6, 7, 8]
    # sequence start: clamped at the first frame of that sequence
    assert list(w[0]) == [0, 0, 0, 0, 0, 1, 2, 3]
    assert list(w[10]) == [10, 10, 10, 10, 10, 11, 12, 13]
    # sequence end: clamped at the last frame of that sequence
    assert list(w[9]) == [5, 6, 7, 8, 9, 9, 9, 9]
    assert w.max() == 19 and w.min() == 0


@pytest.mark.slow
def test_train_eval_end_to_end(tmp_path):
    data_dir = str(tmp_path / "data")
    make_tiny_dataset(data_dir, [1])
    cfg = tiny_cfg(data_dir)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from hupr_tpu.engine import Runner
        args = argparse.Namespace(seed=0, dir="e2e", visDir="none",
                                  eval=False, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        runner.train()

        assert os.path.exists("logs/e2e/checkpoint.ckpt")
        assert os.path.exists("logs/e2e/checkpoint_0.ckpt")
        assert os.path.exists("logs/e2e/model_best.ckpt")
        assert os.path.exists("logs/e2e/val_results.json")
        with open("logs/e2e/val_results.json") as fp:
            preds = json.load(fp)
        assert len(preds) == 8
        for block in preds:
            assert len(block["keypoints"]) == 42
            assert block["score"] == 1.0

        # train-mode resume restores the LR in effect at the save (the
        # reference restores param_groups' lr via optimizer.load_state_dict,
        # tools/base.py:114) — not the fresh-run initial LR
        args3 = argparse.Namespace(seed=0, dir="e2e", visDir="none",
                                   eval=False, sampling_ratio=1,
                                   keypoints=False)
        runner3 = Runner(args3, cfg)
        assert runner3.lr == cfg.TRAINING.lr  # fresh-init value pre-load
        runner3.load_model_weight("checkpoint")
        assert np.isclose(runner3.lr, runner.lr)
        assert runner3.lr != cfg.TRAINING.lr  # decay steps actually applied

        # resume path: a fresh runner loads the checkpoint
        args2 = argparse.Namespace(seed=0, dir="e2e", visDir="none",
                                   eval=True, sampling_ratio=1,
                                   keypoints=True)
        runner2 = Runner(args2, cfg)
        runner2.load_model_weight("model_best")
        ap = runner2.eval(visualization=False)
        assert 0.0 <= ap <= 1.0
        assert os.path.exists("logs/e2e/test_results.json")
    finally:
        os.chdir(cwd)


def test_loss_decreases_on_overfit(tmp_path):
    """A few steps on one repeated batch must reduce the training loss —
    catches broken gradients/optimizer wiring."""
    data_dir = str(tmp_path / "data")
    make_tiny_dataset(data_dir, [1])
    cfg = tiny_cfg(data_dir)

    import jax
    from hupr_tpu.data import BatchLoader, get_dataset
    from hupr_tpu.engine.steps import (init_state, make_optimizer,
                                       make_train_step)
    from hupr_tpu.models import build_model

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ds = get_dataset("train", cfg)
        batch = next(iter(BatchLoader(ds, 2, shuffle=False)))
        device_batch = {k: batch[k] for k in ("hori", "vert", "jointsGroup")}
        model = build_model(cfg)
        tx = make_optimizer(cfg)
        state = init_state(model, cfg, jax.random.PRNGKey(0))
        step = make_train_step(model, tx)
        losses = []
        for _ in range(6):
            state, metrics = step(state, device_batch, 1e-3, 0.0)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
    finally:
        os.chdir(cwd)


def test_batch_loader_parallel_assembly_matches_serial(tmp_path):
    """workers>1 fans raw_sample IO over a thread pool; batches must be
    byte-identical to the serial loader, for both sequential eval order and
    the seeded shuffled train order (the rng stream stays sequential)."""
    from hupr_tpu.data import BatchLoader, get_dataset

    data_dir = str(tmp_path / "data")
    make_tiny_dataset(data_dir, [1])
    cfg = tiny_cfg(data_dir)
    ds = get_dataset("val", cfg, 1)

    for shuffle, seed in ((False, 0), (True, 3)):
        serial = list(BatchLoader(ds, 3, shuffle=shuffle, seed=seed,
                                  workers=1))
        pooled = list(BatchLoader(ds, 3, shuffle=shuffle, seed=seed,
                                  workers=4))
        assert len(serial) == len(pooled) == 3  # 8 samples / batch 3
        for a, b in zip(serial, pooled):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


def test_batch_loader_process_slices_reassemble_global_batch(tmp_path):
    """Multi-host mode: the per-process loaders' row slices, concatenated,
    must equal the single-process batch padded to the global row count —
    same epoch permutation on every process, padding rows repeating the
    last sample, trueRows carried for the global mask."""
    from hupr_tpu.data import BatchLoader, get_dataset

    data_dir = str(tmp_path / "data")
    make_tiny_dataset(data_dir, [1])
    cfg = tiny_cfg(data_dir)
    ds = get_dataset("val", cfg, 1)

    padded = 4   # global batch 3 padded to 4 rows over 2 "processes"
    whole = list(BatchLoader(ds, 3, shuffle=True, seed=5))
    parts = [list(BatchLoader(ds, 3, shuffle=True, seed=5,
                              process=(p, 2), padded_rows=padded))
             for p in range(2)]
    assert len(whole) == len(parts[0]) == len(parts[1]) == 3
    for k, full in enumerate(whole):
        true_b = len(full["imageId"])
        assert parts[0][k]["trueRows"] == parts[1][k]["trueRows"] == true_b
        for key in ("hori", "vert", "jointsGroup", "imageId"):
            glob = np.concatenate([parts[0][k][key], parts[1][k][key]])
            want = np.concatenate(
                [full[key]] + [full[key][-1:]] * (padded - true_b))
            np.testing.assert_array_equal(glob, want)


def test_batch_loader_abandoned_iterator_releases_producer(tmp_path):
    """Breaking out of iteration early must unblock and finish the prefetch
    thread instead of leaving it pinned on a full queue forever."""
    import threading
    import time

    from hupr_tpu.data import BatchLoader, get_dataset

    data_dir = str(tmp_path / "data")
    make_tiny_dataset(data_dir, [1])
    cfg = tiny_cfg(data_dir)
    ds = get_dataset("val", cfg, 1)

    before = threading.active_count()
    it = iter(BatchLoader(ds, 2, shuffle=False, prefetch=1))
    next(it)
    it.close()  # abandon mid-iteration (what a consumer exception does)
    deadline = time.monotonic() + 10.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch thread leaked"


def test_frame_cache_byte_bound():
    from hupr_tpu.data.dataset import FrameCache
    c = FrameCache(max_items=100, max_bytes=4096)
    a = np.zeros(256, np.float32)  # 1 KiB
    for i in range(10):
        c.put(i, (a, a))           # 2 KiB per entry -> at most 2 fit
    assert not c.has(0) and c.has(9)
    assert c._bytes <= 4096 and len(c._d) == 2
    c.put(9, (a, a))               # re-put must not double-count
    assert c._bytes == 4096
