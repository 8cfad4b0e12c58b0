"""Chunk-mode training (engine/chunk_train.py): device-side window assembly
must be a pure throughput optimization — per-step losses, parameter updates,
and BN statistics EQUAL the classic host-assembled step on the same window
batch (the reference step semantics, tools/run.py:65-86). Also pins the
chunk table's coverage/clamping against data.dataset.window_indices and the
loader's exactly-once epoch coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_e2e import make_tiny_dataset, tiny_cfg

from hupr_tpu.data import get_dataset
from hupr_tpu.data.dataset import window_indices
from hupr_tpu.engine.chunk_train import (ChunkTrainLoader, chunk_table,
                                         device_put_chunk,
                                         make_chunk_train_step)
from hupr_tpu.engine.steps import init_state, make_optimizer, make_train_step
from hupr_tpu.models import build_model


def _cfg(tmp_path, batch_size, duration=8):
    data_dir = str(tmp_path / "data")
    make_tiny_dataset(data_dir, [1], duration=duration, r=32, a=32,
                      img_size=128)
    cfg = tiny_cfg(data_dir, duration=duration)
    cfg.DATASET.rangeSize = cfg.DATASET.azimuthSize = 32
    cfg.DATASET.heatmapSize = 32
    cfg.DATASET.imgSize = 128
    cfg.TRAINING.batchSize = batch_size
    return cfg


def _geometry(cfg):
    d = cfg.DATASET
    return (d.numKeypoints, d.heatmapSize, d.imgSize)


def _classic_batch(ds, chunk, batch_size):
    """Host-assembled window batch for the chunk's rows (the classic
    contract), padded by repeating the last real row with mask 0."""
    true_b = chunk["true_b"]
    rows = [ds.raw_sample(chunk["row0"] + i) for i in range(true_b)]
    rows += [rows[-1]] * (batch_size - true_b)
    batch = {k: np.stack([r[k] for r in rows]).astype(
                 np.float32 if k != "jointsGroup" else np.float64)
             for k in ("hori", "vert", "jointsGroup")}
    batch["mask"] = (np.arange(batch_size) < true_b).astype(np.float32)
    return batch


def _copy_state(state):
    return jax.tree.map(jnp.copy, state)


def _run_both(cfg, chunk, ds, mesh=None):
    """One classic step and one chunk step from identical initial state on
    the same window batch; returns both (state, metrics) pairs."""
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx=tx)
    geometry = _geometry(cfg)
    b = cfg.TRAINING.batchSize

    classic_step = make_train_step(model, tx, -1.0, geometry)
    classic_batch = {k: jnp.asarray(v)
                     for k, v in _classic_batch(ds, chunk, b).items()}
    s1, m1 = classic_step(_copy_state(state), classic_batch, 1e-4, 0.0)

    chunk_step = make_chunk_train_step(model, tx, geometry, mesh=mesh)
    pad_multiple = mesh.devices.size if mesh is not None else 1
    loader = ChunkTrainLoader(ds, b, shuffle=False,
                              pad_multiple=pad_multiple)
    # the chunk passed in was built unpadded; use the loader's padded table
    chunk = next(c for c in loader.chunks if c["row0"] == chunk["row0"])
    assembled = loader._assemble(chunk)
    dev_batch, true_b = device_put_chunk(assembled, mesh)
    assert true_b == chunk["true_b"]
    s2, m2 = chunk_step(_copy_state(state), dev_batch, 1e-4, 0.0)
    return (s1, m1), (s2, m2)


def _assert_equal_steps(res_classic, res_chunk, tol=2e-5):
    (s1, m1), (s2, m2) = res_classic, res_chunk
    # losses: identical math, different program shapes — f32 reassociation
    np.testing.assert_allclose(float(m1["loss1"]), float(m2["loss1"]),
                               rtol=tol)
    np.testing.assert_allclose(float(m1["loss2"]), float(m2["loss2"]),
                               rtol=tol)
    # updated parameters: gradients must agree (autodiff sums the shared
    # frames' cotangents); Adam normalizes by |grad|, so compare the moved
    # params with an absolute floor tied to the lr scale
    flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(s2.params))
    assert len(flat1) == len(flat2)
    for path, leaf1 in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf1), np.asarray(flat2[path]),
            rtol=5e-3, atol=5e-6, err_msg=jax.tree_util.keystr(path))
    for path, leaf1 in jax.tree_util.tree_leaves_with_path(s1.batch_stats):
        other = dict(jax.tree_util.tree_leaves_with_path(s2.batch_stats))
        np.testing.assert_allclose(
            np.asarray(leaf1), np.asarray(other[path]),
            rtol=1e-4, atol=1e-6, err_msg=jax.tree_util.keystr(path))


def test_chunk_table_matches_window_indices():
    duration, group, b = 10, 8, 4
    windows = window_indices(20, duration, group)  # two sequences
    chunks = chunk_table(windows, duration, b)
    assert len(chunks) == 2 * -(-duration // b)
    covered = []
    for c in chunks:
        assert c["n_frames"] <= b + group - 1
        assert c["rel"].shape == (b, group)
        assert c["rel"].min() >= 0 and c["rel"].max() < c["n_frames"]
        for i in range(c["true_b"]):
            # gather table must reproduce the reference clamp row exactly
            np.testing.assert_array_equal(c["rel"][i] + c["lo"],
                                          windows[c["row0"] + i])
            covered.append(c["row0"] + i)
    assert sorted(covered) == list(range(20))  # every window exactly once


def test_chunk_step_equals_classic_full_batch(tmp_path):
    cfg = _cfg(tmp_path, batch_size=4)
    ds = get_dataset("train", cfg, 1)
    chunks = chunk_table(ds.windows, ds.duration, 4)
    full = next(c for c in chunks if c["true_b"] == 4)
    _assert_equal_steps(*_run_both(cfg, full, ds))


def test_chunk_step_equals_classic_padded_remainder(tmp_path):
    # duration 8, B 5 -> second chunk has 3 real windows + 2 masked pads
    cfg = _cfg(tmp_path, batch_size=5)
    ds = get_dataset("train", cfg, 1)
    chunks = chunk_table(ds.windows, ds.duration, 5)
    partial = next(c for c in chunks if c["true_b"] == 3)
    _assert_equal_steps(*_run_both(cfg, partial, ds))


def test_chunk_step_meshed_equals_classic(tmp_path):
    # the sharded program (frames on the frame axis, windows on the batch
    # axis, GSPMD all-gather between; both axes padded to device-count
    # multiples) must compute the same step as the unmeshed classic one
    from hupr_tpu.parallel import make_mesh
    cfg = _cfg(tmp_path, batch_size=8)
    ds = get_dataset("train", cfg, 1)
    chunks = chunk_table(ds.windows, ds.duration, 8)
    full = next(c for c in chunks if c["true_b"] == 8)
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest's virtual CPU mesh
    _assert_equal_steps(*_run_both(cfg, full, ds, mesh=mesh))


def test_chunk_loader_epoch_coverage(tmp_path):
    cfg = _cfg(tmp_path, batch_size=3)
    ds = get_dataset("train", cfg, 1)
    loader = ChunkTrainLoader(ds, 3, seed=5, shuffle=True)
    seen, orders = [], []
    for _ in range(2):
        epoch_ids = []
        for batch in loader:
            assert batch["hori"].shape[0] == loader.f_pad
            assert np.isfinite(batch["hori"]).all()
            epoch_ids.extend(int(i) for i in batch["imageId"])
        orders.append(tuple(epoch_ids))
        seen.append(sorted(epoch_ids))
    # every window exactly once per epoch; epochs shuffle chunk order
    assert seen[0] == sorted(ds.image_ids) == seen[1]
    assert orders[0] != orders[1]
    # reproducible: same seed restarts give the same epoch-0 order
    loader2 = ChunkTrainLoader(ds, 3, seed=5, shuffle=True)
    ids2 = [int(i) for b in loader2 for i in b["imageId"]]
    assert tuple(ids2) == orders[0]


def test_chunk_process_blocks_cover_full_assembly(tmp_path):
    """Multi-host mode: the per-process blocks of every leaf, concatenated
    in process order, equal the single-process assembly — so the global
    jax.Arrays built from them (device_put_chunk) hold exactly the
    single-host batch."""
    cfg = _cfg(tmp_path, batch_size=4)
    ds = get_dataset("train", cfg, 1)
    full = ChunkTrainLoader(ds, 4, shuffle=False, pad_multiple=8)
    parts = [ChunkTrainLoader(ds, 4, shuffle=False, pad_multiple=8,
                              process=(p, 2)) for p in range(2)]
    assert full.f_pad % 2 == 0 and full.rows_pad % 2 == 0
    for ci in range(len(full.chunks)):
        whole = full._assemble(full.chunks[ci])
        slices = [p._assemble(p.chunks[ci]) for p in parts]
        for k in ("hori", "vert", "rel", "jointsGroup", "mask"):
            np.testing.assert_array_equal(
                np.concatenate([s[k] for s in slices]), whole[k],
                err_msg=f"chunk {ci} leaf {k}")
        assert all(s["trueB"] == whole["trueB"] for s in slices)


@pytest.mark.slow
def test_runner_chunk_train_end_to_end(tmp_path):
    """Runner with TRAINING.chunkTrain: a full epoch trains, checkpoints,
    and evals through the standard pipeline."""
    import argparse
    import os

    cfg = _cfg(tmp_path, batch_size=3)
    cfg.TRAINING.chunkTrain = True
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from hupr_tpu.engine import Runner
        args = argparse.Namespace(seed=0, dir="chunk", visDir="none",
                                  eval=False, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        assert runner._chunk_loader is not None
        runner.train()
        assert os.path.exists("logs/chunk/checkpoint.ckpt")
        assert os.path.exists("logs/chunk/val_results.json")
    finally:
        os.chdir(cwd)


def test_runner_chunk_train_fallback(tmp_path, capsys):
    """Inapplicable settings (lossDecay != -1) keep the classic loader —
    and must NOT print the chunk-mode steering hint (the gate is the same
    applicability predicate)."""
    import argparse
    import os

    cfg = _cfg(tmp_path, batch_size=3)
    cfg.TRAINING.chunkTrain = True
    cfg.TRAINING.lossDecay = 0.1
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from hupr_tpu.engine import Runner
        args = argparse.Namespace(seed=0, dir="fb", visDir="none",
                                  eval=False, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        assert runner._chunk_loader is None
        assert "hint:" not in capsys.readouterr().out
    finally:
        os.chdir(cwd)


def test_runner_steers_qualifying_classic_runs_to_chunk_mode(tmp_path,
                                                            capsys):
    """A classic-loop training run that QUALIFIES for chunk mode gets the
    one-line steering hint (README 'Which config should I train with?');
    the fallback test above pins the no-hint case."""
    import argparse
    import os

    cfg = _cfg(tmp_path, batch_size=3)
    assert not cfg.TRAINING.chunkTrain
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from hupr_tpu.engine import Runner
        args = argparse.Namespace(seed=0, dir="steer", visDir="none",
                                  eval=False, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        assert runner._chunk_loader is None
        out = capsys.readouterr().out
        assert "hint: this run qualifies for chunk-mode training" in out
    finally:
        os.chdir(cwd)
