"""SETUP.transferDtype — the half-width host->device wire format
(hupr_tpu/utils/transfer.py).

Bounds the opt-in numerics change: only the raw radar plane values are
quantized (bfloat16 keeps f32's exponent, ~8 mantissa bits => ~0.4% per
value); every XLA program casts back to f32 at entry BEFORE normalization,
so the forward/loss pipeline itself is unchanged. The tests pin (a) the
dtype plumbing through every transfer-bound loader and (b) a quantitative
bound on the induced loss/heatmap deltas for the eval step.
"""

import numpy as np
import pytest

from hupr_tpu.utils.transfer import cast_for_transfer, transfer_dtype


def test_transfer_dtype_table():
    import ml_dtypes
    assert transfer_dtype("float32") == np.float32
    assert transfer_dtype("float16") == np.float16
    assert transfer_dtype("bfloat16") == np.dtype(ml_dtypes.bfloat16)
    with pytest.raises(ValueError, match="transferDtype"):
        transfer_dtype("int8")


def test_cast_for_transfer_noop_same_dtype():
    x = np.ones((3,), np.float32)
    assert cast_for_transfer(x, np.dtype(np.float32)) is x
    y = cast_for_transfer(x, transfer_dtype("bfloat16"))
    assert y.dtype == transfer_dtype("bfloat16")
    np.testing.assert_allclose(y.astype(np.float32), x)


def _tiny_batch(rng, b=2, dtype=np.float32):
    shape = (b, 8, 8, 2, 64, 64, 8)
    return {
        "hori": rng.standard_normal(shape).astype(np.float32).astype(dtype),
        "vert": rng.standard_normal(shape).astype(np.float32).astype(dtype),
        "jointsGroup": rng.uniform(20, 230, (b, 14, 2)),
    }


def test_eval_step_bfloat16_wire_bounded():
    """Eval loss/heatmaps under a bfloat16 wire stay within the quantization
    budget: the raw values carry <=2^-9 relative error each, and the
    pipeline (normalize -> conv net -> sigmoid BCE) is smooth, so a ~1%
    relative loss delta bound is generous but still discriminating (a bug
    that, e.g., normalized before the cast-back or double-cast would blow
    past it)."""
    import jax

    from hupr_tpu.config import Config
    from hupr_tpu.engine.steps import init_state, make_eval_step
    from hupr_tpu.models import build_model

    cfg = Config()
    cfg.MODEL.numFilters = 2
    model = build_model(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)

    rng = np.random.default_rng(3)
    f32 = _tiny_batch(rng)
    bf16 = {k: (cast_for_transfer(v, transfer_dtype("bfloat16"))
                if k != "jointsGroup" else v) for k, v in f32.items()}
    assert bf16["hori"].nbytes == f32["hori"].nbytes // 2

    out32 = eval_step(state, f32)
    out16 = eval_step(state, bf16)
    l32, l16 = float(out32["loss"]), float(out16["loss"])
    assert abs(l16 - l32) <= 0.01 * abs(l32)
    h32 = np.asarray(out32["predHeatmap"], np.float32)
    h16 = np.asarray(out16["predHeatmap"], np.float32)
    # sigmoided heatmaps live in (0,1): absolute tolerance is the right frame
    assert np.max(np.abs(h16 - h32)) <= 0.05
    # and the wire really was half-width on device entry
    assert str(jax.tree.leaves(bf16)[0].dtype) in ("bfloat16", "float16")


def test_loaders_ship_wire_dtype(tmp_path):
    """Every transfer-bound loader honors the wire dtype: classic
    BatchLoader windows, chunk-train frame unions, sequence-eval planes."""
    import sys

    sys.path.insert(0, "tests")
    from test_e2e import make_tiny_dataset, tiny_cfg

    from hupr_tpu.data import BatchLoader, get_dataset
    from hupr_tpu.engine.chunk_train import ChunkTrainLoader
    from hupr_tpu.engine.seq_eval import SequenceEvaluator
    from hupr_tpu.models import build_model

    make_tiny_dataset(str(tmp_path), [1])
    cfg = tiny_cfg(str(tmp_path))
    cfg.SETUP.transferDtype = "bfloat16"
    wire = transfer_dtype("bfloat16")

    ds = get_dataset("train", cfg, 1)
    batch = next(iter(BatchLoader(ds, 2, transfer_dtype=wire)))
    assert batch["hori"].dtype == wire and batch["vert"].dtype == wire

    chunk = next(iter(ChunkTrainLoader(ds, 2, transfer_dtype=wire)))
    assert chunk["hori"].dtype == wire and chunk["vert"].dtype == wire

    ev = SequenceEvaluator(build_model(cfg), cfg)
    planes = ev._load_planes(get_dataset("val", cfg, 1), 0, cfg.DATASET.duration)
    assert all(p.dtype == wire for p in planes)


def test_runner_wires_transfer_dtype(tmp_path):
    """Runner reads SETUP.transferDtype and passes it to all its loaders."""
    import argparse
    import os
    import sys

    sys.path.insert(0, "tests")
    from test_e2e import make_tiny_dataset, tiny_cfg

    from hupr_tpu.engine import Runner

    make_tiny_dataset(str(tmp_path / "data"), [1])
    cfg = tiny_cfg(str(tmp_path / "data"))
    cfg.SETUP.transferDtype = "float16"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = argparse.Namespace(seed=0, dir="wire", visDir="none",
                                  eval=False, sampling_ratio=1,
                                  keypoints=False)
        runner = Runner(args, cfg)
        assert runner.train_loader.transfer_dtype == np.float16
        assert runner.test_loader.transfer_dtype == np.float16
    finally:
        os.chdir(cwd)
