"""AOT serving export (engine/export.py): a serialized artifact, round-
tripped through bytes (and disk), must reproduce the live jitted serving
program's outputs — weights baked in, no model code needed at load time."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hupr_tpu.config import Config
from hupr_tpu.engine.export import (artifact_info, export_serving,
                                    load_artifact, load_serving,
                                    save_artifact)
from hupr_tpu.engine.pipeline import make_e2e_infer
from hupr_tpu.models import build_model
from hupr_tpu.ops.dsp import RadarParams

FRAMES = 4


def _tiny_serving():
    """Reduced-geometry model + capture params (the dryrun's 32x32 layout:
    full graph structure, 16x less attention work)."""
    cfg = Config()
    cfg.MODEL.numFilters = 2
    d = cfg.DATASET
    d.rangeSize = d.azimuthSize = 32
    d.heatmapSize = 32
    d.imgSize = 128
    model = build_model(cfg)
    rp = RadarParams(num_adc_samples=128, num_chirp=48,
                     idx_proc_chirp=16, num_group_chirp=2)
    assert rp.num_angle_bins == d.azimuthSize
    assert rp.num_kept_chirps == d.numFrames
    ex = jnp.zeros((1, d.numGroupFrames, d.numFrames, 2,
                    d.rangeSize, d.azimuthSize, d.elevationSize), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ex, ex)
    return model, variables, rp


def _inputs(rp, dtype=np.int16):
    rng = np.random.default_rng(7)
    shape = (FRAMES, rp.num_rx, rp.num_chirp, rp.num_adc_samples)
    return tuple(rng.integers(-300, 300, shape).astype(dtype)
                 for _ in range(4))


@pytest.fixture(scope="module")
def artifact():
    model, variables, rp = _tiny_serving()
    blob = export_serving(model, variables, params=rp, frames=FRAMES,
                          platforms=("cpu",))
    return model, variables, rp, blob


def test_export_round_trip_equals_live(artifact):
    model, variables, rp, blob = artifact
    args = _inputs(rp)

    live = make_e2e_infer(model, variables, params=rp, duration=FRAMES)
    pred_live, max_live = live(*args)

    serve = load_serving(blob)
    pred_exp, max_exp = serve(*args)

    np.testing.assert_allclose(np.asarray(max_exp), np.asarray(max_live),
                               atol=1e-6)
    same = np.mean(np.asarray(pred_exp) == np.asarray(pred_live))
    assert same >= 0.99, f"only {same:.2%} of exported coords match"


def test_artifact_info_and_file_round_trip(artifact, tmp_path):
    model, variables, rp, blob = artifact
    info = artifact_info(blob)
    assert info["platforms"] == ["cpu"]
    assert len(info["in_avals"]) == 4
    assert f"{FRAMES},{rp.num_rx},{rp.num_chirp},{rp.num_adc_samples}" \
        in info["in_avals"][0].replace(" ", "")
    assert info["bytes"] == len(blob)

    path = str(tmp_path / "serving.jexp")
    save_artifact(path, blob)
    serve = load_artifact(path)
    args = _inputs(rp)
    pred, maxv = serve(*args)
    assert np.asarray(pred).shape == (FRAMES, 14, 2)
    assert np.all(np.isfinite(np.asarray(maxv)))


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        load_serving(b"not an artifact")
