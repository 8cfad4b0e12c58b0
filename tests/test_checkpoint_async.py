"""AsyncCheckpointer: one snapshot written to several retention files on a
background thread, safe against train_step's donated-buffer invalidation
(the save issues an on-device copy before returning)."""

import os

import jax
import numpy as np

from hupr_tpu.config import config_from_dict
from hupr_tpu.engine.checkpoint import (
    AsyncCheckpointer, load_checkpoint, save_checkpoint)
from hupr_tpu.engine.steps import init_state, make_optimizer, make_train_step
from hupr_tpu.models import build_model


def _setup():
    cfg = config_from_dict({"MODEL": {"numFilters": 2}})
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    return cfg, model, tx, state


def _batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, 8, 8, 2, 64, 64, 8)
    return {
        "hori": rng.standard_normal(shape).astype(np.float32),
        "vert": rng.standard_normal(shape).astype(np.float32),
        "jointsGroup": rng.uniform(20, 230, (b, 14, 2)),
    }


def test_async_save_matches_sync_and_survives_donation(tmp_path):
    cfg, model, tx, state = _setup()
    sync_path = str(tmp_path / "sync.ckpt")
    save_checkpoint(sync_path, state, epoch=3, accuracy=0.25, lr=5e-5)

    ckpt = AsyncCheckpointer()
    paths = [str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")]
    ckpt.save(paths, state, epoch=3, accuracy=0.25, lr=5e-5)

    # donate the live state's buffers while the background fetch runs —
    # exactly what the next train step does in the Runner
    step = make_train_step(model, tx)
    new_state, _ = step(state, _batch(), 1e-4, 0.0)
    ckpt.wait()

    template = init_state(model, cfg, jax.random.PRNGKey(7))
    want, epoch_w, acc_w, lr_w = load_checkpoint(sync_path, template)
    assert np.isclose(lr_w, 5e-5)  # resume continues the saved LR schedule
    for p in paths:
        assert os.path.exists(p)
        got, epoch, acc, lr = load_checkpoint(p, template)
        assert (epoch, acc) == (epoch_w, acc_w) == (3, 0.25)
        assert np.isclose(lr, lr_w)
        for a, b in zip(jax.tree.leaves(want.params),
                        jax.tree.leaves(got.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(want.opt_state),
                        jax.tree.leaves(got.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # saved snapshot is the PRE-step state, not the stepped one
    diffs = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(new_state.params),
                             jax.tree.leaves(want.params))]
    assert any(diffs)


def test_async_save_propagates_failures(tmp_path):
    _, _, _, state = _setup()
    ckpt = AsyncCheckpointer()
    ckpt.save([str(tmp_path / "no_dir" / "x.ckpt")], state, 0, 0.0)
    try:
        ckpt.wait()
        raised = False
    except OSError:
        raised = True
    assert raised
