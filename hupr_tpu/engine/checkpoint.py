"""Checkpointing (parity: tools/base.py:75-122).

The reference keeps three torch pickles in ./logs/<dir>/: model_best.pth
(saved when val AP improves), checkpoint.pth (every epoch) and
checkpoint_{N}.pth (every 5 epochs), each holding model/optimizer/epoch/
accuracy; loading restores all of them. Here the same retention policy writes
msgpack trees via flax.serialization (single-file, atomic-rename), and
loadModelWeight additionally accepts the reference's .pth files through the
torch converter so published checkpoints evaluate directly.

The reference's resume path crashes on a never-defined args.pretrained
(tools/base.py:112) — documented bug, fixed here by just not having that flag.
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def _write_payload(path: str, payload: dict):
    # msgpack (flax.serialization), not pickle: loading a .ckpt from an
    # untrusted source must never execute code (same posture as the
    # weights_only torch.load in models/torch_convert.py)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
        fp.write(serialization.msgpack_serialize(
            serialization.to_state_dict(payload)))
    os.replace(tmp, path)


def snapshot_state(state, epoch: int, accuracy: float,
                   lr: Optional[float] = None) -> dict:
    """Fetch the TrainState to host ONCE; the payload can then be written to
    any number of retention files without further device round-trips.

    `lr` is the learning rate in effect when the snapshot was taken: the
    reference persists it inside optimizer.state_dict()['param_groups'] and
    restores it on resume (tools/base.py:114), so a resumed run continues
    the warmup-growth/decay trajectory instead of restarting at the initial
    LR. -1.0 encodes "not recorded"."""
    return {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "accuracy": float(accuracy) if accuracy is not None else -1.0,
        "lr": float(lr) if lr is not None else -1.0,
    }


def save_checkpoint(path: str, state, epoch: int, accuracy: float,
                    lr: Optional[float] = None):
    _write_payload(path, snapshot_state(state, epoch, accuracy, lr))


class AsyncCheckpointer:
    """Non-blocking checkpoint writer: the caller's thread only issues an
    on-device copy (async dispatch, ~free); the host fetch (slow on a thin
    host link) and file writes run on a background thread. The device copy
    makes the snapshot immune to train_step's buffer donation invalidating
    the live state."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._failure: list = []

    def save(self, paths, state, epoch: int, accuracy: float,
             lr: Optional[float] = None):
        """Write the same snapshot to every path in `paths`."""
        import jax.numpy as jnp
        self.wait()
        snap = state.replace(
            params=jax.tree.map(jnp.array, state.params),
            batch_stats=jax.tree.map(jnp.array, state.batch_stats),
            opt_state=jax.tree.map(jnp.array, state.opt_state),
            step=jnp.array(state.step))
        paths = list(paths)

        def work():
            try:
                payload = snapshot_state(snap, epoch, accuracy, lr)
                for p in paths:
                    _write_payload(p, payload)
            except BaseException as exc:  # surface on the next wait()
                self._failure.append(exc)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._failure:
            raise self._failure.pop()


def save_weights_only_checkpoint(path: str, variables: dict,
                                 accuracy: float = -1.0):
    """Checkpoint carrying model weights but no optimizer/progress state
    (epoch 0, empty opt_state — load_checkpoint substitutes a fresh one)."""
    _write_payload(path, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": {},
        "step": 0,
        "epoch": 0,
        "accuracy": float(accuracy),
    })


def load_checkpoint(path: str, state):
    """Restore a TrainState template from a saved checkpoint; returns
    (state, epoch, accuracy, lr) with lr=None when the checkpoint predates
    LR recording (or is weights-only)."""
    with open(path, "rb") as fp:
        payload = serialization.msgpack_restore(fp.read())
    payload = dict(payload)
    # kept out of the from_state_dict template so old checkpoints (no "lr"
    # key) restore unchanged
    lr = float(payload.pop("lr", -1.0))
    if not payload.get("opt_state"):
        # weights-only checkpoint (e.g. converted from a reference .pth):
        # keep the fresh optimizer state from the template
        payload["opt_state"] = serialization.to_state_dict(
            _to_host(state.opt_state))
    template = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": 0, "epoch": 0, "accuracy": -1.0,
    }
    restored = serialization.from_state_dict(template, payload)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
    )
    return (new_state, int(restored["epoch"]), float(restored["accuracy"]),
            lr if lr > 0 else None)


def load_torch_checkpoint(path: str, state):
    """Load a reference .pth (model weights only; the torch Adam state is not
    portable) -> (state, epoch, accuracy, lr). lr comes from the pickled
    optimizer param_groups when present (the reference restores it on resume,
    tools/base.py:114), else None."""
    from hupr_tpu.models.torch_convert import convert_torch_checkpoint
    ckpt = convert_torch_checkpoint(path)
    var = ckpt["variables"]
    new_state = state.replace(params=var["params"],
                              batch_stats=var["batch_stats"])
    acc = ckpt["accuracy"]
    return (new_state, ckpt["epoch"],
            float(acc) if acc is not None else -1.0, ckpt["lr"])


def find_checkpoint(log_dir: str, mode: str) -> Optional[str]:
    """Resolve 'model_best' / 'checkpoint' / 'checkpoint_N' to a file,
    preferring native .ckpt and falling back to reference .pth."""
    for ext in (".ckpt", ".pth"):
        p = os.path.join(log_dir, mode + ext)
        if os.path.exists(p):
            return p
    return None
