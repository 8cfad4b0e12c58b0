"""Synthetic HuPRNet variables built host-side (no on-device init forward).

model.init over the dev tunnel takes ~2 min (DEVNOTES); benches, the driver
entry, and numerics tests that only need *a* plausible parameter tree build
it from jax.eval_shape + NumPy instead. One subtlety this helper exists to
enforce: BatchNorm running variances must be POSITIVE — a plain
standard-normal draw over every leaf makes half of them negative, and
rsqrt(var + eps) then silently poisons the whole forward with NaNs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_variables(model, example_shape, seed: int = 0,
                        scale: float = 0.05):
    """Random variables with model.init's exact tree/shapes/dtypes, built
    with NumPy on the host. `example_shape` is the (B, G, C, 2, R, A, E)
    input shape of one view. Running variances are drawn positive
    (|x| + 1.0); everything else is N(0, scale)."""
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros(example_shape, jnp.float32),
        jnp.zeros(example_shape, jnp.float32)))
    rng = np.random.default_rng(seed)

    def make(path, leaf):
        x = rng.standard_normal(leaf.shape).astype(np.float32) * scale
        last = path[-1]
        if getattr(last, "key", None) == "var":
            x = np.abs(x) + 1.0
        return jnp.asarray(x)

    return jax.tree_util.tree_map_with_path(make, shapes)
