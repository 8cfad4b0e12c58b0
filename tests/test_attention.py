"""Pallas fused attention vs the einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hupr_tpu.models.mscsa import spatial_attention
from hupr_tpu.ops.attention import spatial_attention_pallas


def _inputs(b=2, h=16, w=16, c=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, w, c)).astype(np.float32))
    return mk(), mk(), mk()


def test_pallas_attention_matches_einsum():
    k, q, m = _inputs()
    want = spatial_attention(k, q, m)
    got = spatial_attention_pallas(k, q, m, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pallas_attention_nonsquare_blocks():
    # N=1024 with q_block 256 exercises the grid loop
    k, q, m = _inputs(b=1, h=32, w=32, c=32, seed=1)
    want = spatial_attention(k, q, m)
    got = spatial_attention_pallas(k, q, m, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pallas_attention_gradients_match():
    k, q, m = _inputs(b=1, h=8, w=8, c=16, seed=2)

    def loss_ref(k, q, m):
        return jnp.sum(spatial_attention(k, q, m) ** 2)

    def loss_pallas(k, q, m):
        return jnp.sum(spatial_attention_pallas(k, q, m, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(k, q, m)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(k, q, m)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-4)
