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


def test_pallas_attention_bf16_grads_accumulate_in_f32():
    """bf16 inputs (cfg.MODEL.computeDtype='bfloat16'): the dk/dm cross-block
    accumulation must run in f32 — one bf16 rounding at the end, not one per
    q-block. q_block=64 at N=1024 gives a 16-step accumulation chain; per-
    block bf16 rounding would drift well past one-ulp agreement with the
    f32-computed reference gradients."""
    from hupr_tpu.ops.attention import fused_spatial_attention

    b, n, c = 1, 1024, 16
    rng = np.random.default_rng(3)
    mk = lambda: jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    kf, qf, mf = mk(), mk(), mk()
    kb, qb, mb = (x.astype(jnp.bfloat16) for x in (kf, qf, mf))

    def loss_f32(k, q, m):
        # f32 reference on the bf16 values: the ideal (exactly-accumulated)
        # gradients for the same inputs
        return jnp.sum(fused_spatial_attention(
            k, q, m, 1024, True, False) ** 2)

    def loss_bf16(k, q, m):
        return jnp.sum(fused_spatial_attention(
            k, q, m, 64, True, False).astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss_f32, argnums=(0, 2))(
        kb.astype(jnp.float32), qb.astype(jnp.float32), mb.astype(jnp.float32))
    g_pal = jax.grad(loss_bf16, argnums=(0, 2))(kb, qb, mb)
    for name, a, g in zip("km", g_ref, g_pal):
        assert np.asarray(g).dtype == jnp.bfloat16  # caller-facing dtype kept
        a = np.asarray(a, dtype=np.float32)
        g = np.asarray(g, dtype=np.float32)
        # f32 accumulation: aggregate drift stays at the single-rounding
        # scale (~2^-9); a 16-step bf16 accumulator chain lands ~4-8x higher
        rel = np.linalg.norm(a - g) / np.linalg.norm(a)
        assert rel < 2.0 ** -8.5, (
            f"grad d{name} rel error {rel:.2e} exceeds bf16 single-rounding")

    # pin the mechanism too: the raw kernel's dk/dm accumulators are f32
    from hupr_tpu.ops.attention import _attention_bwd_pallas
    dk, dq, dm = _attention_bwd_pallas(kb, qb, mb, mb, 64, True, False)
    assert dk.dtype == jnp.float32 and dm.dtype == jnp.float32


def test_mscsa_attention_flops_accounting():
    """bench.py adds these by hand to cost_analysis() (custom calls report
    zero flops); pin the derivation so the MFU key can't silently drift from
    the decoder geometry (models/mscsa.py: 4 attentions per scale at
    N=256/1024/4096, C=8F/4F/2F)."""
    from hupr_tpu.ops.attention import (attention_flops,
                                        mscsa_attention_flops)

    # one attention = kq^T (N,C)x(C,N) + p^T m (N,N)x(N,C): 2 matmuls fwd
    assert attention_flops(2, 256, 64) == 2 * 2 * 256 * 256 * 64 * 2
    # backward recomputes logits and forms da/dq/dk/dm: 5 more
    assert attention_flops(1, 16, 8, include_backward=True) == \
        2 * 16 * 16 * 8 * 7

    b, f = 20, 32
    expected = 0
    for n, c in ((16 * 16, 8 * f), (32 * 32, 4 * f), (64 * 64, 2 * f)):
        expected += 4 * 2 * b * n * n * c * 2
    assert mscsa_attention_flops(b) == expected
    assert mscsa_attention_flops(b, include_backward=True) == \
        expected * 7 // 2
