"""Pallas TPU kernel for the MSCSA spatial attention.

The op (reference layers.py:126-133, channels-last):
    logits[b,i,j] = sum_c k[b,i,c] * q[b,j,c]
    A = softmax(logits, axis=i)            # normalize over key positions
    out[b,j,c]  = sum_i m[b,i,c] * A[b,i,j]

The XLA path materializes the (N, N) attention matrix in HBM (N=4096 at the
finest scale -> 64 MB per image per attention, 12 attentions per forward);
this kernel keeps logits/softmax in VMEM per q-block and only ever writes the
(N, C) result. N <= 4096 and C <= 256, so full K/M panels fit in VMEM and no
online-softmax pass is needed.

Backward: a second Pallas kernel (custom VJP) that recomputes the
unnormalized softmax per q-block in VMEM and accumulates dk/dm across
q-blocks; the 1/s normalization is folded onto the small (qb, C) panels so
no extra full-(N, qb) pass is spent on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# MXU matmul count per kernel invocation, as multiples of one (N,N)x(N,C)
# product's 2*N*N*C flops: the forward runs kq^T + p^T m (2); the backward
# recomputes logits, then da, dq, dk, dm (5). The kernels' CostEstimates and
# the MFU accounting in bench.py both derive from these — XLA's compiled
# cost_analysis() does NOT see inside custom calls, so Pallas flops must be
# added to its total explicitly.
FWD_MATMULS = 2
BWD_MATMULS = 5


def attention_flops(b: int, n: int, c: int,
                    include_backward: bool = False) -> int:
    """FLOPs one fused spatial attention executes per step (fwd, or fwd+bwd
    when it runs under autodiff)."""
    factor = FWD_MATMULS + (BWD_MATMULS if include_backward else 0)
    return 2 * b * n * n * c * factor


def mscsa_attention_flops(batch: int, heatmap_size: int = 64,
                          num_filters: int = 32,
                          include_backward: bool = False) -> int:
    """Total Pallas-attention FLOPs of one HuPRNet forward (optionally
    fwd+bwd): 4 attentions at each of the MSCSA decoder's three scales —
    (H/4)^2 positions at 8F channels, (H/2)^2 at 4F, H^2 at 2F
    (models/mscsa.py). Used by bench.py to correct cost_analysis()-based
    MFU keys when MODEL.attention is pallas."""
    total = 0
    for div, cmul in ((4, 8), (2, 4), (1, 2)):
        n = (heatmap_size // div) ** 2
        total += 4 * attention_flops(batch, n, num_filters * cmul,
                                     include_backward)
    return total


def _make_attn_kernel(mxu_bf16: bool):
    def _attn_kernel(k_ref, q_ref, m_ref, o_ref):
        k = k_ref[0]                      # (N, C)
        q = q_ref[0]                      # (qb, C)
        m = m_ref[0]                      # (N, C)
        if mxu_bf16:
            # bf16 operands, f32 accumulation: ~4x MXU throughput; softmax
            # stays f32. Opt-in (bit-exactness vs the einsum path is relaxed).
            k, q, m = (x.astype(jnp.bfloat16) for x in (k, q, m))
        logits = jnp.dot(k, q.T, preferred_element_type=jnp.float32)  # (N, qb)
        # softmax over the key axis with the normalization folded past the
        # second matmul: dividing the (qb, C) epilogue instead of the (N, qb)
        # panel saves one full VPU pass over the N*qb panel per block.
        p = jnp.exp(logits - jnp.max(logits, axis=0, keepdims=True))
        s = jnp.sum(p, axis=0, keepdims=True)                         # (1, qb)
        if mxu_bf16:
            p = p.astype(jnp.bfloat16)
        num = jnp.dot(p.T, m, preferred_element_type=jnp.float32)     # (qb, C)
        o_ref[0] = (num / s.T).astype(o_ref.dtype)
    return _attn_kernel


def _attention_fwd_pallas(k, q, m, q_block: int, interpret: bool,
                          mxu_bf16: bool = False):
    b, n, c = k.shape
    grid = (b, pl.cdiv(n, q_block))
    return pl.pallas_call(
        _make_attn_kernel(mxu_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, c), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, c), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), m.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * n * c * FWD_MATMULS,
            bytes_accessed=(3 * b * n * c + b * n * c) * 4,
            transcendentals=b * n * n,
        ),
        # q_block=512 at N=4096 holds two (N, qb) f32 panels (logits + exp)
        # -> ~18 MB scoped VMEM, over the 16 MB default limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(k, q, m)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_spatial_attention(k, q, m, q_block: int = 256,
                            interpret: bool = False, mxu_bf16: bool = False):
    """k, q, m: (B, N, C) -> (B, N, C); softmax over the key axis of kᵀq."""
    return _attention_fwd_pallas(k, q, m, q_block, interpret, mxu_bf16)


def _fwd(k, q, m, q_block, interpret, mxu_bf16):
    out = _attention_fwd_pallas(k, q, m, q_block, interpret, mxu_bf16)
    return out, (k, q, m)


def _make_bwd_kernel(mxu_bf16: bool):
    """Backward kernel: per (batch, q-block) recompute the softmax column
    block in VMEM and accumulate dk/dm across q-blocks (their output block
    index is constant in qi, so Pallas keeps the accumulator resident)."""

    def kernel(k_ref, q_ref, m_ref, g_ref, dk_ref, dq_ref, dm_ref):
        qi = pl.program_id(1)
        k = k_ref[0]                       # (N, C)
        q = q_ref[0]                       # (qb, C)
        m = m_ref[0]                       # (N, C)
        g = g_ref[0]                       # (qb, C)
        if mxu_bf16:
            k, q, m, g = (x.astype(jnp.bfloat16) for x in (k, q, m, g))

        logits = jnp.dot(k, q.T, preferred_element_type=jnp.float32)  # (N, qb)
        # Unnormalized softmax: with a = p / s, every 1/s factor below folds
        # into a per-q-position column scale that rides on the SMALL (qb, C)
        # panels (q, g, and the dq epilogue) instead of full (N, qb) passes.
        p = jnp.exp(logits - jnp.max(logits, axis=0, keepdims=True))
        inv_s = 1.0 / jnp.sum(p, axis=0, keepdims=True)               # (1, qb)
        pm = p.astype(jnp.bfloat16) if mxu_bf16 else p

        # da[i,j] = sum_c m[i,c] g[j,c]
        da = jnp.dot(m, g.T, preferred_element_type=jnp.float32)      # (N, qb)
        # softmax bwd over the key axis (i): dl = a * (da - sum_i a*da)
        # = (p * (da - c)) / s  with  c = (sum_i p*da) / s
        c_ = jnp.sum(p * da, axis=0, keepdims=True) * inv_s           # (1, qb)
        t = p * (da - c_)                                             # (N, qb)
        tm = t.astype(jnp.bfloat16) if mxu_bf16 else t

        dq_ref[0] = (jnp.dot(tm.T, k, preferred_element_type=jnp.float32)
                     * inv_s.T).astype(dq_ref.dtype)                  # (qb, C)

        q_s = (q * inv_s.T.astype(q.dtype))                           # (qb, C)
        g_s = (g * inv_s.T.astype(g.dtype))
        dk_part = jnp.dot(tm, q_s, preferred_element_type=jnp.float32)
        dm_part = jnp.dot(pm, g_s, preferred_element_type=jnp.float32)

        @pl.when(qi == 0)
        def _():
            dk_ref[0] = dk_part.astype(dk_ref.dtype)
            dm_ref[0] = dm_part.astype(dm_ref.dtype)

        @pl.when(qi != 0)
        def _():
            dk_ref[0] = dk_ref[0] + dk_part.astype(dk_ref.dtype)
            dm_ref[0] = dm_ref[0] + dm_part.astype(dm_ref.dtype)

    return kernel


def _attention_bwd_pallas(k, q, m, g, q_block: int, interpret: bool,
                          mxu_bf16: bool):
    b, n, c = k.shape
    grid = (b, pl.cdiv(n, q_block))
    panel = lambda: pl.BlockSpec((1, n, c), lambda bi, qi: (bi, 0, 0),
                                 memory_space=pltpu.VMEM)
    qpanel = lambda: pl.BlockSpec((1, q_block, c), lambda bi, qi: (bi, qi, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_bwd_kernel(mxu_bf16),
        grid=grid,
        in_specs=[panel(), qpanel(), panel(), qpanel()],
        out_specs=(panel(), qpanel(), panel()),
        # dk/dm accumulate across the qi grid dimension in the output ref:
        # keep them f32 regardless of input dtype so bf16 inputs don't take
        # an N/q_block-long chain of bf16 round-offs (the XLA einsum path
        # accumulates grads in f32 and casts once); _bwd casts at the end.
        out_shape=(jax.ShapeDtypeStruct((b, n, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, c), q.dtype),
                   jax.ShapeDtypeStruct((b, n, c), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * n * c * BWD_MATMULS,
            bytes_accessed=7 * b * n * c * 4,
            transcendentals=b * n * n,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(k, q, m, g)


def _bwd(q_block, interpret, mxu_bf16, res, g):
    k, q, m = res
    # qb=512 at N=4096 holds four (N, qb) f32 panels (logits/p/da/t) ~32 MB,
    # inside the 64 MB limit; swept on v5e: qb 128 -> 11.8 ms/op,
    # 256 -> 8.7, 512 -> 7.9 (scripts/attn_microbench.py BWD=1).
    # Clamp: qb=1024 at N=4096 would put the four panels alone at the 64 MB
    # vmem_limit before inputs/accumulators.
    dk, dq, dm = _attention_bwd_pallas(k, q, m, g, min(q_block, 512),
                                       interpret, mxu_bf16)
    return dk.astype(k.dtype), dq, dm.astype(m.dtype)


fused_spatial_attention.defvjp(_fwd, _bwd)


def spatial_attention_pallas(k, q, m, interpret: bool = False,
                             mxu_bf16: bool = False):
    """(B, H, W, C) convenience wrapper matching models.mscsa.spatial_attention."""
    b, h, w, c = m.shape
    n = h * w
    # swept on v5e at the flagship N=4096/C=64 shape (scripts/attn_microbench):
    # qb 256 -> 6.6 ms/op, qb 512+ -> ~5.2 ms/op plateau
    q_block = min(512, n)
    out = fused_spatial_attention(
        k.reshape(b, n, c), q.reshape(b, n, c), m.reshape(b, n, c),
        q_block, interpret, mxu_bf16)
    return out.reshape(b, h, w, c)
