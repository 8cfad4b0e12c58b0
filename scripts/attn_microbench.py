"""Microbenchmark the MSCSA spatial-attention op variants on the TPU.

Times the forward op at the flagship serving shape (B=32 frame windows,
N=64*64 positions, C=64 channels — the finest decoder scale, ~20% of the
serving program; DEVNOTES round-2 profile).  To defeat tunnel/dispatch
overhead, each measurement jits a CHAIN of `inner` dependent applications
(output feeds the next call's m input) and fetches one scalar at the end;
per-op time = total / inner.

Variants: XLA einsum; Pallas with softmax-in-panel (round-1 kernel) vs
normalization folded into the (qb, C) epilogue; f32 vs bf16 MXU; q_block.

Usage:  python scripts/attn_microbench.py  [B N C inner reps]
(One TPU tunnel client at a time — don't run concurrently with bench.py.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    inner = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    from hupr_tpu.models.mscsa import spatial_attention

    rng = np.random.default_rng(0)
    k = jax.device_put(rng.standard_normal((b, n, c)).astype(np.float32))
    q = jax.device_put(rng.standard_normal((b, n, c)).astype(np.float32))
    m = jax.device_put(rng.standard_normal((b, n, c)).astype(np.float32))

    def make_pallas(q_block, mxu_bf16, fold):
        if fold:
            # the production kernel (folded epilogue) — import, don't copy,
            # so the sweep always measures what ships
            from hupr_tpu.ops.attention import _attention_fwd_pallas
            return lambda k, q, m: _attention_fwd_pallas(
                k, q, m, q_block, False, mxu_bf16)

        # fold=False baseline: the round-1 kernel body (softmax normalized
        # in the (N, qb) panel), kept local for A/B comparison only
        def kernel(k_ref, q_ref, m_ref, o_ref):
            kk = k_ref[0]
            qq = q_ref[0]
            mm = m_ref[0]
            if mxu_bf16:
                kk, qq, mm = (x.astype(jnp.bfloat16) for x in (kk, qq, mm))
            logits = jnp.dot(kk, qq.T, preferred_element_type=jnp.float32)
            a = jax.nn.softmax(logits, axis=0)
            if mxu_bf16:
                a = a.astype(jnp.bfloat16)
            o_ref[0] = jnp.dot(
                a.T, mm, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)

        def op(k, q, m):
            grid = (b, pl.cdiv(n, q_block))
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, n, c), lambda bi, qi: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, q_block, c), lambda bi, qi: (bi, qi, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n, c), lambda bi, qi: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, q_block, c),
                                       lambda bi, qi: (bi, qi, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, n, c), m.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(k, q, m)

        return op

    def chain(op):
        @jax.jit
        def f(k, q, m):
            def body(i, mm):
                return op(k, q, mm)
            out = jax.lax.fori_loop(0, inner, body, m)
            return jnp.sum(out[0, 0])
        return f

    def timeit(f):
        float(jax.device_get(f(k, q, m)))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jax.device_get(f(k, q, m)))
            best = min(best, time.perf_counter() - t0)
        return best / inner * 1000.0

    h = int(np.sqrt(n))
    if h * h == n:
        ein = chain(lambda K, Q, M: spatial_attention(
            K.reshape(b, h, h, c), Q.reshape(b, h, h, c),
            M.reshape(b, h, h, c)).reshape(b, n, c))
        print(f"xla_einsum                     {timeit(ein):8.3f} ms")
    else:
        print("xla_einsum                      skipped (N not square)")

    qbs = tuple(int(x) for x in
                os.environ.get("QBS", "128,256,512").split(","))
    if os.environ.get("FWD", "1") != "0":
        for qb in qbs:
            if qb > n:
                continue
            for fold in (False, True):
                for bf16 in (False, True):
                    f = chain(make_pallas(qb, bf16, fold))
                    tag = f"pallas qb={qb} fold={int(fold)} bf16={int(bf16)}"
                    print(f"{tag:31s}{timeit(f):8.3f} ms", flush=True)

    # ---- backward kernel: chain dm -> g through the production bwd pallas
    if os.environ.get("BWD", "0") != "0":
        from hupr_tpu.ops.attention import _attention_bwd_pallas

        def chain_bwd(qb, bf16):
            @jax.jit
            def f(k, q, m):
                def body(i, g):
                    dk, dq, dm = _attention_bwd_pallas(k, q, m, g, qb,
                                                       False, bf16)
                    return dm
                out = jax.lax.fori_loop(0, inner, body, m)
                return jnp.sum(out[0, 0])
            return f

        for qb in qbs:
            if qb > n:
                continue
            for bf16 in (False, True):
                tag = f"bwd qb={qb} bf16={int(bf16)}"
                print(f"{tag:31s}{timeit(chain_bwd(qb, bf16)):8.3f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
