"""Is XLA's native 3D convolution at the dominant Encoder3D stage-1 shape
beatable by a reformulation? Times, at (B=32, T=8, 64, 64, Cin=64) -> Cout=64
with a 3x3x3 SAME kernel (the top op of both the serving and train profiles):

  native    lax.conv_general_dilated NDHWC (what the model runs)
  shift     27 shifted-slice matmuls accumulated (K=Cin per tap)
  im2col    explicit patch extraction + one (27*Cin) GEMM

Rationale: profile shows ~2.4 ms/conv vs a ~1.2 ms naive bf16-MXU bound; the
gap is K=Cin=64 contraction depth (half the 128-wide MXU). If neither
reformulation wins here, XLA is at the practical ceiling and a custom Pallas
conv is not worth the complexity.

Usage: python scripts/conv_microbench.py [B T H C inner reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    c = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    inner = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    reps = int(sys.argv[6]) if len(sys.argv) > 6 else 3

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((b, t, h, h, c)).astype(np.float32))
    w = jax.device_put(
        (rng.standard_normal((3, 3, 3, c, c)) * 0.05).astype(np.float32))

    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def native(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=dn)

    def shift(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((b, t, h, h, c), jnp.float32)
        for dt in range(3):
            for dy in range(3):
                for dx in range(3):
                    sl = xp[:, dt:dt + t, dy:dy + h, dx:dx + h, :]
                    acc = acc + jnp.einsum(
                        "bthwc,cd->bthwd", sl, w[dt, dy, dx],
                        preferred_element_type=jnp.float32)
        return acc

    def im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate([
            xp[:, dt:dt + t, dy:dy + h, dx:dx + h, :]
            for dt in range(3) for dy in range(3) for dx in range(3)],
            axis=-1)                                     # (B,T,H,W,27C)
        return jnp.einsum("bthwk,kd->bthwd", cols, w.reshape(27 * c, c),
                          preferred_element_type=jnp.float32)

    def chain(op):
        @jax.jit
        def f(x, w):
            def body(i, xx):
                return op(xx, w)
            out = jax.lax.fori_loop(0, inner, body, x)
            return jnp.sum(out[0, 0, 0])
        return f

    def timeit(f):
        float(jax.device_get(f(x, w)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jax.device_get(f(x, w)))
            best = min(best, time.perf_counter() - t0)
        return best / inner * 1000.0

    ref = None
    for name, op in (("native", native), ("shift", shift), ("im2col", im2col)):
        out = jax.jit(op)(x, w)
        if ref is None:
            ref = np.asarray(out)
        else:
            err = float(np.max(np.abs(np.asarray(out) - ref)))
            assert err < 1e-2, f"{name} diverges: {err}"
        print(f"{name:8s} {timeit(chain(op)):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
