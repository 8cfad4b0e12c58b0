"""Residual conv blocks and activations shared by the encoder and decoder.

Parity: BasicBlock2D / BasicBlock3D (/root/reference/models/layers.py:8-70):
  out = act( [Conv-( BN)-act-Conv-(BN)](x) + [Conv3x3-(BN)](x) )
All call sites use kernel 3, stride 1, padding 1. Layout here is channels-last
(NHWC / NDHWC) — the native TPU conv layout — instead of torch NCHW.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hupr_tpu.models.init import torch_conv_kernel_init, uniform_init


class PReLU(nn.Module):
    """torch nn.PReLU(): one shared learnable slope, init 0.25."""
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("negative_slope",
                       lambda key, shape, dtype=jnp.float32: jnp.full(shape, self.init_value, dtype),
                       (1,))
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch semantics: normalization uses the biased
    batch variance, but the running-stats update uses the *unbiased* variance
    (torch _BatchNorm; flax nn.BatchNorm uses biased for both). momentum is
    torch-style: running = (1-m)*running + m*batch with m=0.1."""
    use_running_average: bool
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, row_mask=None):
        features = x.shape[-1]
        scale = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32),
                           (features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32),
                          (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            # Shifted one-pass moments: var = E[(x-c)^2] - E[x-c]^2 with a
            # per-channel shift c SAMPLED from the data (first row). Both
            # reductions read the activations once (multi-output fusion) —
            # unlike the two-pass E[(x-mean)^2], whose second traversal
            # cannot fuse with the first because it needs the finished mean
            # (measured ~8.5 ms/train step on v5e). Numerically safe where
            # the naive c=0 one-pass NaN'd (near-constant channels with
            # large means, f32 error ~ mean^2*2^-24 > var): with a sampled
            # shift the cancellation error is bounded by ~n*var*eps, i.e.
            # RELATIVE to the true variance. stop_gradient keeps the AD
            # gradients identical to the unshifted formulation. Under a
            # batch-sharded mesh row 0 lives on one device, so XLA inserts
            # a per-BN broadcast of a C-vector — bytes-trivial vs the
            # activation traversal it saves (and absent on one chip).
            c0 = jax.lax.stop_gradient(xf.reshape(-1, features)[0])
            xc = xf - c0
            if row_mask is None:
                n = np.prod([x.shape[a] for a in axes])
                s1 = jnp.mean(xc, axis=axes)
                s2 = jnp.mean(jnp.square(xc), axis=axes)
                bias_fix = n / max(n - 1, 1)
            else:
                # batch rows padded by parallel.shard_batch (mask 0) must not
                # leak into the batch statistics: the reference normalizes
                # over the true batch only (single-device torch BN). Row 0
                # is always a true row (padding repeats the LAST sample).
                w = row_mask.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1))
                inner = np.prod(x.shape[1:-1]) if x.ndim > 2 else 1
                n = jnp.sum(row_mask.astype(jnp.float32)) * inner
                s1 = jnp.sum(xc * w, axis=axes) / n
                s2 = jnp.sum(jnp.square(xc) * w, axis=axes) / n
                bias_fix = n / jnp.maximum(n - 1.0, 1.0)
            mean = c0 + s1
            var = jnp.maximum(s2 - jnp.square(s1), 0.0)
            if not self.is_initializing():
                unbiased = var * bias_fix
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var + self.epsilon).astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def conv(features: int, kernel, in_features: int, *, strides=None, padding=0,
         use_bias=True, name=None, dtype=None):
    """Convolution with exact torch-default weight/bias init."""
    kernel = tuple(kernel)
    fan_in = in_features * int(np.prod(kernel))
    bound = 1.0 / np.sqrt(fan_in)
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=strides or (1,) * len(kernel),
        padding=[(padding, padding)] * len(kernel),
        use_bias=use_bias,
        kernel_init=torch_conv_kernel_init,
        bias_init=uniform_init(bound),
        name=name,
        dtype=dtype,
    )


class BasicBlock(nn.Module):
    """Channels-last residual block; ndim selected by the input rank.

    `activation`: 'relu' (parameter-free) or 'prelu' (one learnable slope per
    activation instance, as in the reference where activation() is constructed
    separately inside `main` and for the output `relu`).
    """
    in_channels: int
    out_channels: int
    ndim: int
    batchnorm: bool = True
    activation: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, row_mask=None):
        k = (3,) * self.ndim
        # (no dtype knob: normalization precision follows x.dtype, with the
        # statistics always accumulated in f32 — see __call__)
        bn = partial(TorchBatchNorm, use_running_average=not train,
                     momentum=0.1, epsilon=1e-5)

        h = conv(self.out_channels, k, self.in_channels, padding=1,
                 use_bias=False, name="conv1", dtype=self.dtype)(x)
        if self.batchnorm:
            h = bn(name="bn1")(h, row_mask)
        if self.activation == "prelu":
            h = PReLU(name="act1")(h)
        else:
            h = nn.relu(h)
        h = conv(self.out_channels, k, self.out_channels, padding=1,
                 use_bias=False, name="conv2", dtype=self.dtype)(h)
        if self.batchnorm:
            h = bn(name="bn2")(h, row_mask)

        res = conv(self.out_channels, k, self.in_channels, padding=1,
                   use_bias=False, name="downsample", dtype=self.dtype)(x)
        if self.batchnorm:
            res = bn(name="bn_down")(res, row_mask)

        out = h + res
        if self.activation == "prelu":
            return PReLU(name="act_out")(out)
        return nn.relu(out)
