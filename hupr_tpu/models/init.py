"""Parameter initializers reproducing torch defaults, so training from scratch
matches the reference's initialization distributions.

torch nn.ConvNd / nn.Linear default: kaiming_uniform(a=sqrt(5)) on the weight,
which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias is
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with the same fan_in.
"""

from __future__ import annotations

import numpy as np
import jax


def torch_conv_kernel_init(key, shape, dtype):
    """Flax conv kernels are (*spatial, in, out); fan_in = prod(shape[:-1])."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_init(bound: float):
    def init(key, shape, dtype=np.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
