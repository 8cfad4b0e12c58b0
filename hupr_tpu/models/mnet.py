"""MNet chirp encoder (parity: /root/reference/models/chirp_networks.py:11-21).

Conv3d(in=2 -> F, kernel (2,1,1), stride (2,1,1)) over the chirp axis followed
by a full-width temporal max-pool, collapsing the chirp dimension to 1.
Layout: channels-last (B*, D=chirps, R, A, C=2).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hupr_tpu.models.blocks import conv


class MNet(nn.Module):
    out_channels: int
    num_frames: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        # x: (B*, numFrames, R, A, 2)
        h = conv(self.out_channels, (2, 1, 1), 2, strides=(2, 1, 1),
                 name="temporalConv", dtype=self.dtype)(x)   # (B*, F/2, R, A, C)
        # MaxPool3d((numFrames/2,1,1)) with equal stride -> one output step
        return jnp.max(h, axis=1)                            # (B*, R, A, C)
