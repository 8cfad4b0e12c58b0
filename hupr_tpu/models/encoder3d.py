"""Encoder3D (parity: /root/reference/models/layers.py:186-217).

Three 3D-conv stages at (G=8, 64, 64) / (4, 32, 32) / (2, 16, 16) with
trilinear align-corners downsampling between stages, plus per-stage temporal
merge convs with kernel (T, 1, 1) that squeeze the time axis into 2D maps.
Layout: channels-last (B, D=frames, H, W, C).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hupr_tpu.models.blocks import BasicBlock, conv
from hupr_tpu.ops.resize import scale_by_factor


class Encoder3D(nn.Module):
    num_filters: int
    num_group_frames: int
    batchnorm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, row_mask=None):
        f, g = self.num_filters, self.num_group_frames
        bb = lambda cin, cout, name: BasicBlock(
            cin, cout, ndim=3, batchnorm=self.batchnorm, dtype=self.dtype, name=name)

        # layer1: Conv3d(F->2F, 3,1,1) + BasicBlock3D(2F->2F)
        l1 = conv(f * 2, (3, 3, 3), f, padding=1, name="layer1_conv",
                  dtype=self.dtype)(x)
        l1 = bb(f * 2, f * 2, "layer1_block")(l1, train, row_mask)

        # layer2: trilinear x0.5 downsample + 2 blocks to 4F
        l2 = scale_by_factor(l1, 0.5, axes=(1, 2, 3))
        l2 = bb(f * 2, f * 4, "layer2_block1")(l2, train, row_mask)
        l2 = bb(f * 4, f * 4, "layer2_block2")(l2, train, row_mask)

        # layer3: trilinear x0.5 downsample + 2 blocks to 8F
        l3 = scale_by_factor(l2, 0.5, axes=(1, 2, 3))
        l3 = bb(f * 4, f * 8, "layer3_block1")(l3, train, row_mask)
        l3 = bb(f * 8, f * 8, "layer3_block2")(l3, train, row_mask)

        # temporal merge: Conv3d kernel (T,1,1), no padding, bias-free ->
        # collapses the frame axis; squeeze to 2D (B, H, W, C)
        m1 = conv(f * 2, (g, 1, 1), f * 2, use_bias=False,
                  name="l1temporalMerge", dtype=self.dtype)(l1)[:, 0]
        m2 = conv(f * 4, (g // 2, 1, 1), f * 4, use_bias=False,
                  name="l2temporalMerge", dtype=self.dtype)(l2)[:, 0]
        m3 = conv(f * 8, (g // 4, 1, 1), f * 8, use_bias=False,
                  name="temporalMerge", dtype=self.dtype)(l3)[:, 0]
        return m1, m2, m3
