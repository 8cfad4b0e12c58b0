"""Multi-scale cross/self attention decoder with PRGCN head.

Parity: MultiScaleCrossSelfAttentionPRGCN (/root/reference/models/layers.py:
72-184). At each of three scales (16², 32², 64²), eight 1x1 conv projections
feed four spatial attentions — hori-cross, hori-self, vert-cross, vert-self —
whose outputs are concatenated (plus the upsampled coarser-scale maps) into a
two-block decoder stage. The final 1x1 conv emits 14 keypoint logits which the
PRGCN refines.

Attention math (reference `attention`, layers.py:126-133): with k, q, m of
shape (B, N, C) channels-last, A[b,i,j] = Σ_c k[b,i,c] q[b,j,c], softmax over
i (key positions), out[b,j,c] = Σ_i m[b,i,c] softmax(A)[b,i,j] — two batched
matmuls that map straight onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hupr_tpu.models.blocks import BasicBlock, conv
from hupr_tpu.models.prgcn import PRGCN
from hupr_tpu.ops.resize import scale_by_factor


def spatial_attention(k, q, m, dtype=None):
    """k, q, m: (B, H, W, C) -> attended maps (B, H, W, C)."""
    b, h, w, c = m.shape
    kf = k.reshape(b, h * w, c)
    qf = q.reshape(b, h * w, c)
    mf = m.reshape(b, h * w, c)
    if dtype is not None:
        kf, qf, mf = kf.astype(dtype), qf.astype(dtype), mf.astype(dtype)
    attn = jnp.einsum("bic,bjc->bij", kf, qf,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=1)
    if dtype is not None:
        attn = attn.astype(dtype)
    out = jnp.einsum("bic,bij->bjc", mf, attn,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, w, c).astype(m.dtype)


class MSCSADecoder(nn.Module):
    num_filters: int
    num_keypoints: int
    heatmap_size: int
    batchnorm: bool = False       # reference passes batchnorm=False
    activation: str = "prelu"     # reference passes nn.PReLU
    dtype: jnp.dtype | None = None
    attn_impl: str = "xla"        # "xla" einsum | "pallas" fused VMEM kernel

    def _attention(self, k, q, m):
        if self.attn_impl in ("pallas", "pallas_bf16"):
            from hupr_tpu.ops.attention import spatial_attention_pallas
            return spatial_attention_pallas(
                k, q, m, mxu_bf16=(self.attn_impl == "pallas_bf16"))
        return spatial_attention(k, q, m, self.dtype)

    def _proj(self, name, scale_idx, channels):
        """One of the 8 per-scale 1x1 bias-free projections."""
        return conv(channels, (1, 1), channels, use_bias=False,
                    name=f"{name}_{scale_idx}", dtype=self.dtype)

    def _attend_scale(self, idx, ra, re):
        """Four attentions at one scale -> (ra_cross, ra_self, re_cross, re_self)."""
        c = ra.shape[-1]
        k_c_h = self._proj("phi_cross_hori", idx, c)(ra)
        q_c_v = self._proj("theta_cross_vert", idx, c)(re)
        k_c_v = self._proj("phi_cross_vert", idx, c)(re)
        q_c_h = self._proj("theta_cross_hori", idx, c)(ra)
        k_s_h = self._proj("phi_self_hori", idx, c)(ra)
        q_s_h = self._proj("theta_self_hori", idx, c)(ra)
        k_s_v = self._proj("phi_self_vert", idx, c)(re)
        q_s_v = self._proj("theta_self_vert", idx, c)(re)
        ra_cross = self._attention(k_c_h, q_c_v, ra) + ra
        ra_self = self._attention(k_s_h, q_s_h, ra)
        re_cross = self._attention(k_c_v, q_c_h, re) + re
        re_self = self._attention(k_s_v, q_s_v, re)
        return ra_cross, ra_self, re_cross, re_self

    @nn.compact
    def __call__(self, ra_l1, ra_l2, ra_l3, re_l1, re_l2, re_l3,
                 train: bool = False):
        f = self.num_filters
        bb = lambda cin, cout, name: BasicBlock(
            cin, cout, ndim=2, batchnorm=self.batchnorm,
            activation=self.activation, dtype=self.dtype, name=name)

        # scale 16x16 (channels 8F): 4 attentions, concat, decode, upsample x2
        a3 = self._attend_scale(0, ra_l3, re_l3)
        maps = jnp.concatenate(a3, axis=-1)                       # (B,16,16,32F)
        maps = bb(f * 8 * 4, f * 8, "decoder3_block1")(maps, train)
        maps = bb(f * 8, f * 4, "decoder3_block2")(maps, train)
        maps = scale_by_factor(maps, 2.0, axes=(1, 2))            # (B,32,32,4F)

        # scale 32x32 (channels 4F): concat coarser maps + 4 attentions
        a2 = self._attend_scale(1, ra_l2, re_l2)
        maps = jnp.concatenate((maps,) + a2, axis=-1)             # (B,32,32,20F)
        maps = bb(f * 4 * 5, f * 4, "decoder2_block1")(maps, train)
        maps = bb(f * 4, f * 2, "decoder2_block2")(maps, train)
        maps = scale_by_factor(maps, 2.0, axes=(1, 2))            # (B,64,64,2F)

        # scale 64x64 (channels 2F)
        a1 = self._attend_scale(2, ra_l1, re_l1)
        maps = jnp.concatenate((maps,) + a1, axis=-1)             # (B,64,64,10F)
        maps = bb(f * 2 * 5, f * 2, "decoder1_block1")(maps, train)
        maps = bb(f * 2, f, "decoder1_block2")(maps, train)
        logits = conv(self.num_keypoints, (1, 1), f, use_bias=False,
                      name="decoder1_out", dtype=self.dtype)(maps)  # (B,64,64,K)

        gcn_heatmap = PRGCN(self.heatmap_size, self.num_keypoints,
                            name="gcn", dtype=self.dtype)(logits)
        return logits, gcn_heatmap
