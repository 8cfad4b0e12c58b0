"""HuPRNet top-level model (parity: /root/reference/models/networks.py:7-41).

Input (matching the reference tensor contract exactly):
  VRDAEmaps_hori, VRDAEmaps_vert: (B, G=8, C=8, 2, R=64, A=64, E=8) float
Output:
  heatmap     (B, K, 1, 64, 64)  — sigmoid of decoder logits
  gcn_heatmap (B, 1, K, 64, 64)  — PRGCN-refined heatmap

The reference's `view(B*G, -1, numFrames, R, A)` at networks.py:29-31
reinterprets the contiguous (chirp, real/imag) axes: MNet's two input
"channels" are the first/second half of the chirp-real/imag sequence and its
temporal axis alternates real, imag. That memory reinterpretation is
reproduced here with explicit reshapes so checkpoints and training dynamics
match; internally everything runs channels-last.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hupr_tpu.models.encoder3d import Encoder3D
from hupr_tpu.models.mnet import MNet
from hupr_tpu.models.mscsa import MSCSADecoder


class HuPRNet(nn.Module):
    num_filters: int = 32
    num_frames: int = 8
    num_group_frames: int = 8
    num_keypoints: int = 14
    heatmap_size: int = 64
    dtype: jnp.dtype | None = None
    attn_impl: str = "xla"

    def _chirp_view(self, v):
        """(B, G, C, 2, R, A) -> (B*G, numFrames, R, A, 2) replicating the
        reference's view-based (chirp, iq) -> (2, numFrames) reinterpretation."""
        b, g, c, two, r, a = v.shape
        v = v.reshape(b * g, c * two, r, a)             # t = 2*chirp + iq
        v = v.reshape(b * g, 2, self.num_frames, r, a)  # (x, f): t = 8x + f
        return jnp.transpose(v, (0, 2, 3, 4, 1))        # (B*G, f, R, A, x)

    @nn.compact
    def __call__(self, vrdae_hori, vrdae_vert, train: bool = False):
        b, g = vrdae_hori.shape[0], vrdae_hori.shape[1]
        f = self.num_filters

        # shrink the elevation axis (networks.py:26-27)
        hori = jnp.mean(vrdae_hori, axis=6)
        vert = jnp.mean(vrdae_vert, axis=6)

        # chirp encoders (one per radar view)
        ra = MNet(f, self.num_frames, name="RAchirpNet",
                  dtype=self.dtype)(self._chirp_view(hori))
        re = MNet(f, self.num_frames, name="REchirpNet",
                  dtype=self.dtype)(self._chirp_view(vert))
        r, a = ra.shape[1], ra.shape[2]
        ra = ra.reshape(b, g, r, a, f)                  # (B, G, R, A, F)
        re = re.reshape(b, g, r, a, f)

        # 3D encoders (range-azimuth / range-elevation)
        ra_l1, ra_l2, ra_l3 = Encoder3D(f, self.num_group_frames,
                                        name="RAradarEncoder",
                                        dtype=self.dtype)(ra, train)
        re_l1, re_l2, re_l3 = Encoder3D(f, self.num_group_frames,
                                        name="REradarEncoder",
                                        dtype=self.dtype)(re, train)

        # shared multi-scale attention decoder + GCN refinement
        logits, gcn = MSCSADecoder(f, self.num_keypoints, self.heatmap_size,
                                   name="radarDecoder", dtype=self.dtype,
                                   attn_impl=self.attn_impl)(
            ra_l1, ra_l2, ra_l3, re_l1, re_l2, re_l3, train)

        # reference output contract: (B, K, 1, H, W) and (B, 1, K, H, W)
        heatmap = nn.sigmoid(logits)                    # (B, H, W, K)
        heatmap = jnp.transpose(heatmap, (0, 3, 1, 2))[:, :, None]
        gcn = jnp.transpose(gcn, (0, 3, 1, 2))[:, None]
        return heatmap, gcn


def build_model(cfg, train_dtype=None) -> HuPRNet:
    """Construct HuPRNet from a hupr_tpu.config.Config."""
    dtype = train_dtype
    if dtype is None:
        dtype = {"float32": None, "bfloat16": jnp.bfloat16}[cfg.MODEL.computeDtype]
    return HuPRNet(
        num_filters=cfg.MODEL.numFilters,
        num_frames=cfg.DATASET.numFrames,
        num_group_frames=cfg.DATASET.numGroupFrames,
        num_keypoints=cfg.DATASET.numKeypoints,
        heatmap_size=cfg.DATASET.heatmapSize,
        dtype=dtype,
        attn_impl=getattr(cfg.MODEL, "attention", "xla"),
    )
