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

The forward is split into `chirp_maps` (per-frame MNet encoding — reference
forward_chirp) and `pose_from_maps` (3D encoders + decoder) so serving
pipelines can encode each distinct frame once and window the 32-channel maps
instead of raw cubes (see hupr_tpu.engine.pipeline).
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
    remat: bool = False   # rematerialize encoder activations (memory vs FLOPs)

    def setup(self):
        f = self.num_filters
        enc = nn.remat(Encoder3D, static_argnums=(2,)) if self.remat \
            else Encoder3D
        self.RAchirpNet = MNet(f, self.num_frames, dtype=self.dtype)
        self.REchirpNet = MNet(f, self.num_frames, dtype=self.dtype)
        self.RAradarEncoder = enc(f, self.num_group_frames, dtype=self.dtype)
        self.REradarEncoder = enc(f, self.num_group_frames, dtype=self.dtype)
        self.radarDecoder = MSCSADecoder(f, self.num_keypoints,
                                         self.heatmap_size, dtype=self.dtype,
                                         attn_impl=self.attn_impl)

    def _chirp_view(self, v):
        """(B, G, C, 2, R, A) -> (B*G, numFrames, R, A, 2) replicating the
        reference's view-based (chirp, iq) -> (2, numFrames) reinterpretation."""
        b, g, c, two, r, a = v.shape
        v = v.reshape(b * g, c * two, r, a)             # t = 2*chirp + iq
        v = v.reshape(b * g, 2, self.num_frames, r, a)  # (x, f): t = 8x + f
        return jnp.transpose(v, (0, 2, 3, 4, 1))        # (B*G, f, R, A, x)

    def chirp_maps(self, vrdae_hori, vrdae_vert):
        """(B, G, C, 2, R, A, E) x2 -> per-frame chirp-encoded maps
        (B, G, R, A, F) x2 (reference forward_chirp, networks.py:23-33).
        Depends only on individual frames, so serving pipelines may run it
        with G=1 per distinct frame and window the outputs."""
        b, g = vrdae_hori.shape[0], vrdae_hori.shape[1]
        f = self.num_filters

        # shrink the elevation axis (networks.py:26-27)
        hori = jnp.mean(vrdae_hori, axis=6)
        vert = jnp.mean(vrdae_vert, axis=6)

        ra = self.RAchirpNet(self._chirp_view(hori))
        re = self.REchirpNet(self._chirp_view(vert))
        r, a = ra.shape[1], ra.shape[2]
        return ra.reshape(b, g, r, a, f), re.reshape(b, g, r, a, f)

    def pose_from_maps(self, ra, re, train: bool = False, row_mask=None):
        """(B, G, R, A, F) chirp maps x2 -> (heatmap, gcn_heatmap).

        `row_mask` (B,) marks rows padded by parallel.shard_batch with 0 so
        train-mode BatchNorm statistics cover only real samples."""
        ra_l1, ra_l2, ra_l3 = self.RAradarEncoder(ra, train, row_mask)
        re_l1, re_l2, re_l3 = self.REradarEncoder(re, train, row_mask)
        logits, gcn = self.radarDecoder(ra_l1, ra_l2, ra_l3,
                                        re_l1, re_l2, re_l3, train)

        # reference output contract: (B, K, 1, H, W) and (B, 1, K, H, W).
        # The model boundary is f32 regardless of MODEL.computeDtype: the
        # BCE loss + its custom VJP (ops/heatmap.py) run reference f32
        # numerics, and a bf16 logit would crash grad with a cotangent
        # dtype mismatch in sigmoid's backward.
        logits = logits.astype(jnp.float32)
        gcn = gcn.astype(jnp.float32)
        heatmap = nn.sigmoid(logits)                    # (B, H, W, K)
        heatmap = jnp.transpose(heatmap, (0, 3, 1, 2))[:, :, None]
        gcn = jnp.transpose(gcn, (0, 3, 1, 2))[:, None]
        return heatmap, gcn

    def __call__(self, vrdae_hori, vrdae_vert, train: bool = False,
                 row_mask=None):
        ra, re = self.chirp_maps(vrdae_hori, vrdae_vert)
        return self.pose_from_maps(ra, re, train, row_mask)


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
        remat=getattr(cfg.MODEL, "remat", False),
    )
