"""PRGCN pose-refinement GCN (parity: /root/reference/models/gcn_networks.py).

Heatmap logits (B, 64, 64, K) -> bilinear x0.5 -> node features (B, 1024, K)
-> 3 GCN layers out = W @ (x @ A) + b with ReLU between -> (B, 32, 32, K)
-> bilinear x2 -> sigmoid. The 14x14 skeleton adjacency is the hardcoded
constant from /root/reference/models/layers.py:97-111 (built there with
.cuda(); here a plain jnp constant).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from hupr_tpu.models.init import uniform_init
from hupr_tpu.ops.resize import scale_by_factor

# Skeleton adjacency over HuPR joint order (RHip, RKnee, RAnkle, LHip, LKnee,
# LAnkle, Neck, Head, LShoulder, LElbow, LWrist, RShoulder, RElbow, RWrist):
# self-loops plus kinematic edges.
_EDGES = [
    (0, 1), (1, 2),            # right leg
    (3, 4), (4, 5),            # left leg
    (0, 3),                    # hips
    (6, 7),                    # neck-head
    (8, 9), (9, 10),           # left arm
    (11, 12), (12, 13),        # right arm
]
# the reference matrix is asymmetric at the shoulder-neck joints: rows for
# L/R shoulder mark the neck column, but the neck row does not mark them
_DIRECTED = [(8, 6), (11, 6)]  # A[shoulder, neck] = 1, A[neck, shoulder] = 0


def skeleton_adjacency() -> np.ndarray:
    a = np.eye(14, dtype=np.float32)
    for i, j in _EDGES:
        a[i, j] = 1.0
        a[j, i] = 1.0
    for i, j in _DIRECTED:
        a[i, j] = 1.0
    return a


class GCNLayer(nn.Module):
    """out = W @ (x @ A) + b, uniform(+-1/sqrt(in_features)) init
    (reference gcn_networks.py:6-29). x: (B, P, K)."""
    features: int
    num_keypoints: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, adj):
        bound = 1.0 / np.sqrt(self.features)
        w = self.param("weight", uniform_init(bound),
                       (self.features, self.features))
        b = self.param("bias", uniform_init(bound),
                       (self.features, self.num_keypoints))
        support = jnp.einsum("bpm,mk->bpk", x, adj.astype(x.dtype))
        out = jnp.einsum("fp,bpk->bfk", w.astype(x.dtype), support)
        return out + b.astype(x.dtype)[None]


class PRGCN(nn.Module):
    heatmap_size: int
    num_keypoints: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, logits_hwk):
        # logits_hwk: (B, H, W, K)
        b = logits_hwk.shape[0]
        half = self.heatmap_size // 2
        feat = half * half
        adj = jnp.asarray(skeleton_adjacency())

        x = scale_by_factor(logits_hwk, 0.5, axes=(1, 2))      # (B, 32, 32, K)
        x = x.reshape(b, feat, self.num_keypoints)             # (B, P, K)
        x = nn.relu(GCNLayer(feat, self.num_keypoints, name="L1",
                             dtype=self.dtype)(x, adj))
        x = nn.relu(GCNLayer(feat, self.num_keypoints, name="L2",
                             dtype=self.dtype)(x, adj))
        x = GCNLayer(feat, self.num_keypoints, name="L3",
                     dtype=self.dtype)(x, adj)
        x = x.reshape(b, half, half, self.num_keypoints)
        x = scale_by_factor(x, 2.0, axes=(1, 2))               # (B, 64, 64, K)
        return nn.sigmoid(x)
