"""Streaming (per-frame, latency-oriented) pose estimation.

The batch pipeline (engine/pipeline.py) maximizes throughput over frame
stacks; this module serves one frame at a time with the same semantics: a
rolling window of the last G per-frame chirp-encoded maps feeds the pose
decoder, replicate-padding at the start of a sequence exactly like the
reference's boundary clamp (datasets/dataset.py:126-138). Lookahead caveat:
the offline window is centered (G/2-1 future frames); a causal stream cannot
see the future, so predictions correspond to the frame G/2-1 steps back —
`latency_frames` documents that.

Everything stays on device between frames; per-frame host work is one
raw-ADC transfer (int16 I/Q planes pass through at native width and are cast
on device), ONE fused jitted dispatch (encode + window shift + decode in a
single XLA program), and ONE packed (K, 3) result fetch — pred2d and maxvals
together, since a high-RTT link pays per fetch. bench.py reports the
steady-state per-frame latency as stream_latency_ms.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hupr_tpu.ops.dsp import RadarParams, radar_cube_single_frame
from hupr_tpu.ops.heatmap import get_max_preds
from hupr_tpu.engine.pipeline import cube_chirp_input


class StreamingPoseEstimator:
    def __init__(self, model, variables, params: RadarParams = RadarParams(),
                 group: int = 8, num_frames: int = 8):
        self.model = model
        self.variables = variables
        self.params = params
        self.group = group
        self._maps: Optional[tuple] = None   # rolling (G, R, A, F) per view
        self._count = 0

        def encode(hori_re, hori_im, vert_re, vert_im):
            def cube(re, im):
                # int16 I/Q planes (native ADC format) cast on device
                re = re.astype(jnp.float32)
                im = im.astype(jnp.float32)
                c = radar_cube_single_frame(re + 1j * im, params)
                return jnp.real(c)[None], jnp.imag(c)[None]

            hr, hi = cube(hori_re, hori_im)
            vr, vi = cube(vert_re, vert_im)
            hori = cube_chirp_input(hr, hi, num_frames)
            vert = cube_chirp_input(vr, vi, num_frames)
            ra, re = model.apply(variables, hori, vert, method="chirp_maps")
            return ra[0, 0], re[0, 0]                  # (R, A, F) each

        def push(maps, new):
            return jnp.concatenate([maps[1:], new[None]], axis=0)

        def decode(ra_window, re_window):
            hm, gcn = model.apply(variables, ra_window[None], re_window[None],
                                  method="pose_from_maps")
            k, h = gcn.shape[2], gcn.shape[3]
            pred2d, maxvals = get_max_preds(gcn.reshape(-1, k, h, h))
            # pack into one (K, 3) array: a high-RTT link (PCIe is fine, the
            # dev tunnel is not) pays per host fetch, so fetch ONCE per frame
            return jnp.concatenate([pred2d[0], maxvals[0]], axis=-1)

        # latency path: ONE fused XLA program (and one dispatch) per frame —
        # encode + window shift + decode; separate dispatches would pay the
        # host round-trip three times per frame
        @jax.jit
        def step(maps, hori_re, hori_im, vert_re, vert_im):
            ra, re = encode(hori_re, hori_im, vert_re, vert_im)
            new_maps = (push(maps[0], ra), push(maps[1], re))
            return new_maps, decode(*new_maps)

        @jax.jit
        def first_step(hori_re, hori_im, vert_re, vert_im):
            # sequence start: window full of the first frame (boundary clamp)
            ra, re = encode(hori_re, hori_im, vert_re, vert_im)
            maps = (jnp.broadcast_to(ra[None], (group,) + ra.shape),
                    jnp.broadcast_to(re[None], (group,) + re.shape))
            return maps, decode(*maps)

        @jax.jit
        def flush_step(maps):
            new_maps = (push(maps[0], maps[0][-1]),
                        push(maps[1], maps[1][-1]))
            return new_maps, decode(*new_maps)

        self._step = step
        self._first_step = first_step
        self._flush_step = flush_step

    @property
    def latency_frames(self) -> int:
        """Predictions lag the newest frame by G/2 - 1 frames (the centered
        window's lookahead)."""
        return self.group // 2 - 1

    def reset(self):
        self._maps = None
        self._count = 0

    def process_frame(self, hori_frame: np.ndarray, vert_frame: np.ndarray,
                      fetch: bool = True):
        """One raw ADC frame per view, each (RX=4, 192, 256) complex (or a
        (re, im) tuple — float32 or native int16 ADC planes, cast on device)
        -> (keypoints (K, 2) heatmap coords, maxvals).

        The first G/2 calls replicate-initialize the window (sequence start
        clamp); every call emits the pose for the window centered G/2-1
        frames back.

        fetch=False returns device arrays without forcing a host round-trip:
        dispatch is async, so a pipelined consumer can overlap the next
        frame's transfer/compute with reading this result later.
        """
        def split(f):
            # (re, im) tuples keep their dtype on the wire (int16 ADC planes
            # transfer at half the bytes; the device casts to f32 bit-exactly)
            if isinstance(f, tuple):
                return jnp.asarray(f[0]), jnp.asarray(f[1])
            f = np.asarray(f)
            return (jnp.asarray(f.real, jnp.float32),
                    jnp.asarray(f.imag, jnp.float32))

        hr, hi = split(hori_frame)
        vr, vi = split(vert_frame)

        if self._maps is None:
            self._maps, packed = self._first_step(hr, hi, vr, vi)
        else:
            self._maps, packed = self._step(self._maps, hr, hi, vr, vi)
        self._count += 1
        if not fetch:
            return packed[:, :2], packed[:, 2:]
        arr = np.asarray(packed)           # ONE host fetch per frame
        return arr[:, :2], arr[:, 2:]

    def flush(self):
        """End of sequence: emit the remaining min(frames_processed, G/2 - 1)
        poses by re-pushing the final frame (the offline end-of-sequence
        clamp), then reset for the next sequence.

        For a sequence shorter than the lookahead (F <= G/2 - 1) every valid
        pose comes from flush: the first (G/2-1) - F windows are still
        warming up and are pushed but not emitted, so a consumer that drops
        the first `latency_frames` process_frame outputs and appends all
        flush outputs always ends up with exactly F poses."""
        out = []
        if self._maps is None:
            return out
        skip = max(0, self.latency_frames - self._count)
        for i in range(self.latency_frames):
            self._maps, packed = self._flush_step(self._maps)
            if i >= skip:
                arr = np.asarray(packed)
                out.append((arr[:, :2], arr[:, 2:]))
        self.reset()
        return out
