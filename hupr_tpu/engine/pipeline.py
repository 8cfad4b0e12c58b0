"""Fused end-to-end inference pipeline: raw ADC frames -> keypoints, one XLA
program (the BASELINE.json north star: preprocessing streams straight into
on-device batches instead of the reference's per-frame .npy hop).

Key restructurings vs the naive port:
  * Complex data never leaves the device; real/imag enter as separate planes.
  * The per-frame MNet chirp encoding (networks.py forward_chirp) depends only
    on individual frames, so it runs ONCE per distinct frame; the sliding
    window then stacks 32-channel maps, not raw cubes — 8x less encode compute
    and 8x less window data.
  * The reference's boundary-clamped window table (dataset.py:126-138) is
    exactly replicate-padding in time, so windowing is G static slices of a
    padded array (XLA-friendly copies), never a gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hupr_tpu.ops.dsp import RadarParams, radar_cube_single_frame
from hupr_tpu.ops.heatmap import get_max_preds
from hupr_tpu.ops.normalize import normalize_radar_window


def replicate_pad(x: jnp.ndarray, group: int, pad_to: int = None
                  ) -> jnp.ndarray:
    """(F, ...) -> (pad_to + G - 1, ...) edge-replicated so that
    padded[j] == x[clamp(j - G//2, 0, F-1)] — the boundary-clamp table
    (data.window_indices) as pure padding. pad_to defaults to F; larger
    values extend the right edge (for shape-static partial window batches)."""
    f = x.shape[0]
    if pad_to is None:
        pad_to = f
    half = group // 2
    tail = pad_to - f + (group - half - 1)
    parts = [x[:1]] * half + [x] + [x[-1:]] * tail
    return jnp.concatenate(parts, axis=0)


def window_stack(x: jnp.ndarray, group: int) -> jnp.ndarray:
    """(F, ...) per-frame values -> (F, G, ...) replicate-clamped windows,
    equivalent to indexing with data.window_indices for a single sequence."""
    xp = replicate_pad(x, group)
    f = x.shape[0]
    return jnp.stack([xp[j:j + f] for j in range(group)], axis=1)


def window_stack_sequences(x: jnp.ndarray, group: int,
                           duration: int) -> jnp.ndarray:
    """window_stack with the reference's per-sequence clamp (dataset.py:
    126-138 computes `index % duration`): a stack of F frames spanning
    F/duration sequences windows each duration-frame chunk independently,
    never bleeding across a sequence boundary. F must divide into whole
    sequences (or be a single partial sequence, F <= duration)."""
    f = x.shape[0]
    if f <= duration:
        return window_stack(x, group)
    if f % duration != 0:
        raise ValueError(
            f"frame stack of {f} must be whole {duration}-frame sequences")
    chunks = x.reshape((f // duration, duration) + x.shape[1:])
    out = jax.vmap(lambda seq: window_stack(seq, group))(chunks)
    return out.reshape((f, group) + x.shape[1:])


def cube_chirp_input(cubes_real, cubes_imag, num_frames=8):
    """(F, numChirps, R, A, E) cube halves -> normalized per-frame model
    input (F, 1, C, 2, R, A, E) (G=1: windowing happens after MNet).
    `num_frames` is DATASET.numFrames — the central chirp window the
    reference dataset slices (dataset.py:139-150)."""
    c0 = cubes_real.shape[1] // 2 - num_frames // 2
    x = jnp.stack([cubes_real[:, c0:c0 + num_frames],
                   cubes_imag[:, c0:c0 + num_frames]], axis=2)
    x = normalize_radar_window(x)
    return x[:, None]                                   # (F, 1, C, 2, R, A, E)


def make_e2e_infer(model, variables, params: RadarParams = RadarParams(),
                   duration: int = 600, group: int = 8, mesh=None,
                   num_frames: int = 8):
    """Returns jitted fn (hori_re, hori_im, vert_re, vert_im) -> (pred2d,
    maxvals) over a stack of F raw ADC frames per radar view, each
    (F, RX=4, 192, ADC=256) float32, all frames from one sequence.

    With `mesh` (a 1-axis jax.sharding.Mesh), the whole program runs SPMD
    with the frame axis sharded across devices: params are replicated, the
    per-frame DSP + MNet encode are embarrassingly parallel, and the sliding
    window's replicate-padded slices become halo exchanges XLA lowers to
    ICI collective-permutes. F must be divisible by the mesh size."""
    if mesh is not None:
        from hupr_tpu.parallel.mesh import batch_sharding, replicated
        variables = jax.device_put(variables, replicated(mesh))
        shard = batch_sharding(mesh)

    def run(hori_re, hori_im, vert_re, vert_im):
        def cube(re, im):
            # accept int16 I/Q planes (the DCA1000's native sample format):
            # casting on device halves host->device ingest bytes bit-exactly
            re = re.astype(jnp.float32)
            im = im.astype(jnp.float32)
            c = jax.vmap(lambda fr: radar_cube_single_frame(fr, params))(
                re + 1j * im)
            return jnp.real(c), jnp.imag(c)

        hr, hi = cube(hori_re, hori_im)
        vr, vi = cube(vert_re, vert_im)
        hori = cube_chirp_input(hr, hi, num_frames)
        vert = cube_chirp_input(vr, vi, num_frames)

        # per-frame chirp encoding, then window the encoded maps (clamped
        # per duration-frame sequence, like the reference's index % duration)
        ra, re = model.apply(variables, hori, vert, method="chirp_maps")
        ra = window_stack_sequences(ra[:, 0], group, duration)  # (F,G,R,A,C)
        re = window_stack_sequences(re[:, 0], group, duration)
        heatmap, gcn = model.apply(variables, ra, re,
                                   method="pose_from_maps")
        k, h = gcn.shape[2], gcn.shape[3]
        pred2d, maxvals = get_max_preds(gcn.reshape(-1, k, h, h))
        return pred2d, maxvals

    if mesh is not None:
        return jax.jit(run, in_shardings=(shard,) * 4,
                       out_shardings=(shard, shard))
    return jax.jit(run)
