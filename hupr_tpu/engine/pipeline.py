"""Fused end-to-end inference pipeline: raw ADC frames -> keypoints, one XLA
program (the BASELINE.json north star: preprocessing streams straight into
on-device batches instead of the reference's per-frame .npy hop).

Complex data never leaves the device (and real/imag enter as separate real
arrays), which also sidesteps host<->device complex transfer limits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hupr_tpu.data.dataset import window_indices
from hupr_tpu.ops.dsp import RadarParams, radar_cube_single_frame
from hupr_tpu.ops.heatmap import get_max_preds
from hupr_tpu.ops.normalize import normalize_radar_window


def cubes_to_model_input(cubes_real, cubes_imag, windows,
                         num_chirps=16, num_frames=8):
    """(F, 16, R, A, E) real+imag cube halves + (F, G) window table ->
    normalized model input (F, G, C, 2, R, A, E)."""
    c0 = num_chirps // 2 - num_frames // 2
    sel_r = cubes_real[:, c0:c0 + num_frames]
    sel_i = cubes_imag[:, c0:c0 + num_frames]
    x = jnp.stack([sel_r, sel_i], axis=2)            # (F, C, 2, R, A, E)
    x = normalize_radar_window(x)
    return x[windows]                                # (F, G, C, 2, R, A, E)


def make_e2e_infer(model, variables, params: RadarParams = RadarParams(),
                   duration: int = 600, group: int = 8):
    """Returns jitted fn (hori_re, hori_im, vert_re, vert_im) -> (pred2d,
    maxvals) over a stack of F raw ADC frames per radar view, each
    (F, RX=4, 192, ADC=256) float32."""

    def run(hori_re, hori_im, vert_re, vert_im):
        f = hori_re.shape[0]
        windows = jnp.asarray(window_indices(f, duration, group))

        def cube(re, im):
            c = jax.vmap(lambda fr: radar_cube_single_frame(fr, params))(
                re + 1j * im)
            return jnp.real(c), jnp.imag(c)

        hr, hi = cube(hori_re, hori_im)
        vr, vi = cube(vert_re, vert_im)
        hori = cubes_to_model_input(hr, hi, windows)
        vert = cubes_to_model_input(vr, vi, windows)
        heatmap, gcn = model.apply(variables, hori, vert)
        k, h = gcn.shape[2], gcn.shape[3]
        pred2d, maxvals = get_max_preds(gcn.reshape(-1, k, h, h))
        return pred2d, maxvals

    return jax.jit(run)
