"""Radar-cube DSP pipeline (L1) as pure, fully-vectorized JAX.

Behavioral parity target: /root/reference/preprocessing/process_iwr1843.py
  - getadcDataFromDCA1000 (:54-83)  -> decode_dca1000
  - generateHeatmap       (:106-173)-> radar_cube_single_frame
  - clutterRemoval        (:85-104) -> _clutter_removal
  - postProcessFFT3D      (:48-52)  -> folded into the final fftshift+flip

The reference runs a per-frame Python triple loop over (chirp, ADC, elevation)
for the angle FFTs; here every stage is a batched jnp.fft / gather that XLA
fuses and tiles, and frames are processed in parallel via vmap under jit.
One IWR1843 frame: (4 RX, 192 TDM chirps, 256 ADC samples) complex
-> radar cube (16 Doppler chirps, 64 range, 64 azimuth, 8 elevation) complex.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RadarParams:
    """IWR1843 capture geometry (reference process_iwr1843.py:18-33)."""
    num_adc_samples: int = 256
    adc_ratio: int = 4            # range decimation: keep 256/4 = 64 range bins
    num_ele_bins: int = 8
    num_rx: int = 4
    num_lanes: int = 2
    frame_per_second: int = 10
    duration_s: int = 60
    num_chirp: int = 192          # 64 x 3 TDM TX per frame
    idx_proc_chirp: int = 64      # chirps per TX after demux
    num_group_chirp: int = 4      # keep 64/4 = 16 central Doppler bins
    range_gate_start: int = 94    # ADC bins 94 -> 31 descending

    @property
    def num_angle_bins(self) -> int:
        return self.num_adc_samples // self.adc_ratio  # 64

    @property
    def num_frames(self) -> int:
        return self.frame_per_second * self.duration_s  # 600

    @property
    def num_kept_chirps(self) -> int:
        return self.idx_proc_chirp // self.num_group_chirp  # 16


def decode_dca1000(raw: jnp.ndarray, params: RadarParams = RadarParams()) -> jnp.ndarray:
    """DCA1000 int16 stream -> complex ADC matrix (numRX, totalChirps, numADC).

    The capture interleaves two LVDS lanes; lane0 carries I, lane1 carries Q,
    in blocks of numADCSamples per RX (reference :54-83, expressed there as a
    per-block Python loop; here as reshapes).
    """
    p = params
    n = p.num_adc_samples
    # stream layout: rows of [l0a, l0b, l1a, l1b] int16
    quad = raw.reshape(-1, p.num_lanes * 2)
    # re-interleave each lane's two samples back into a flat series
    lane_i = quad[:, 0:2].reshape(-1)  # I samples
    lane_q = quad[:, 2:4].reshape(-1)  # Q samples
    iq = lane_i.astype(jnp.float32) + 1j * lane_q.astype(jnp.float32)
    # blocks of numADC samples cycle through RX 0..3
    blocks = iq.reshape(-1, p.num_rx, n)            # (chirps, RX, ADC)
    return jnp.transpose(blocks, (1, 0, 2))         # (RX, chirps, ADC)


def _tdm_demux(frame: jnp.ndarray, params: RadarParams):
    """TDM-MIMO demux (reference :113-120).

    Chirps with idx%3==0 fill virtual RX 0-3 and idx%3==2 fill RX 4-7 of the
    azimuth array; idx%3==1 fills the 4-element elevation array.
    frame: (RX=4, 192, ADC) -> azim (8, 64, ADC), elev (4, 64, ADC).
    """
    tx0 = frame[:, 0::3, :]   # (4, 64, ADC)
    tx1 = frame[:, 1::3, :]
    tx2 = frame[:, 2::3, :]
    azim = jnp.concatenate([tx0, tx2], axis=0)      # (8, 64, ADC)
    return azim, tx1


def _clutter_removal(x: jnp.ndarray, chirp_axis: int = 1) -> jnp.ndarray:
    """Static clutter removal: subtract the per-(RX, ADC) mean over chirps
    (reference :85-104, applied at :122-128)."""
    return x - jnp.mean(x, axis=chirp_axis, keepdims=True)


def radar_cube_single_frame(frame: jnp.ndarray,
                            params: RadarParams = RadarParams()) -> jnp.ndarray:
    """One radar frame -> complex cube (16 doppler, 64 range, 64 azim, 8 elev).

    Mirrors reference generateHeatmap (:106-173) with every per-(chirp, ADC)
    Python loop replaced by a batched FFT along the corresponding axis.
    """
    p = params
    azim, elev = _tdm_demux(frame, p)               # (8,64,A), (4,64,A)

    # 1. static clutter removal over the chirp axis
    azim = _clutter_removal(azim, chirp_axis=1)
    elev = _clutter_removal(elev, chirp_axis=1)

    # 2. range-Doppler FFT: 2D FFT over (chirp, ADC) per RX (reference :131-134)
    azim = jnp.fft.fft2(azim, axes=(1, 2))
    elev = jnp.fft.fft2(elev, axes=(1, 2))

    # The reference (:137-171) runs the angle FFTs over all 256 ADC bins and
    # all 64 Doppler chirps, then discards 3/4 of each (range gate 94..31,
    # central-16 chirp crop). Both selections are column picks on axes the
    # angle FFTs never mix, so they commute with step 3 — selecting first is
    # bit-identical and cuts the angle-FFT work and tensor sizes 16x
    # (profiled as the dominant pipeline cost otherwise).
    nab = p.num_angle_bins
    gate = p.range_gate_start - np.arange(nab)       # range gate (:154-157)
    half, k = p.idx_proc_chirp // 2, p.num_kept_chirps
    # central-16 selection applied post-fftshift(:159-171); pre-shift indices:
    chirp_sel = (np.arange(half - k // 2, half + k // 2) + half) % p.idx_proc_chirp
    azim = azim[:, chirp_sel][:, :, gate]            # (8, 16, 64)
    elev = elev[:, chirp_sel][:, :, gate]

    # 3. angle FFTs (reference :137-151).
    #    Zero-pad azimuth 8->64; pad elevation array 4->64 centered at rows 2..5;
    #    stack into an (ele=8, az=64, chirp, rng) tensor (planes 2..7 zero).
    azim = jnp.pad(azim, ((0, nab - azim.shape[0]), (0, 0), (0, 0)))
    elev = jnp.pad(elev, ((2, nab - 4 - 2), (0, 0), (0, 0)))
    merged = jnp.stack([azim, elev])                                 # (2,64,C,R)
    merged = jnp.pad(merged, ((0, p.num_ele_bins - 2), (0, 0), (0, 0), (0, 0)))

    # elevation FFT only on azimuth rows 2..5 (where the vertical array lives);
    # rows outside keep their pre-FFT values — the reference loops only idx 2..5.
    # The axis-0 FFT is independent per azimuth column, so computing it on the
    # four kept rows alone is bit-identical at 1/16 the FFT work.
    ele_fft = jnp.fft.fft(merged[:, 2:6], axis=0)
    merged = merged.at[:, 2:6].set(ele_fft)
    # azimuth FFT over all rows, per elevation bin
    merged = jnp.fft.fft(merged, axis=1)                             # (8,64,C,R)

    # 4. final layout: per kept chirp the reference's transpose/fftshift/
    #    transpose/flip chain (:167-171, :48-52) reduces to fftshift + flip
    #    over the (azimuth, elevation) axes.
    cube = jnp.transpose(merged, (2, 3, 1, 0))                       # (C,rng,az,ele)
    cube = jnp.fft.fftshift(cube, axes=(2, 3))
    cube = jnp.flip(cube, axis=(2, 3))
    return cube


@partial(jax.jit, static_argnames=("params",))
def radar_cube_frames(frames: jnp.ndarray,
                      params: RadarParams = RadarParams()) -> jnp.ndarray:
    """Batch of frames (F, RX, 192, ADC) -> cubes (F, 16, 64, 64, 8)."""
    return jax.vmap(lambda f: radar_cube_single_frame(f, params))(frames)


def frames_from_adc(adc: jnp.ndarray, params: RadarParams = RadarParams()) -> jnp.ndarray:
    """Slice a decoded capture (RX, totalChirps, ADC) into per-frame stacks
    (F, RX, numChirp, ADC) (reference :189-191)."""
    p = params
    f = adc.shape[1] // p.num_chirp
    return jnp.transpose(
        adc[:, : f * p.num_chirp].reshape(adc.shape[0], f, p.num_chirp, -1),
        (1, 0, 2, 3),
    )
