import numpy as np
import jax.numpy as jnp

from hupr_tpu.ops.dsp import (
    RadarParams, decode_dca1000, radar_cube_frames, frames_from_adc,
    radar_cube_single_frame,
)
from oracles import oracle_radar_cube


def _random_frame(rng, scale=100.0):
    return (rng.standard_normal((4, 192, 256)) * scale
            + 1j * rng.standard_normal((4, 192, 256)) * scale)


def test_radar_cube_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    frame = _random_frame(rng)
    want = oracle_radar_cube(frame)
    got = np.asarray(radar_cube_single_frame(jnp.asarray(frame, jnp.complex64)))
    assert got.shape == (16, 64, 64, 8)
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 1e-4


def test_radar_cube_batched():
    rng = np.random.default_rng(1)
    frames = np.stack([_random_frame(rng) for _ in range(3)])
    got = np.asarray(radar_cube_frames(jnp.asarray(frames, jnp.complex64)))
    assert got.shape == (3, 16, 64, 64, 8)
    want = oracle_radar_cube(frames[2])
    denom = np.abs(want).max()
    assert np.abs(got[2] - want).max() / denom < 1e-4


def test_decode_dca1000_layout():
    """Round-trip: synthesize a DCA1000 int16 stream for known complex data and
    check the decoder reconstructs (RX, chirps, ADC) exactly."""
    rng = np.random.default_rng(2)
    n_chirps, n_adc = 6, 256
    want = (rng.integers(-500, 500, (4, n_chirps, n_adc))
            + 1j * rng.integers(-500, 500, (4, n_chirps, n_adc))).astype(np.complex128)

    # serialize: per chirp, RX-blocks of 256 complex samples; I on lane0, Q on
    # lane1; lanes interleave two samples per 4-int16 stream row.
    i_flat = np.real(want).transpose(1, 0, 2).reshape(-1)
    q_flat = np.imag(want).transpose(1, 0, 2).reshape(-1)
    raw = np.zeros((i_flat.size // 2, 4), dtype=np.int16)
    raw[:, 0] = i_flat[0::2]
    raw[:, 1] = i_flat[1::2]
    raw[:, 2] = q_flat[0::2]
    raw[:, 3] = q_flat[1::2]

    got = np.asarray(decode_dca1000(jnp.asarray(raw.reshape(-1))))
    assert got.shape == (4, n_chirps, n_adc)
    np.testing.assert_allclose(got, want.astype(np.complex64))


def test_frames_from_adc_slicing():
    rng = np.random.default_rng(3)
    adc = rng.standard_normal((4, 192 * 3, 256)) + 0j
    frames = np.asarray(frames_from_adc(jnp.asarray(adc, jnp.complex64)))
    assert frames.shape == (3, 4, 192, 256)
    np.testing.assert_allclose(frames[1], adc[:, 192:384].astype(np.complex64))
