import os

import numpy as np

from hupr_tpu.preprocessing.process_iwr1843 import (
    RadarPreprocessor, decode_dca1000_np)
from hupr_tpu.preprocessing.plot_utils import composite_gt_heatmap
from oracles import oracle_radar_cube, oracle_generate_target


def _serialize_dca1000(complex_data: np.ndarray) -> np.ndarray:
    """(RX=4, chirps, 256) complex -> DCA1000 int16 stream (I lane0, Q lane1,
    two samples per stream row, 256-sample RX blocks cycling RX0..3)."""
    i_flat = np.real(complex_data).transpose(1, 0, 2).reshape(-1)
    q_flat = np.imag(complex_data).transpose(1, 0, 2).reshape(-1)
    raw = np.zeros((i_flat.size // 2, 4), dtype=np.int16)
    raw[:, 0] = i_flat[0::2]
    raw[:, 1] = i_flat[1::2]
    raw[:, 2] = q_flat[0::2]
    raw[:, 3] = q_flat[1::2]
    return raw.reshape(-1)


def test_decode_np_roundtrip():
    rng = np.random.default_rng(0)
    want = (rng.integers(-300, 300, (4, 6, 256))
            + 1j * rng.integers(-300, 300, (4, 6, 256))).astype(np.complex128)
    got = decode_dca1000_np(_serialize_dca1000(want))
    np.testing.assert_allclose(got, want.astype(np.complex64))


def test_preprocessor_end_to_end(tmp_path):
    """Two-frame synthetic capture -> .npy cubes matching the NumPy oracle."""
    rng = np.random.default_rng(1)
    n_frames = 2
    data = (rng.integers(-300, 300, (4, 192 * n_frames, 256))
            + 1j * rng.integers(-300, 300, (4, 192 * n_frames, 256))
            ).astype(np.complex128)

    raw_dir = tmp_path / "raw_data/iwr1843/HuPR/single_1"
    for view in ("hori", "vert"):
        os.makedirs(raw_dir / view)
        _serialize_dca1000(data).tofile(raw_dir / view / "adc_data.bin")

    pre = RadarPreprocessor(num_sequences=1,
                            raw_base=str(tmp_path / "raw_data"),
                            out_base=str(tmp_path / "out"),
                            batch_frames=2)
    pre.process_radar_data_hori_vert()

    for f in range(n_frames):
        got = np.load(tmp_path / f"out/HuPR/single_1/hori/{f:09d}.npy")
        assert got.shape == (16, 64, 64, 8)
        assert got.dtype == np.complex64
        want = oracle_radar_cube(data[:, 192 * f: 192 * (f + 1)])
        denom = np.abs(want).max()
        assert np.abs(got - want).max() / denom < 1e-4


def test_composite_gt_heatmap():
    rng = np.random.default_rng(2)
    joints = rng.integers(0, 256, (14, 2))
    got = composite_gt_heatmap(joints)
    want_t, _ = oracle_generate_target(joints, 14, 64, 256)
    np.testing.assert_allclose(got, want_t.max(axis=0), atol=1e-6)
