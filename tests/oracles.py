"""Independent NumPy oracles for parity tests.

These are written from the pipeline *specification* (SURVEY.md §3.1/§2) in a
deliberately loop-heavy, obviously-correct style, and double as the "reference
throughput" baseline that bench.py compares against.
"""

import numpy as np


def oracle_radar_cube(frame: np.ndarray) -> np.ndarray:
    """One frame (4 RX, 192 chirps, 256 ADC) complex -> (16, 64, 64, 8) cube.

    Steps: TDM demux, clutter removal, range-Doppler FFT, zero-padded
    azimuth/elevation FFTs (elevation only on rows 2..5), range gate 94->31,
    Doppler fftshift, keep central 16 chirps, fftshift+flip angle axes.
    """
    n_rx, n_chirp, n_adc = frame.shape
    assert (n_rx, n_chirp) == (4, 192)
    n_proc = 64
    n_angle = n_adc // 4
    n_ele = 8

    # TDM demux
    azim = np.zeros((8, n_proc, n_adc), dtype=np.complex128)
    elev = np.zeros((4, n_proc, n_adc), dtype=np.complex128)
    for rx in range(4):
        for c in range(n_chirp):
            if c % 3 == 0:
                azim[rx, c // 3] = frame[rx, c]
            elif c % 3 == 1:
                elev[rx, c // 3] = frame[rx, c]
            else:
                azim[rx + 4, c // 3] = frame[rx, c]

    # clutter removal: subtract mean over chirps
    azim = azim - azim.mean(axis=1, keepdims=True)
    elev = elev - elev.mean(axis=1, keepdims=True)

    # range-Doppler FFT per RX
    for rx in range(8):
        azim[rx] = np.fft.fft2(azim[rx])
    for rx in range(4):
        elev[rx] = np.fft.fft2(elev[rx])

    # angle FFTs
    azim_p = np.pad(azim, ((0, n_angle - 8), (0, 0), (0, 0)))
    elev_p = np.pad(elev, ((2, n_angle - 6), (0, 0), (0, 0)))
    merged = np.stack([azim_p, elev_p])
    merged = np.pad(merged, ((0, n_ele - 2), (0, 0), (0, 0), (0, 0)))
    for c in range(n_proc):
        for a in range(n_adc):
            for row in (2, 3, 4, 5):
                merged[:, row, c, a] = np.fft.fft(merged[:, row, c, a])
            for e in range(n_ele):
                merged[e, :, c, a] = np.fft.fft(merged[e, :, c, a])

    # range gate + doppler shift
    gate = [i for i in range(94, 30, -1)]
    tmp = np.zeros((n_proc, n_angle, n_angle, n_ele), dtype=np.complex128)
    for e in range(n_ele):
        for r in range(n_angle):
            for a in range(n_angle):
                tmp[:, a, r, e] = merged[e, r, :, gate[a]]
    tmp = np.fft.fftshift(tmp, axes=0)

    # central 16 chirps; fftshift+flip over angle axes
    out = np.zeros((16, n_angle, n_angle, n_ele), dtype=np.complex128)
    for i, c in enumerate(range(24, 40)):
        x = np.transpose(tmp[c], (1, 2, 0))          # (az, ele, rng)
        x = np.fft.fftshift(x, axes=(0, 1))
        x = np.transpose(x, (2, 0, 1))               # (rng, az, ele)
        out[i] = np.flip(x, axis=(1, 2))
    return out


def oracle_generate_target(joints: np.ndarray, num_keypoints: int,
                           h_size: int, i_size: int):
    """Per-joint Gaussian patch rasterization (spec of misc/utils.py:6-65)."""
    sigma = 2 if h_size == 64 else 3
    tmp = sigma * 3
    stride = i_size / h_size
    target = np.zeros((num_keypoints, h_size, h_size), dtype=np.float32)
    peaks = np.zeros((num_keypoints, 2))
    for k in range(num_keypoints):
        mu_x = int(joints[k][0] / stride + 0.5)
        mu_y = int(joints[k][1] / stride + 0.5)
        ul = [mu_x - tmp, mu_y - tmp]
        br = [mu_x + tmp + 1, mu_y + tmp + 1]
        if ul[0] >= h_size or ul[1] >= h_size or br[0] < 0 or br[1] < 0:
            continue
        size = 2 * tmp + 1
        x = np.arange(size, dtype=np.float32)
        y = x[:, None]
        g = np.exp(-((x - tmp) ** 2 + (y - tmp) ** 2) / (2 * sigma ** 2))
        gx0, gx1 = max(0, -ul[0]), min(br[0], h_size) - ul[0]
        gy0, gy1 = max(0, -ul[1]), min(br[1], h_size) - ul[1]
        ix0, ix1 = max(0, ul[0]), min(br[0], h_size)
        iy0, iy1 = max(0, ul[1]), min(br[1], h_size)
        target[k, iy0:iy1, ix0:ix1] = g[gy0:gy1, gx0:gx1]
        peaks[k] = [mu_x, mu_y]
    return target, peaks
