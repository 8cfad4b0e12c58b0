"""Native C++ .npy loader vs the NumPy path."""

import os

import numpy as np
import pytest

from hupr_tpu.data.native_loader import get_lib, load_frames, native_available


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def _write_frames(tmp_path, n, dtype, shape=(16, 64, 64, 8), seed=0):
    rng = np.random.default_rng(seed)
    paths, data = [], []
    for i in range(n):
        cube = (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(dtype)
        p = str(tmp_path / f"{i:09d}.npy")
        np.save(p, cube)
        paths.append(p)
        data.append(cube)
    return paths, data


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_load_frames_matches_numpy(lib, tmp_path, dtype):
    paths, data = _write_frames(tmp_path, 3, dtype)
    out = load_frames(paths, chirp_start=4, chirp_count=8,
                      inner_shape=(64, 64, 8), n_threads=2)
    assert out is not None
    re, im = out
    assert re.shape == (3, 8, 64, 64, 8) and re.dtype == np.float32
    for i, cube in enumerate(data):
        np.testing.assert_allclose(re[i], cube[4:12].real.astype(np.float32))
        np.testing.assert_allclose(im[i], cube[4:12].imag.astype(np.float32))


def test_probe(lib, tmp_path):
    import ctypes
    paths, _ = _write_frames(tmp_path, 1, np.complex64)
    shape = (ctypes.c_long * 8)()
    ndim = ctypes.c_int()
    item = lib.hupr_probe_npy(paths[0].encode(), shape, ctypes.byref(ndim))
    assert item == 8
    assert list(shape[:ndim.value]) == [16, 64, 64, 8]


def test_missing_file_returns_none(lib, tmp_path):
    paths, _ = _write_frames(tmp_path, 1, np.complex64)
    out = load_frames(paths + [str(tmp_path / "nope.npy")], 4, 8,
                      (64, 64, 8))
    assert out is None


def test_negative_chirp_start_returns_none(lib, tmp_path):
    """c0 < 0 must fail loudly (return None -> NumPy fallback), not fseek
    into the .npy header and return its bytes as radar samples."""
    paths, _ = _write_frames(tmp_path, 1, np.complex64)
    assert load_frames(paths, chirp_start=-4, chirp_count=8,
                       inner_shape=(64, 64, 8)) is None


def test_stale_library_not_loaded_when_rebuild_fails(tmp_path, monkeypatch):
    """If the source is newer than the built .so and the rebuild fails,
    get_lib must fall back to NumPy (None), never dlopen the out-of-date
    binary (which may have older parsing logic or missing symbols)."""
    import hupr_tpu.data.native_loader as nl
    if not os.path.exists(nl._LIB_PATH):
        pytest.skip("library was never built (no C++ toolchain)")
    real_build = nl._build
    monkeypatch.setattr(nl, "_lib", None)
    monkeypatch.setattr(nl, "_tried", False)
    # make the .so look stale and the compiler unavailable
    stale = os.path.getmtime(nl._SRC) - 3600
    os.utime(nl._LIB_PATH, (stale, stale))
    monkeypatch.setattr(nl, "_build", lambda: False)
    try:
        assert nl.get_lib() is None
    finally:
        # leave module state usable for other tests: restore a fresh .so
        nl._lib = None
        nl._tried = False
        real_build()


def test_dataset_native_matches_numpy_path(tmp_path):
    if not native_available():
        pytest.skip("no C++ toolchain available")
    import json
    from test_e2e import make_tiny_dataset, tiny_cfg
    from hupr_tpu.data import get_dataset

    data_dir = str(tmp_path / "data")
    make_tiny_dataset(data_dir, [1])
    cfg = tiny_cfg(data_dir)
    ds_native = get_dataset("val", cfg, use_native=True)
    ds_numpy = get_dataset("val", cfg, use_native=False)
    assert ds_native.use_native
    for idx in (0, 3, 7):
        a = ds_native.raw_sample(idx)
        b = ds_numpy.raw_sample(idx)
        np.testing.assert_allclose(a["hori"], b["hori"])
        np.testing.assert_allclose(a["vert"], b["vert"])
