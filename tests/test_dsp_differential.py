"""Differential validation of the radar-cube DSP against the reference's own
preprocessing code (preprocessing/process_iwr1843.py:106-178): construct the
real RadarObject, run its generateHeatmap on a random raw frame, and compare
with (a) the vectorized JAX pipeline and (b) tests/oracles.oracle_radar_cube —
proving the bench baseline oracle itself is reference-true, not just
spec-faithful.

RadarObject() builds only path strings at init (no disk IO); plot_utils
imports matplotlib, which is installed.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE, "preprocessing",
                                    "process_iwr1843.py")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_radar_object():
    sys.path.insert(0, os.path.join(REFERENCE, "preprocessing"))
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_process_iwr1843",
            os.path.join(REFERENCE, "preprocessing", "process_iwr1843.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(os.path.join(REFERENCE, "preprocessing"))

    class _NpProxy:
        """The reference targets numpy 1.20 and uses dtype='complex_',
        removed in numpy 2 — translate it, forward everything else."""

        def __getattr__(self, name):
            return getattr(np, name)

        @staticmethod
        def zeros(shape, dtype=None, **kw):
            if dtype == "complex_":
                dtype = np.complex128
            return np.zeros(shape, dtype=dtype, **kw)

    mod.np = _NpProxy()
    return mod.RadarObject()


def test_radar_cube_matches_reference_generate_heatmap(ref_radar_object):
    import jax.numpy as jnp

    from hupr_tpu.ops.dsp import radar_cube_single_frame
    from oracles import oracle_radar_cube

    rng = np.random.default_rng(0)
    frame = (rng.standard_normal((4, 192, 256))
             + 1j * rng.standard_normal((4, 192, 256)))

    want = ref_radar_object.generateHeatmap(frame)        # (16, 64, 64, 8)
    got_jax = np.asarray(radar_cube_single_frame(jnp.asarray(
        frame.astype(np.complex64))))
    got_oracle = oracle_radar_cube(frame)

    assert want.shape == got_jax.shape == got_oracle.shape == (16, 64, 64, 8)
    # the oracle must be bit-level reference-true (same NumPy ops, f64)
    np.testing.assert_allclose(got_oracle, want, rtol=1e-10, atol=1e-10)
    # the JAX pipeline runs in complex64: scale-relative tolerance
    scale = np.abs(want).max()
    np.testing.assert_allclose(got_jax, want, atol=2e-4 * scale)
