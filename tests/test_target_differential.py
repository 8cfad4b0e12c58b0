"""Differential validation of GT-heatmap generation and argmax decoding
against the reference's own misc/utils.py (generateTarget) and
misc/metrics.py (get_max_preds) — random joints including negatives and
off-map positions, per-joint-sigma and normalized-coordinate modes.

misc/metrics.py imports pycocotools (not installed) at module level for
unrelated symbols; stubbed in sys.modules.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE, "misc", "utils.py")),
    reason="reference checkout not available")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_utils():
    return _load("ref_misc_utils", os.path.join(REFERENCE, "misc", "utils.py"))


@pytest.fixture(scope="module")
def ref_metrics():
    for name in ("pycocotools", "pycocotools.coco", "pycocotools.cocoeval"):
        m = types.ModuleType(name)
        m.COCO = object
        m.COCOeval = object
        sys.modules.setdefault(name, m)
    return _load("ref_misc_metrics",
                 os.path.join(REFERENCE, "misc", "metrics.py"))


def test_generate_target_matches_reference(ref_utils):
    import jax.numpy as jnp

    from hupr_tpu.ops.heatmap import generate_target

    rng = np.random.default_rng(0)
    cases = [rng.uniform(0, 256, (14, 2)) for _ in range(6)]
    # boundary + off-image joints (negative coords truncate toward zero)
    edge = rng.uniform(0, 256, (14, 2))
    edge[0] = [-1, -1]
    edge[1] = [-30, 128]
    edge[2] = [255, 255]
    edge[3] = [0, 0]
    edge[4] = [300, 300]   # window fully outside -> skipped joint
    cases.append(edge)
    for joints in cases:
        want_t, want_p = ref_utils.generateTarget(joints, 14, 64, 256)
        got_t, got_p = generate_target(jnp.asarray(joints), 14, 64, 256)
        np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_p), want_p)


def test_generate_target_coord_mode_matches_reference(ref_utils):
    import jax.numpy as jnp

    from hupr_tpu.ops.heatmap import generate_target

    rng = np.random.default_rng(1)
    joints = rng.uniform(0, 1, (14, 2))
    want_t, want_p = ref_utils.generateTarget(joints, 14, 64, 256,
                                              isCoord=True)
    got_t, got_p = generate_target(jnp.asarray(joints), 14, 64, 256,
                                   is_coord=True)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_p), want_p)


def test_generate_target_per_joint_sigmas_matches_reference(ref_utils):
    import jax.numpy as jnp

    from hupr_tpu.ops.heatmap import generate_target

    rng = np.random.default_rng(2)
    joints = rng.uniform(40, 210, (14, 2))
    # integer-valued sigmas*10: the symmetric-window baseline
    sigmas = rng.integers(1, 4, 14).astype(np.float64) / 10.0
    want_t, want_p = ref_utils.generateTarget(joints, 14, 64, 256,
                                              sigmas=list(sigmas))
    got_t, got_p = generate_target(jnp.asarray(joints), 14, 64, 256,
                                   sigmas=jnp.asarray(sigmas))
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_p), want_p)


def test_generate_target_fractional_sigmas_matches_reference(ref_utils):
    """Fractional 3σ (σ·10 = 2.5 -> tmp_size = 7.5): the reference's paste
    window is asymmetric (dx ∈ [-8,+7]), uses trunc-based ul/br bounds, and
    shifts the Gaussian center off mu near the left edge (ul<0 trunc≠floor).
    All of it must match bit-for-bit, including near-edge keep/skip calls."""
    import jax.numpy as jnp

    from hupr_tpu.ops.heatmap import generate_target

    rng = np.random.default_rng(4)
    for trial in range(6):
        # mix fractional and integer 3σ per joint
        sigmas = rng.choice([0.15, 0.25, 0.2, 0.35], size=14)
        joints = rng.uniform(0, 256, (14, 2))
        # force the edge cases the window arithmetic is sensitive to:
        # right-edge keep (ref keeps mu up to W-1+3σ), left-edge shift,
        # off-image negatives, far-outside skip
        joints[0] = [71 * 4, 120]      # mu_x=71 on a 64-wide map: kept
        joints[1] = [12, 12]           # ul<0: trunc center shift
        joints[2] = [-6, 128]          # negative mu
        joints[3] = [287.9, 128]       # mu_x=72: boundary of the keep rule
        joints[4] = [400, 400]         # fully outside: skipped
        want_t, want_p = ref_utils.generateTarget(joints, 14, 64, 256,
                                                  sigmas=list(sigmas))
        got_t, got_p = generate_target(jnp.asarray(joints), 14, 64, 256,
                                       sigmas=jnp.asarray(sigmas))
        np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-6,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(got_p), want_p,
                                   err_msg=f"trial {trial}")


def test_get_max_preds_matches_reference(ref_metrics):
    import jax.numpy as jnp

    from hupr_tpu.ops.heatmap import get_max_preds

    rng = np.random.default_rng(3)
    hm = rng.standard_normal((4, 14, 64, 64)).astype(np.float32)
    hm[0, 3] = -np.abs(hm[0, 3])          # all-negative -> masked coords
    hm[1, 5] = 0.0                        # all-zero -> masked coords
    want_p, want_v = ref_metrics.get_max_preds(hm)
    got_p, got_v = get_max_preds(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(got_p), want_p)
    np.testing.assert_allclose(np.asarray(got_v), want_v)
