import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from hupr_tpu.ops.resize import resize_linear_align_corners, scale_by_factor
from hupr_tpu.ops.heatmap import (
    generate_target_batch, get_max_preds, bce_loss,
)
from hupr_tpu.ops.normalize import normalize_radar_window
from oracles import oracle_generate_target


def test_bilinear_upsample_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16, 16)).astype(np.float32)
    want = TF.interpolate(torch.from_numpy(x), scale_factor=2.0,
                          mode="bilinear", align_corners=True).numpy()
    got = np.asarray(scale_by_factor(jnp.asarray(x), 2.0, axes=(2, 3)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bilinear_downsample_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    want = TF.interpolate(torch.from_numpy(x), scale_factor=0.5,
                          mode="bilinear", align_corners=True).numpy()
    got = np.asarray(scale_by_factor(jnp.asarray(x), 0.5, axes=(2, 3)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_trilinear_downsample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 8, 16, 16)).astype(np.float32)
    want = TF.interpolate(torch.from_numpy(x), scale_factor=0.5,
                          mode="trilinear", align_corners=True).numpy()
    got = np.asarray(scale_by_factor(jnp.asarray(x), 0.5, axes=(2, 3, 4)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_generate_target_matches_oracle():
    rng = np.random.default_rng(3)
    joints = rng.integers(0, 256, (4, 14, 2))
    # include edge cases: near-border and out-of-bounds joints
    joints[0, 0] = [0, 0]
    joints[0, 1] = [255, 255]
    joints[0, 2] = [2, 250]
    tgt, peaks = generate_target_batch(jnp.asarray(joints))
    for b in range(4):
        want_t, want_p = oracle_generate_target(joints[b], 14, 64, 256)
        np.testing.assert_allclose(np.asarray(tgt[b]), want_t, atol=1e-6)
        np.testing.assert_allclose(np.asarray(peaks[b]), want_p)


def test_generate_target_negative_coords_truncate_toward_zero():
    """Off-image negative annotations: the reference's int() truncates toward
    zero (int(-0.25) == 0) where floor would shift the Gaussian one bin
    (misc/utils.py:37-38)."""
    joints = np.array([[[-1, -1], [-3, 10], [10, -3], [-30, -30],
                        [-200, 128]] + [[50, 50]] * 9], dtype=np.float64)
    tgt, peaks = generate_target_batch(jnp.asarray(joints))
    want_t, want_p = oracle_generate_target(joints[0], 14, 64, 256)
    np.testing.assert_allclose(np.asarray(tgt[0]), want_t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(peaks[0]), want_p)


def test_get_max_preds_matches_reference_semantics():
    rng = np.random.default_rng(4)
    hm = rng.standard_normal((3, 14, 64, 64)).astype(np.float32)
    hm[1, 2] = -np.abs(hm[1, 2])  # all-negative map -> masked to 0
    preds, maxvals = get_max_preds(jnp.asarray(hm))
    flat = hm.reshape(3, 14, -1)
    idx = flat.argmax(2)
    want_x = (idx % 64).astype(np.float32)
    want_y = np.floor(idx / 64).astype(np.float32)
    mask = (flat.max(2) > 0)
    np.testing.assert_allclose(np.asarray(preds[..., 0]), want_x * mask)
    np.testing.assert_allclose(np.asarray(preds[..., 1]), want_y * mask)


def test_bce_matches_torch():
    rng = np.random.default_rng(5)
    p = rng.uniform(1e-4, 1 - 1e-4, (2, 14, 64, 64)).astype(np.float32)
    t = (rng.uniform(size=(2, 14, 64, 64)) > 0.7).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    got = float(bce_loss(jnp.asarray(p), jnp.asarray(t)))
    assert abs(got - want) < 1e-5


def test_normalize_matches_reference_transform():
    """Parity with ToTensor + Normalize (datasets/base.py:13-24) applied to a
    (R, A, E) slice: per-elevation-channel min-max then unbiased standardize."""
    rng = np.random.default_rng(6)
    x = rng.standard_normal((64, 64, 8)).astype(np.float32) * 37.0 + 5.0

    t = torch.from_numpy(x).permute(2, 0, 1)  # ToTensor: HWC -> CHW
    c = t.size(0)
    mn = torch.min(t.view(c, -1), 1)[0].view(c, 1, 1)
    z = t - mn
    mx = torch.max(z.view(c, -1), 1)[0].view(c, 1, 1)
    nrm = z / mx
    std, mean = torch.std_mean(nrm.view(c, -1), 1)
    want = ((nrm - mean.view(c, 1, 1)) / std.view(c, 1, 1)).permute(1, 2, 0).numpy()

    got = np.asarray(normalize_radar_window(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_normalize_degenerate_plane_is_zero_not_nan():
    """A constant (R, A) plane normalizes to zeros, not NaN. The cube's
    Doppler-0 chirp is mathematically zero after clutter removal; the TPU
    FFT produces it EXACTLY zero (CPU keeps ~1e-10 residue), and the
    unguarded reference formula 0/0-NaN'd every fused-ADC forward on the
    chip. Non-degenerate channels of the same window must stay bit-equal
    to the unguarded math (the where-guard only rewrites the denominator
    when the plane carries no information)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, 64, 8)).astype(np.float32)
    x[:, :, 3] = 0.0                       # exactly-zero plane (channel 3)
    x[:, :, 5] = 2.5                       # constant nonzero plane
    got = np.asarray(normalize_radar_window(jnp.asarray(x)))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[:, :, 3], 0.0)
    np.testing.assert_array_equal(got[:, :, 5], 0.0)
    # untouched channels: identical to normalizing them alone (no guard hit)
    alone = np.asarray(normalize_radar_window(jnp.asarray(x[:, :, :3])))
    np.testing.assert_array_equal(got[:, :, :3], alone)
