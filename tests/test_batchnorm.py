"""TorchBatchNorm vs torch nn.BatchNorm: train-mode output AND running-stats
update (torch updates running_var with the unbiased batch variance)."""

import numpy as np
import jax.numpy as jnp
import torch

from hupr_tpu.models.blocks import TorchBatchNorm


def test_train_mode_output_and_running_stats_match_torch():
    torch.manual_seed(0)
    c = 6
    tbn = torch.nn.BatchNorm2d(c)
    tbn.weight.data.normal_()
    tbn.bias.data.normal_()
    tbn.train()
    x = torch.randn(4, c, 5, 7)
    with torch.no_grad():
        want = tbn(x).numpy()

    bn = TorchBatchNorm(use_running_average=False)
    variables = {
        "params": {"scale": tbn.weight.detach().numpy(),
                   "bias": tbn.bias.detach().numpy()},
        "batch_stats": {"mean": np.zeros(c, np.float32),
                        "var": np.ones(c, np.float32)},
    }
    xin = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got, mutated = bn.apply(variables, xin, mutable=["batch_stats"])
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)

    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tbn.running_var.numpy(), atol=1e-5)


def test_train_mode_large_mean_small_variance_channels_stay_accurate():
    """The naive one-pass E[x^2]-E[x]^2 variance catastrophically cancels on
    small-variance channels with large means: its absolute error scales with
    mean^2 * eps_f32 (~2e-3 at mean 173), which swamps a true variance of
    2.5e-3 (negative variance -> 0 under the clamp -> ~16x-wrong rsqrt(eps)
    normalization) and NaN'd outright before the clamp existed. The shipped
    shifted one-pass moments (shift = sampled row 0) keep the error RELATIVE
    to the true variance, so both channels here must match a float64
    two-pass reference — finiteness alone would no longer catch a naive
    regression now that the clamp exists."""
    c = 2
    rng = np.random.default_rng(0)
    x = np.full((8, 16, 16, c), 173.2187, np.float32)
    x[..., 0] += rng.normal(0, 5e-2, x[..., 0].shape).astype(np.float32)
    x[..., 1] += rng.normal(0, 1e-4, x[..., 1].shape).astype(np.float32)
    bn = TorchBatchNorm(use_running_average=False)
    variables = {
        "params": {"scale": np.ones(c, np.float32),
                   "bias": np.zeros(c, np.float32)},
        "batch_stats": {"mean": np.zeros(c, np.float32),
                        "var": np.ones(c, np.float32)},
    }
    for mask in (None, jnp.ones(8, jnp.float32).at[6:].set(0.0)):
        got, _ = bn.apply(variables, jnp.asarray(x), mask,
                          mutable=["batch_stats"])
        got = np.asarray(got)
        assert np.isfinite(got).all()
        rows = 8 if mask is None else 6
        x64 = x[:rows].astype(np.float64)
        mean64 = x64.mean(axis=(0, 1, 2))
        var64 = np.square(x64 - mean64).mean(axis=(0, 1, 2))
        want = ((x.astype(np.float64) - mean64)
                / np.sqrt(var64 + 1e-5)).astype(np.float32)
        # rtol on the normalized outputs: a clamped-to-zero variance would
        # be ~16x (ch 0) / ~1.03x (ch 1, eps-dominated) off; real f32
        # reduction noise is orders below these bounds
        np.testing.assert_allclose(got[..., 0], want[..., 0], rtol=2e-2,
                                   atol=2e-2)
        np.testing.assert_allclose(got[..., 1], want[..., 1], rtol=2e-2,
                                   atol=2e-2)


def test_eval_mode_uses_running_stats():
    c = 3
    rng = np.random.default_rng(0)
    mean = rng.standard_normal(c).astype(np.float32)
    var = rng.uniform(0.5, 2.0, c).astype(np.float32)
    bn = TorchBatchNorm(use_running_average=True)
    variables = {
        "params": {"scale": np.ones(c, np.float32),
                   "bias": np.zeros(c, np.float32)},
        "batch_stats": {"mean": mean, "var": var},
    }
    x = rng.standard_normal((2, 4, 4, c)).astype(np.float32)
    got = np.asarray(bn.apply(variables, jnp.asarray(x)))
    want = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(got, want, atol=1e-5)
