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


def test_train_mode_near_constant_channel_stays_finite():
    """The naive one-pass E[x^2]-E[x]^2 variance catastrophically cancels on
    a near-constant channel with a large mean (reached ~-0.5 here, NaN-ing
    the rsqrt). The shipped shifted one-pass moments (shift = sampled row 0,
    error relative to the true variance rather than to mean^2) must stay
    finite on both the unmasked and masked branches — this is the regression
    test that killed the naive formulation."""
    c = 2
    x = np.full((8, 16, 16, c), 173.2187, np.float32)
    x[..., 1] += np.random.default_rng(0).normal(
        0, 1e-4, x[..., 1].shape).astype(np.float32)
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
        assert np.isfinite(np.asarray(got)).all()


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
