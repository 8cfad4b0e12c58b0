"""Full-network checkpoint parity against the REAL reference HuPRNet.

Loads /root/reference's torch model on CPU (the hardcoded `.cuda()` at
models/layers.py:112 is defused by monkeypatching Tensor/Module.cuda to
no-ops), random-initializes it, converts its state_dict() through
hupr_tpu.models.torch_convert.convert_state_dict, and asserts that our flax
HuPRNet.apply reproduces the torch forward on random radar cube windows.
This pins the composed network — MNet view-quirk -> Encoder3D -> MSCSA
(proj ModuleList index <-> scale mapping, layers.py:116-123,135-184) ->
PRGCN (networks.py:35-41) — not just individual blocks: a transposed kernel
or swapped projection index anywhere fails here.

Also round-trips an actual .pth file through the convert path used by the
Runner (engine.checkpoint.load_torch_checkpoint) and the eval step.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_hupr_cls():
    # defuse models/layers.py:112's hardcoded .cuda() on the GCN adjacency
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REFERENCE)
    try:
        from models.networks import HuPRNet as RefHuPRNet
    finally:
        sys.path.remove(REFERENCE)
    return RefHuPRNet


def _flagship_cfg():
    from hupr_tpu.config import config_from_dict
    return config_from_dict({})  # defaults == config/mscsa_prgcn.yaml


@pytest.fixture(scope="module")
def ref_net_and_inputs(ref_hupr_cls):
    cfg = _flagship_cfg()
    torch.manual_seed(0)
    net = ref_hupr_cls(cfg)
    net.eval()
    rng = np.random.default_rng(42)
    shape = (2, 8, 8, 2, 64, 64, 8)
    hori = rng.standard_normal(shape).astype(np.float32)
    vert = rng.standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        t_heat, t_gcn = net(torch.from_numpy(hori), torch.from_numpy(vert))
    return net, cfg, hori, vert, t_heat.numpy(), t_gcn.numpy()


def test_full_network_forward_matches_reference(ref_net_and_inputs):
    import jax
    from hupr_tpu.models import build_model
    from hupr_tpu.models.torch_convert import convert_state_dict

    net, cfg, hori, vert, t_heat, t_gcn = ref_net_and_inputs
    variables = convert_state_dict(net.state_dict())
    model = build_model(cfg)
    j_heat, j_gcn = jax.jit(model.apply)(variables, hori, vert)

    assert j_heat.shape == t_heat.shape == (2, 14, 1, 64, 64)
    assert j_gcn.shape == t_gcn.shape == (2, 1, 14, 64, 64)
    np.testing.assert_allclose(np.asarray(j_heat), t_heat, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_gcn), t_gcn, atol=1e-4)


def test_pth_roundtrip_through_runner_load_path(ref_net_and_inputs, tmp_path):
    """Save the reference state_dict exactly as tools/base.py:75-90 does,
    load through load_torch_checkpoint into a TrainState, and run our jitted
    eval-mode apply — the production published-checkpoint path."""
    import jax
    from hupr_tpu.engine.checkpoint import load_torch_checkpoint
    from hupr_tpu.engine.steps import init_state, make_optimizer
    from hupr_tpu.models import build_model

    net, cfg, hori, vert, t_heat, t_gcn = ref_net_and_inputs
    path = str(tmp_path / "model_best.pth")
    torch.save({"epoch": 7, "model_state_dict": net.state_dict(),
                "accuracy": 0.51}, path)

    model = build_model(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state, epoch, acc = load_torch_checkpoint(path, state)
    assert epoch == 7 and np.isclose(acc, 0.51)

    j_heat, j_gcn = jax.jit(model.apply)(
        {"params": state.params, "batch_stats": state.batch_stats},
        hori, vert)
    np.testing.assert_allclose(np.asarray(j_heat), t_heat, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_gcn), t_gcn, atol=1e-4)
