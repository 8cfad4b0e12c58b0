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
    # optimizer_state_dict shaped as torch.optim.Adam.state_dict() shapes it:
    # the reference restores param_groups' lr on resume (tools/base.py:114)
    torch.save({"epoch": 7, "model_state_dict": net.state_dict(),
                "optimizer_state_dict": {
                    "state": {}, "param_groups": [{"lr": 3.3e-5}]},
                "accuracy": 0.51}, path)

    model = build_model(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state, epoch, acc, lr = load_torch_checkpoint(path, state)
    assert epoch == 7 and np.isclose(acc, 0.51)
    assert np.isclose(lr, 3.3e-5)

    j_heat, j_gcn = jax.jit(model.apply)(
        {"params": state.params, "batch_stats": state.batch_stats},
        hori, vert)
    np.testing.assert_allclose(np.asarray(j_heat), t_heat, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_gcn), t_gcn, atol=1e-4)


@pytest.mark.slow
def test_annealed_training_trajectory_matches_reference(ref_hupr_cls):
    """Three full train steps with lossDecay=0.3 against the REAL reference
    stack: HuPRNet forward/backward + misc/losses.LossComputer (annealing
    advances before each loss, beta = 1 - alpha) + torch Adam with L2
    weight decay — vs our jitted train_step driven like the Runner
    (advance_alpha before each step). Pins annealing, BCE clamps, BN batch
    stats and optimizer semantics end-to-end in one trajectory."""
    import importlib.util
    import types

    import jax
    import numpy as np

    from hupr_tpu.engine.steps import (init_state, make_optimizer,
                                       make_train_step)
    from hupr_tpu.models import build_model
    from hupr_tpu.models.torch_convert import convert_state_dict

    # load the real misc/losses.py with its `from misc import ...` satisfied
    # by the real utils/metrics implementations
    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    utils_mod = _load("ref_misc_utils_t",
                      os.path.join(REFERENCE, "misc", "utils.py"))
    for n in ("pycocotools", "pycocotools.coco", "pycocotools.cocoeval"):
        m = types.ModuleType(n)
        m.COCO = object
        m.COCOeval = object
        sys.modules.setdefault(n, m)
    metrics_mod = _load("ref_misc_metrics_t",
                        os.path.join(REFERENCE, "misc", "metrics.py"))
    misc_stub = types.ModuleType("misc")
    misc_stub.generateTarget = utils_mod.generateTarget
    misc_stub.get_max_preds = metrics_mod.get_max_preds
    sys.modules["misc"] = misc_stub
    try:
        losses_mod = _load("ref_misc_losses_t",
                           os.path.join(REFERENCE, "misc", "losses.py"))
    finally:
        del sys.modules["misc"]

    from hupr_tpu.config import config_from_dict
    cfg = config_from_dict({"TRAINING": {"lossDecay": 0.3}})
    lr = cfg.TRAINING.lr

    torch.manual_seed(1)
    net = ref_hupr_cls(cfg)
    net.train()
    loss_computer = losses_mod.LossComputer(cfg, "cpu")
    opt = torch.optim.Adam(net.parameters(), lr=lr, betas=(0.9, 0.999),
                           weight_decay=cfg.TRAINING.weightDecay)

    rng = np.random.default_rng(9)
    b = 2
    shape = (b, 8, 8, 2, 64, 64, 8)
    steps = []
    for _ in range(3):
        steps.append({
            "hori": rng.standard_normal(shape).astype(np.float32),
            "vert": rng.standard_normal(shape).astype(np.float32),
            "joints": np.floor(rng.uniform(20, 230, (b, 14, 2))),
        })

    # our side starts from the SAME weights (converted). convert_state_dict
    # returns numpy VIEWS of the live torch storage — copy them, or torch's
    # in-place opt.step() would silently rewrite our initial weights
    variables = jax.tree.map(np.array, convert_state_dict(net.state_dict()))
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tx.init(variables["params"]))
    train_step = make_train_step(model, tx, cfg.TRAINING.lossDecay)

    alpha = 0.0
    torch_losses, jax_losses = [], []
    from hupr_tpu.ops.normalize import normalize_radar_window
    for s in steps:
        # the reference net consumes DataLoader-normalized windows; our
        # train_step normalizes internally — feed torch the normalized view
        # (normalize parity vs the real reference class is pinned separately
        # in test_annot_differential.py)
        t_hori = np.asarray(normalize_radar_window(s["hori"]))
        t_vert = np.asarray(normalize_radar_window(s["vert"]))
        # reference: computeLoss advances alpha internally before combining
        preds = net(torch.from_numpy(t_hori), torch.from_numpy(t_vert))
        loss, _, _, _ = loss_computer.computeLoss(
            preds, torch.from_numpy(s["joints"]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

        # ours: Runner.advance_alpha semantics, then the jitted step
        if alpha < 1.0:
            alpha += cfg.TRAINING.lossDecay
        batch = {"hori": s["hori"], "vert": s["vert"],
                 "jointsGroup": s["joints"]}
        state, metrics = train_step(state, batch, lr, alpha)
        jax_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4)
    assert np.isclose(loss_computer.alpha, alpha)
    assert np.isclose(loss_computer.beta, 1.0 - alpha)

    # final weights must agree. Tolerance floor is set by Adam itself: each
    # step moves every element by ~±lr regardless of gradient magnitude
    # (m/(sqrt(v)+eps) ~ ±1), so f32 sign noise on near-zero gradients can
    # diverge an element by ~2*lr per step; observed max 1.5e-4 over 3 steps
    # at lr=1e-4. The per-step LOSS agreement above (rtol 2e-4, computed
    # from the evolving weights) is the tight accumulated-drift bound.
    want = convert_state_dict(net.state_dict())
    for a, b_ in zip(jax.tree.leaves(state.params),
                     jax.tree.leaves(want["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=7e-4, rtol=1e-3)
    for a, b_ in zip(jax.tree.leaves(state.batch_stats),
                     jax.tree.leaves(want["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=7e-4, rtol=1e-3)


def test_convert_cli_roundtrip(ref_net_and_inputs, tmp_path, monkeypatch,
                               capsys):
    """The convert CLI (python -m hupr_tpu.models.torch_convert) must produce
    a weights-only .ckpt that the Runner load path restores to the exact
    reference forward."""
    import jax

    from hupr_tpu.engine.checkpoint import load_checkpoint
    from hupr_tpu.engine.steps import init_state
    from hupr_tpu.models import build_model
    from hupr_tpu.models.torch_convert import main as convert_main

    net, cfg, hori, vert, t_heat, t_gcn = ref_net_and_inputs
    src = str(tmp_path / "model_best.pth")
    dst = str(tmp_path / "model_best.ckpt")
    torch.save({"epoch": 11, "model_state_dict": net.state_dict(),
                "accuracy": 0.42}, src)

    monkeypatch.setattr(sys, "argv", ["torch_convert", src, dst])
    convert_main()
    assert "wrote" in capsys.readouterr().out

    model = build_model(cfg)
    state = init_state(model, cfg, jax.random.PRNGKey(0))
    state, epoch, acc, lr = load_checkpoint(dst, state)
    assert epoch == 0  # weights-only: must not act as a resume point
    assert np.isclose(acc, 0.42)
    assert lr is None  # weights-only: no LR trajectory to continue
    j_heat, _ = jax.jit(model.apply)(
        {"params": state.params, "batch_stats": state.batch_stats},
        hori, vert)
    np.testing.assert_allclose(np.asarray(j_heat), t_heat, atol=1e-4)
