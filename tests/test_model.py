import numpy as np
import jax
import jax.numpy as jnp
import torch

from hupr_tpu.models import HuPRNet
from hupr_tpu.models.blocks import BasicBlock
from hupr_tpu.models.mscsa import spatial_attention
from hupr_tpu.models.torch_convert import convert_state_dict


def tiny_model():
    return HuPRNet(num_filters=4, num_frames=8, num_group_frames=8,
                   num_keypoints=14, heatmap_size=64)


def tiny_inputs(b=2):
    rng = np.random.default_rng(0)
    shape = (b, 8, 8, 2, 64, 64, 8)
    return (jnp.asarray(rng.standard_normal(shape), jnp.float32),
            jnp.asarray(rng.standard_normal(shape), jnp.float32))


def test_forward_shapes_and_ranges():
    model = tiny_model()
    hori, vert = tiny_inputs()
    variables = model.init(jax.random.PRNGKey(0), hori, vert)
    heatmap, gcn = model.apply(variables, hori, vert)
    assert heatmap.shape == (2, 14, 1, 64, 64)
    assert gcn.shape == (2, 1, 14, 64, 64)
    assert float(jnp.min(heatmap)) >= 0.0 and float(jnp.max(heatmap)) <= 1.0
    assert float(jnp.min(gcn)) >= 0.0 and float(jnp.max(gcn)) <= 1.0


def test_train_mode_updates_batch_stats():
    model = tiny_model()
    hori, vert = tiny_inputs()
    variables = model.init(jax.random.PRNGKey(0), hori, vert)
    out, mutated = model.apply(variables, hori, vert, train=True,
                               mutable=["batch_stats"])
    old = variables["batch_stats"]["RAradarEncoder"]["layer1_block"]["bn1"]["mean"]
    new = mutated["batch_stats"]["RAradarEncoder"]["layer1_block"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_spatial_attention_matches_torch_einsum():
    """Numerics of the attention op vs the reference einsum formulation
    (layers.py:126-133) executed with torch on NCHW tensors."""
    rng = np.random.default_rng(1)
    b, c, h, w = 2, 6, 5, 5
    k = rng.standard_normal((b, c, h, w)).astype(np.float32)
    q = rng.standard_normal((b, c, h, w)).astype(np.float32)
    m = rng.standard_normal((b, c, h, w)).astype(np.float32)

    tk, tq, tm = (torch.from_numpy(x).reshape(b, c, h * w) for x in (k, q, m))
    attn = torch.einsum("bij,bik->bjk", tk, tq)
    want = torch.einsum("bci,bik->bck", tm, torch.softmax(attn, 1))
    want = want.reshape(b, c, h, w).numpy()

    got = spatial_attention(*(jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
                              for x in (k, q, m)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _torch_basic_block2d_nobn(cin, cout):
    """Clean-room torch twin of the no-BN BasicBlock (spec: layers.py:22-38)."""
    main = torch.nn.Sequential(
        torch.nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
        torch.nn.PReLU(),
        torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
    )
    down = torch.nn.Sequential(torch.nn.Conv2d(cin, cout, 3, 1, 1, bias=False))
    relu = torch.nn.PReLU()
    return main, down, relu


def test_basic_block_no_bn_matches_torch():
    torch.manual_seed(0)
    cin, cout = 3, 5
    main, down, relu = _torch_basic_block2d_nobn(cin, cout)
    x = torch.randn(2, cin, 8, 8)
    with torch.no_grad():
        want = relu(main(x) + down(x)).numpy()

    block = BasicBlock(cin, cout, ndim=2, batchnorm=False, activation="prelu")
    params = {
        "conv1": {"kernel": main[0].weight.detach().numpy().transpose(2, 3, 1, 0)},
        "act1": {"negative_slope": main[1].weight.detach().numpy()},
        "conv2": {"kernel": main[2].weight.detach().numpy().transpose(2, 3, 1, 0)},
        "downsample": {"kernel": down[0].weight.detach().numpy().transpose(2, 3, 1, 0)},
        "act_out": {"negative_slope": relu.weight.detach().numpy()},
    }
    xin = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = block.apply({"params": params}, xin)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_basic_block_bn_matches_torch_eval():
    """BN BasicBlock in eval mode (running stats) vs a torch twin
    (spec: layers.py:40-70)."""
    torch.manual_seed(1)
    cin, cout = 4, 6
    main = torch.nn.Sequential(
        torch.nn.Conv3d(cin, cout, 3, 1, 1, bias=False),
        torch.nn.BatchNorm3d(cout),
        torch.nn.ReLU(),
        torch.nn.Conv3d(cout, cout, 3, 1, 1, bias=False),
        torch.nn.BatchNorm3d(cout),
    )
    down = torch.nn.Sequential(
        torch.nn.Conv3d(cin, cout, 3, 1, 1, bias=False),
        torch.nn.BatchNorm3d(cout),
    )
    # randomize BN stats so eval mode is non-trivial
    for bn in (main[1], main[4], down[1]):
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.normal_()
        bn.bias.data.normal_()
    main.eval(); down.eval()
    x = torch.randn(2, cin, 4, 8, 8)
    with torch.no_grad():
        want = torch.relu(main(x) + down(x)).numpy()

    def bn_tree(bn):
        return ({"scale": bn.weight.detach().numpy(), "bias": bn.bias.detach().numpy()},
                {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()})

    p1, s1 = bn_tree(main[1]); p2, s2 = bn_tree(main[4]); pd, sd_ = bn_tree(down[1])
    tr = lambda w: w.detach().numpy().transpose(2, 3, 4, 1, 0)
    params = {"conv1": {"kernel": tr(main[0].weight)}, "bn1": p1,
              "conv2": {"kernel": tr(main[3].weight)}, "bn2": p2,
              "downsample": {"kernel": tr(down[0].weight)}, "bn_down": pd}
    stats = {"bn1": s1, "bn2": s2, "bn_down": sd_}

    block = BasicBlock(cin, cout, ndim=3, batchnorm=True, activation="relu")
    xin = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    got = block.apply({"params": params, "batch_stats": stats}, xin)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_converter_roundtrip_shapes():
    """A synthetic torch state_dict with the reference's exact key/shape
    surface converts into a tree that exactly matches model.init's."""
    model = HuPRNet(num_filters=32)
    hori, vert = tiny_inputs(b=1)
    variables = model.init(jax.random.PRNGKey(0), hori, vert)

    sd = _synthetic_reference_state_dict(f=32)
    converted = convert_state_dict(sd)

    want_shapes = jax.tree.map(lambda a: a.shape, variables)
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), converted)
    assert want_shapes == got_shapes

    # converted weights must run
    out, gcn = model.apply(converted, hori, vert)
    assert out.shape == (1, 14, 1, 64, 64)


def test_converter_loads_numpy_scalar_accuracy(tmp_path):
    """Real reference checkpoints store 'accuracy' as numpy.float64 (COCOeval
    stats[0], tools/base.py:84-90); the weights-only torch.load must accept
    it via the numpy safe-globals allowlist instead of raising
    UnpicklingError."""
    import numpy as np

    from hupr_tpu.models.torch_convert import convert_torch_checkpoint

    sd = _synthetic_reference_state_dict(f=2)
    path = str(tmp_path / "model_best.pth")
    torch.save({"model_state_dict": sd, "epoch": 7,
                "accuracy": np.float64(0.431)}, path)
    ckpt = convert_torch_checkpoint(path)
    assert ckpt["epoch"] == 7
    assert abs(float(ckpt["accuracy"]) - 0.431) < 1e-12
    assert "params" in ckpt["variables"]


def _synthetic_reference_state_dict(f=32):
    """Emit the reference HuPRNet state_dict key surface (SURVEY.md §2.8-2.12)
    with correctly-shaped random tensors."""
    sd = {}

    def conv(key, o, i, k, bias=True):
        sd[f"{key}.weight"] = torch.randn(o, i, *k)
        if bias:
            sd[f"{key}.bias"] = torch.randn(o)

    def bn(key, c):
        sd[f"{key}.weight"] = torch.randn(c)
        sd[f"{key}.bias"] = torch.randn(c)
        sd[f"{key}.running_mean"] = torch.randn(c)
        sd[f"{key}.running_var"] = torch.rand(c) + 0.5
        sd[f"{key}.num_batches_tracked"] = torch.tensor(0)

    def bb3(prefix, cin, cout):
        conv(f"{prefix}.main.0", cout, cin, (3, 3, 3), bias=False)
        bn(f"{prefix}.main.1", cout)
        conv(f"{prefix}.main.3", cout, cout, (3, 3, 3), bias=False)
        bn(f"{prefix}.main.4", cout)
        conv(f"{prefix}.downsample.0", cout, cin, (3, 3, 3), bias=False)
        bn(f"{prefix}.downsample.1", cout)

    def bb2_nobn(prefix, cin, cout):
        conv(f"{prefix}.main.0", cout, cin, (3, 3), bias=False)
        sd[f"{prefix}.main.1.weight"] = torch.randn(1) * 0.01 + 0.25
        conv(f"{prefix}.main.2", cout, cout, (3, 3), bias=False)
        conv(f"{prefix}.downsample.0", cout, cin, (3, 3), bias=False)
        sd[f"{prefix}.relu.weight"] = torch.randn(1) * 0.01 + 0.25

    for net in ["RAchirpNet", "REchirpNet"]:
        conv(f"{net}.temporalConvWx1x1", f, 2, (2, 1, 1))
    for enc in ["RAradarEncoder", "REradarEncoder"]:
        conv(f"{enc}.layer1.0", f * 2, f, (3, 3, 3))
        bb3(f"{enc}.layer1.1", f * 2, f * 2)
        bb3(f"{enc}.layer2.1", f * 2, f * 4)
        bb3(f"{enc}.layer2.2", f * 4, f * 4)
        bb3(f"{enc}.layer3.1", f * 4, f * 8)
        bb3(f"{enc}.layer3.2", f * 8, f * 8)
        conv(f"{enc}.l1temporalMerge", f * 2, f * 2, (8, 1, 1), bias=False)
        conv(f"{enc}.l2temporalMerge", f * 4, f * 4, (4, 1, 1), bias=False)
        conv(f"{enc}.temporalMerge", f * 8, f * 8, (2, 1, 1), bias=False)

    d = "radarDecoder"
    bb2_nobn(f"{d}.decoderLayer3.0", f * 32, f * 8)
    bb2_nobn(f"{d}.decoderLayer3.1", f * 8, f * 4)
    bb2_nobn(f"{d}.decoderLayer2.0", f * 20, f * 4)
    bb2_nobn(f"{d}.decoderLayer2.1", f * 4, f * 2)
    bb2_nobn(f"{d}.decoderLayer1.0", f * 10, f * 2)
    bb2_nobn(f"{d}.decoderLayer1.1", f * 2, f)
    conv(f"{d}.decoderLayer1.2", 14, f, (1, 1), bias=False)
    for proj in ["phi_cross_hori", "theta_cross_hori", "phi_cross_vert",
                 "theta_cross_vert", "phi_self_hori", "theta_self_hori",
                 "phi_self_vert", "theta_self_vert"]:
        for i, c in enumerate([f * 8, f * 4, f * 2]):
            conv(f"{d}.{proj}.{i}", c, c, (1, 1), bias=False)
    for layer in ["L1", "L2", "L3"]:
        sd[f"{d}.gcn.{layer}.weight"] = torch.randn(1024, 1024) * 0.01
        sd[f"{d}.gcn.{layer}.bias"] = torch.randn(1024, 14) * 0.01
    return sd


def test_bfloat16_compute_dtype_close_to_f32():
    """MODEL.computeDtype: bfloat16 must produce outputs close to the f32
    path (same params; conv/matmul compute in bf16)."""
    import jax
    from hupr_tpu.config import config_from_dict
    from hupr_tpu.models import build_model

    rng = np.random.default_rng(0)
    shape = (1, 8, 8, 2, 64, 64, 8)
    hori = rng.standard_normal(shape).astype(np.float32)
    vert = rng.standard_normal(shape).astype(np.float32)

    cfg32 = config_from_dict({"MODEL": {"numFilters": 2}})
    m32 = build_model(cfg32)
    variables = m32.init(jax.random.PRNGKey(0), hori, vert)
    h32, g32 = m32.apply(variables, hori, vert)

    cfg16 = config_from_dict({"MODEL": {"numFilters": 2,
                                        "computeDtype": "bfloat16"}})
    m16 = build_model(cfg16)
    h16, g16 = m16.apply(variables, hori, vert)  # same param tree
    # outputs are sigmoid probabilities in [0,1]
    np.testing.assert_allclose(np.asarray(h16), np.asarray(h32), atol=0.05)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32), atol=0.05)
