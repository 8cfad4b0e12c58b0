"""Convert the reference's torch checkpoints (model_best.pth etc.) into flax
variable trees for hupr_tpu.models.HuPRNet.

The reference saves {'epoch', 'model_state_dict', 'optimizer_state_dict',
'accuracy'} torch pickles (/root/reference/tools/base.py:75-100). This module
maps every state_dict entry onto the channels-last flax tree:

  torch ConvNd weight (O, I, *k)  ->  flax kernel (*k, I, O)
  torch BatchNormNd               ->  flax params {scale, bias} +
                                      batch_stats {mean, var}
  torch PReLU weight (1,)         ->  PReLU param negative_slope (1,)
  GCN W (out,in) / b (out,K)      ->  unchanged orientation
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    import torch
    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(sd, torch_key, has_bias=True):
    w = _np(sd[f"{torch_key}.weight"])
    nd = w.ndim
    kernel = np.transpose(w, tuple(range(2, nd)) + (1, 0))
    out = {"kernel": kernel}
    if has_bias and f"{torch_key}.bias" in sd:
        out["bias"] = _np(sd[f"{torch_key}.bias"])
    return out


def _bn(sd, torch_key):
    params = {"scale": _np(sd[f"{torch_key}.weight"]),
              "bias": _np(sd[f"{torch_key}.bias"])}
    stats = {"mean": _np(sd[f"{torch_key}.running_mean"]),
             "var": _np(sd[f"{torch_key}.running_var"])}
    return params, stats


def _prelu(sd, torch_key):
    return {"negative_slope": _np(sd[f"{torch_key}.weight"]).reshape(1)}


def _basic_block(sd, prefix, batchnorm):
    """BasicBlock2D/3D state_dict -> (params, batch_stats) subtrees.

    torch children with batchnorm: main=[conv,bn,act,conv,bn], downsample=
    [conv,bn]; without: main=[conv,prelu,conv], downsample=[conv], relu=prelu.
    """
    params: Dict = {}
    stats: Dict = {}
    if batchnorm:
        params["conv1"] = _conv(sd, f"{prefix}.main.0", has_bias=False)
        params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.main.1")
        params["conv2"] = _conv(sd, f"{prefix}.main.3", has_bias=False)
        params["bn2"], stats["bn2"] = _bn(sd, f"{prefix}.main.4")
        params["downsample"] = _conv(sd, f"{prefix}.downsample.0", has_bias=False)
        params["bn_down"], stats["bn_down"] = _bn(sd, f"{prefix}.downsample.1")
    else:
        params["conv1"] = _conv(sd, f"{prefix}.main.0", has_bias=False)
        params["act1"] = _prelu(sd, f"{prefix}.main.1")
        params["conv2"] = _conv(sd, f"{prefix}.main.2", has_bias=False)
        params["downsample"] = _conv(sd, f"{prefix}.downsample.0", has_bias=False)
        params["act_out"] = _prelu(sd, f"{prefix}.relu")
    return params, stats


def _encoder(sd, prefix):
    params: Dict = {}
    stats: Dict = {}
    params["layer1_conv"] = _conv(sd, f"{prefix}.layer1.0")
    for flax_name, torch_name in [
        ("layer1_block", "layer1.1"),
        ("layer2_block1", "layer2.1"), ("layer2_block2", "layer2.2"),
        ("layer3_block1", "layer3.1"), ("layer3_block2", "layer3.2"),
    ]:
        p, s = _basic_block(sd, f"{prefix}.{torch_name}", batchnorm=True)
        params[flax_name] = p
        stats[flax_name] = s
    for name in ["l1temporalMerge", "l2temporalMerge", "temporalMerge"]:
        params[name] = _conv(sd, f"{prefix}.{name}", has_bias=False)
    return params, stats


def _decoder(sd, prefix="radarDecoder"):
    params: Dict = {}
    for flax_name, torch_name in [
        ("decoder3_block1", "decoderLayer3.0"), ("decoder3_block2", "decoderLayer3.1"),
        ("decoder2_block1", "decoderLayer2.0"), ("decoder2_block2", "decoderLayer2.1"),
        ("decoder1_block1", "decoderLayer1.0"), ("decoder1_block2", "decoderLayer1.1"),
    ]:
        p, _ = _basic_block(sd, f"{prefix}.{torch_name}", batchnorm=False)
        params[flax_name] = p
    params["decoder1_out"] = _conv(sd, f"{prefix}.decoderLayer1.2", has_bias=False)

    for proj in ["phi_cross_hori", "theta_cross_hori", "phi_cross_vert",
                 "theta_cross_vert", "phi_self_hori", "theta_self_hori",
                 "phi_self_vert", "theta_self_vert"]:
        for i in range(3):
            params[f"{proj}_{i}"] = _conv(sd, f"{prefix}.{proj}.{i}",
                                          has_bias=False)

    gcn: Dict = {}
    for layer in ["L1", "L2", "L3"]:
        gcn[layer] = {"weight": _np(sd[f"{prefix}.gcn.{layer}.weight"]),
                      "bias": _np(sd[f"{prefix}.gcn.{layer}.bias"])}
    params["gcn"] = gcn
    return params


def convert_state_dict(sd) -> dict:
    """torch state_dict -> flax variables {'params':…, 'batch_stats':…}."""
    params: Dict = {}
    stats: Dict = {}
    for net in ["RAchirpNet", "REchirpNet"]:
        params[net] = {"temporalConv": _conv(sd, f"{net}.temporalConvWx1x1")}
    for enc in ["RAradarEncoder", "REradarEncoder"]:
        p, s = _encoder(sd, enc)
        params[enc] = p
        stats[enc] = s
    params["radarDecoder"] = _decoder(sd)
    return {"params": params, "batch_stats": stats}


def main():
    """CLI: python -m hupr_tpu.models.torch_convert model_best.pth out.ckpt
    — convert a reference torch checkpoint into the native format that
    Runner.load_model_weight / engine.checkpoint.load_checkpoint read."""
    import argparse

    from hupr_tpu.config import apply_platform_env
    from hupr_tpu.engine.checkpoint import save_weights_only_checkpoint

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="reference .pth checkpoint")
    ap.add_argument("dst", help="output .ckpt path")
    args = ap.parse_args()

    ckpt = convert_torch_checkpoint(args.src)
    acc = float(ckpt["accuracy"]) if ckpt["accuracy"] is not None else -1.0
    # epoch 0: the converted file carries weights only (no optimizer state),
    # so it must not act as a training resume point
    save_weights_only_checkpoint(args.dst, ckpt["variables"], accuracy=acc)
    print(f"wrote {args.dst} (weights-only; source epoch {ckpt['epoch']}, "
          f"accuracy {acc})")


def _numpy_safe_globals() -> list:
    """Real reference checkpoints store 'accuracy' as numpy.float64 (the
    COCOeval stats[0] written by tools/base.py:84-90); the weights-only
    unpickler rejects numpy scalars unless they are allowlisted."""
    import numpy as np
    core = getattr(np, "_core", None) or np.core
    out = [core.multiarray.scalar, np.dtype]
    dtypes = getattr(np, "dtypes", None)
    if dtypes is not None:        # numpy >= 1.25 dtype classes
        out.append(dtypes.Float64DType)
    return out


def convert_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth and return {'variables', 'epoch', 'accuracy'}."""
    import torch
    # reference checkpoints are plain tensor/scalar dicts; weights_only=True
    # avoids executing arbitrary pickled code from untrusted .pth files
    # (numpy scalar types explicitly allowlisted — real checkpoints carry a
    # numpy.float64 accuracy)
    with torch.serialization.safe_globals(_numpy_safe_globals()):
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt
    # strip DataParallel prefixes if present
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }
    # the LR in effect when the checkpoint was written lives in the torch
    # optimizer's param_groups; the reference restores it on resume
    # (tools/base.py:114)
    lr = None
    if isinstance(ckpt, dict):
        groups = ckpt.get("optimizer_state_dict", {}).get("param_groups", [])
        if groups and "lr" in groups[0]:
            lr = float(groups[0]["lr"])
    return {
        "variables": convert_state_dict(sd),
        "epoch": ckpt.get("epoch", -1) if isinstance(ckpt, dict) else -1,
        "accuracy": ckpt.get("accuracy", None) if isinstance(ckpt, dict) else None,
        "lr": lr,
    }


if __name__ == "__main__":
    main()
