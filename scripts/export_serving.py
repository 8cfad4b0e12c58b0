"""Export the fused e2e serving program (raw ADC -> keypoints) to a
portable AOT artifact (engine/export.py) from the config/checkpoint
surface:

    python scripts/export_serving.py --config mscsa_prgcn.yaml \
        --checkpoint logs/mscsa_prgcn/model_best.ckpt \
        --frames 32 --out serving_f32.jexp --platforms tpu,cpu

`--checkpoint` accepts this framework's .ckpt (msgpack) or a reference
torch .pth (weights converted via models/torch_convert.py); omit it to
export synthetic weights (deployment-shape smoke artifact). Export is
lowering-only — it runs fine on a CPU-only host and can embed TPU
lowerings cross-platform, so the script forces the CPU backend and never
touches the TPU tunnel."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="mscsa_prgcn.yaml")
    ap.add_argument("--checkpoint", default=None,
                    help=".ckpt or .pth; synthetic weights when omitted")
    ap.add_argument("--frames", type=int, default=32,
                    help="exported frame-stack size (static shape)")
    ap.add_argument("--out", default="serving.jexp")
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowerings to embed")
    ap.add_argument("--dtype", default="int16", choices=("int16", "float32"),
                    help="ingest dtype (int16 = DCA1000 native)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hupr_tpu.config import load_config, resolve_config_path
    from hupr_tpu.engine.checkpoint import (load_checkpoint,
                                            load_torch_checkpoint)
    from hupr_tpu.engine.export import (artifact_info, export_serving,
                                        save_artifact)
    from hupr_tpu.engine.steps import init_state
    from hupr_tpu.models import build_model
    from hupr_tpu.ops.dsp import RadarParams
    from hupr_tpu.utils.synthetic import synthetic_variables

    cfg = load_config(resolve_config_path(args.config))
    d = cfg.DATASET
    model = build_model(cfg)
    example = (1, d.numGroupFrames, d.numFrames, 2,
               d.rangeSize, d.azimuthSize, d.elevationSize)

    if args.checkpoint:
        state = init_state(model, cfg, jax.random.PRNGKey(0))
        load = (load_torch_checkpoint if args.checkpoint.endswith(".pth")
                else load_checkpoint)
        state, epoch, _, _ = load(args.checkpoint, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"loaded {args.checkpoint} (epoch {epoch})")
    else:
        variables = synthetic_variables(model, example)
        print("exporting SYNTHETIC weights (no --checkpoint given)")

    # the capture geometry and window length come from the CONFIG (a
    # DATASET.adcParams overlay must produce an artifact matching the
    # weights' geometry — hardcoding RadarParams() here silently exported
    # flagship-shaped DSP for reduced-geometry configs)
    rp = d.radar_params() if hasattr(d, "radar_params") else RadarParams()
    blob = export_serving(
        model, variables, params=rp, frames=args.frames,
        group=d.numGroupFrames, num_frames=d.numFrames,
        dtype=jnp.int16 if args.dtype == "int16" else jnp.float32,
        platforms=tuple(p.strip() for p in args.platforms.split(",")))
    save_artifact(args.out, blob)
    info = artifact_info(blob)
    print(f"wrote {args.out}: {info['bytes'] / 1e6:.1f} MB, "
          f"platforms={info['platforms']}, in={info['in_avals'][0]}, "
          f"out={info['out_avals']}")


if __name__ == "__main__":
    main()
