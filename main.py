"""HuPR TPU-native CLI (parity: /root/reference/main.py).

    python main.py --config mscsa_prgcn.yaml --dir mscsa_prgcn            # train
    python main.py --config mscsa_prgcn.yaml --dir mscsa_prgcn --eval    # eval
"""

from hupr_tpu.config import (apply_platform_env, build_arg_parser,
                             load_config, resolve_config_path)
from hupr_tpu.engine import Runner


def main():
    import os
    apply_platform_env()
    if os.environ.get("HUPR_MULTIHOST") == "1":
        # multi-host SPMD over DCN: every host runs this same program; the
        # data-parallel Mesh in hupr_tpu.parallel then spans all hosts' chips
        import jax
        jax.distributed.initialize()
    args = build_arg_parser().parse_args()
    cfg = load_config(resolve_config_path(args.config))
    runner = Runner(args, cfg)
    vis = args.visDir != "none"
    if args.eval:
        runner.load_model_weight("model_best")
        runner.eval(visualization=vis)
    else:
        runner.load_model_weight("checkpoint")
        runner.train()


if __name__ == "__main__":
    main()
