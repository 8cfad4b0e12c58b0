"""hupr_tpu — a TPU-native (JAX/Flax/pjit/Pallas) framework for human pose
estimation from millimeter-wave radar, with the full capability surface of the
HuPR WACV'23 benchmark reference (robert80203/HuPR-A-Benchmark-...).

Layer map (mirrors reference SURVEY.md §1, redesigned TPU-first):

  L5  CLI            main.py (argparse + YAML config, identical flag surface)
  L4  Runner         hupr_tpu.engine (jitted train/eval steps, checkpoints)
  L3  Model          hupr_tpu.models (Flax: MNet, Encoder3D, MSCSA, PRGCN)
  L3' Loss/metrics   hupr_tpu.ops.heatmap / hupr_tpu.eval (OKS COCO evaluator)
  L2  Data           hupr_tpu.data (COCO GT gen, sliding-window device loader)
  L1  Signal (DSP)   hupr_tpu.ops.dsp (batched jnp.fft radar-cube pipeline)
  ∥   Parallelism    hupr_tpu.parallel (Mesh/NamedSharding SPMD data parallel)
"""

__version__ = "0.1.0"
