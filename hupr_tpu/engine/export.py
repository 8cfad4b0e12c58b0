"""AOT serving export: serialize the fused e2e serving program (raw ADC
frames -> keypoints, engine/pipeline.make_e2e_infer) to a portable
`jax.export` artifact (versioned StableHLO + calling convention), so a
deployment host can run inference WITHOUT the model code, the config stack,
or even flax installed — only jax. Weights are baked into the artifact as
constants; shapes are static (fixed frame-stack size F), which is the
TPU-native answer: XLA compiles one fully-tiled program per stack size.

The reference has no deployment story beyond "run main.py --eval with the
torch checkpoint" (reference main.py:1-60); this is a capability on top.

Typical flow (scripts/export_serving.py wires it to the config/checkpoint
surface):

    blob = export_serving(model, variables, frames=32)
    save_artifact("serving_f32.jexp", blob)
    # ... on the deployment host:
    serve = load_serving(read(...))
    pred2d, maxvals = serve(hori_re, hori_im, vert_re, vert_im)

Artifacts are forward-compatible across jax releases within the exported
calling-convention window (jax.export's versioning contract); tests
round-trip through bytes and pin output equality vs the live jitted fn.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from hupr_tpu.engine.pipeline import make_e2e_infer
from hupr_tpu.ops.dsp import RadarParams

MAGIC = b"HUPRJEXP1\n"


def serving_arg_specs(frames: int, params: RadarParams,
                      dtype=jnp.int16) -> tuple:
    """ShapeDtypeStructs of the four serving inputs: per-view I/Q frame
    stacks (F, RX, chirps, ADC). int16 by default — the DCA1000's native
    sample format (the serving fn casts on device, engine/pipeline.py:98-101);
    pass float32 to export a float-ingest variant."""
    shape = (frames, params.num_rx, params.num_chirp, params.num_adc_samples)
    return tuple(jax.ShapeDtypeStruct(shape, dtype) for _ in range(4))


def export_serving(model, variables, params: RadarParams = RadarParams(),
                   frames: int = 32, duration: int = None, group: int = 8,
                   num_frames: int = 8, dtype=jnp.int16,
                   platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Serialize the e2e serving program to portable bytes.

    `frames` fixes the stack size (static shapes on purpose); `duration`
    defaults to `frames` so one exported call is one clamped window
    sequence — matching how the streaming/serving paths feed it. Weights
    (`variables`) are captured as artifact constants. `platforms` embeds
    lowerings for each listed backend in ONE artifact (deploy the same file
    to a TPU pod and a CPU smoke-test host)."""
    run = make_e2e_infer(model, variables, params=params,
                         duration=duration if duration else frames,
                         group=group, num_frames=num_frames)
    exported = jexport.export(run, platforms=tuple(platforms))(
        *serving_arg_specs(frames, params, dtype))
    return MAGIC + exported.serialize()


def load_serving(blob: bytes):
    """Deserialize an export_serving artifact -> callable
    (hori_re, hori_im, vert_re, vert_im) -> (pred2d, maxvals). Wrap in
    jax.jit at the call site if you want persistent-cache compiles."""
    if not blob.startswith(MAGIC):
        raise ValueError("not a hupr_tpu serving artifact (bad magic)")
    return jexport.deserialize(bytearray(blob[len(MAGIC):])).call


def save_artifact(path: str, blob: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    import os
    os.replace(tmp, path)          # atomic, like engine/checkpoint.py


def load_artifact(path: str):
    with open(path, "rb") as f:
        return load_serving(f.read())


def artifact_info(blob: bytes) -> dict:
    """Cheap introspection of an artifact (no compile): input/output shapes,
    embedded platforms, calling-convention version."""
    if not blob.startswith(MAGIC):
        raise ValueError("not a hupr_tpu serving artifact (bad magic)")
    exported = jexport.deserialize(bytearray(blob[len(MAGIC):]))
    return {
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "calling_convention_version": exported.calling_convention_version,
        "bytes": len(blob),
    }
