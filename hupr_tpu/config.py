"""Config system: identical YAML schema + CLI flag surface to the reference.

Reference parity: /root/reference/main.py:7-33 wraps a yaml.safe_load dict in a
recursive attribute object and exposes 8 argparse flags; split names are later
fetched with eval('cfg.DATASET.'+phase+'Name') (/root/reference/datasets/base.py:56).
Here the same YAML schema loads into typed dataclasses with validation, no eval().
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import warnings
from dataclasses import dataclass, field
from typing import List, Optional

import yaml


@dataclass
class DatasetConfig:
    upsamplingFactor: int = 4
    duration: int = 600
    heatmapSize: int = 64
    imgSize: int = 256
    rangeSize: int = 64
    azimuthSize: int = 64
    elevationSize: int = 8
    numKeypoints: int = 14
    numFrames: int = 8          # chirps per frame consumed by the model
    numGroupFrames: int = 8     # temporal window of frames
    numChirps: int = 16         # chirps stored per frame (center-16 of 64)
    dataDir: str = "data/HuPR"
    # Root of the RAW capture files (`single_N/{hori,vert}/adc_data.bin`,
    # the preprocessing CLI's input layout — e.g.
    # "preprocessing/raw_data/iwr1843/HuPR"). Consumed by fused ADC
    # training (TRAINING.chunkSource: adc); empty = disabled.
    adcDir: str = ""
    # Field overrides for ops/dsp.RadarParams (the capture geometry the
    # device-side DSP assumes). Empty = the IWR1843 defaults, which match
    # the flagship 64x64x8 cube geometry.
    adcParams: dict = field(default_factory=dict)

    def radar_params(self):
        """RadarParams for fused ADC paths; validated against the cube
        geometry this config declares (the DSP output must be the shape the
        .npy cubes would have had)."""
        from hupr_tpu.ops.dsp import RadarParams
        rp = RadarParams(**self.adcParams)
        if rp.num_angle_bins != self.azimuthSize \
                or rp.num_angle_bins != self.rangeSize \
                or rp.num_kept_chirps != self.numChirps \
                or rp.num_ele_bins != self.elevationSize:
            raise ValueError(
                f"DATASET.adcParams geometry (angle {rp.num_angle_bins}, "
                f"chirps {rp.num_kept_chirps}, elev {rp.num_ele_bins}) does "
                f"not produce this config's cube shape ({self.rangeSize}, "
                f"{self.azimuthSize}, {self.numChirps}, "
                f"{self.elevationSize})")
        return rp
    testName: List[int] = field(default_factory=list)
    valName: List[int] = field(default_factory=list)
    trainName: List[int] = field(default_factory=list)
    idxToJoints: List[str] = field(default_factory=lambda: [
        "R_Hip", "R_Knee", "R_Ankle", "L_Hip", "L_Knee",
        "L_Ankle", "Neck", "Head", "L_Shoulder", "L_Elbow",
        "L_Wrist", "R_Shoulder", "R_Elbow", "R_Wrist",
    ])

    def split_names(self, phase: str) -> List[int]:
        """Safe replacement for the reference's eval('cfg.DATASET.'+phase+'Name')."""
        if phase not in ("train", "val", "test"):
            raise ValueError(f"Invalid phase: {phase}")
        return {"train": self.trainName, "val": self.valName,
                "test": self.testName}[phase]


@dataclass
class ModelConfig:
    numFilters: int = 32
    # TPU-specific knobs (absent in reference; defaults keep reference behavior)
    computeDtype: str = "float32"   # "float32" | "bfloat16" matmul/conv compute
    remat: bool = False             # jax.checkpoint the encoder stages
    attention: str = "xla"          # "xla" einsum | "pallas" fused VMEM kernel


@dataclass
class TrainingConfig:
    batchSize: int = 20
    epochs: int = 200
    lr: float = 1e-4
    warmupEpoch: int = -1
    warmupGrowth: float = 1.005
    lrDecay: float = 0.999
    lrDecayIter: int = 2000
    lossDecay: float = -1
    optimizer: str = "adam"
    weightDecay: float = 1e-4
    # device-side window assembly for training (engine/chunk_train.py):
    # each step trains batchSize CONSECUTIVE windows of one sequence, the
    # host ships their frame union once (~6x less memcpy/transfer), windows
    # gather on device. Per-step gradients equal the classic step's
    # (tests/test_chunk_train.py) but the epoch shuffles chunks, not
    # windows — a training-semantics change, hence opt-in. Auto-falls back
    # to the classic loader when inapplicable (sampling_ratio != 1,
    # lossDecay != -1, ragged sequences). Multi-host runs shard the chunk
    # assembly per host (each process builds only its block of the padded
    # frame/row axes; no frame halo — the window gather rides the same
    # GSPMD all-gather the meshed step already has).
    chunkTrain: bool = False
    # What the chunk loader ships per frame (chunkTrain only):
    #   "cubes" — center-chirp planes of the preprocessed .npy radar cubes
    #             (the reference's stored format)
    #   "adc"   — raw int16 DCA1000 stream slices straight from the capture
    #             .bin files (DATASET.adcDir); decode + DSP run inside the
    #             train step (engine/chunk_train.make_adc_frame_prep) — the
    #             fused preprocessing->train path, no .npy hop. Falls back
    #             to "cubes" (with a printed notice) when the captures are
    #             missing/incomplete.
    chunkSource: str = "cubes"


@dataclass
class TestConfig:
    batchSize: int = 32
    plotImgDir: str = ""
    # device-side window assembly for eval (engine/seq_eval.py): ships each
    # frame once instead of a G-frame window per sample. Same math as the
    # classic loader path; results equal up to f32 reassociation between the
    # two program shapes (near-tied argmax bins can flip — pinned
    # batch-for-batch by tests/test_seq_eval.py). Auto-falls back to the
    # classic loader when inapplicable (sampling_ratio != 1, lossDecay != -1,
    # ragged sequences).
    sequenceEval: bool = True
    # What sequence-mode eval ships per frame (sequenceEval only):
    #   "cubes" — preprocessed .npy cube planes (4 MB f32 / 2.1 MB bf16
    #             per frame with SETUP.transferDtype)
    #   "adc"   — raw int16 DCA1000 stream slices straight from the capture
    #             .bin files (DATASET.adcDir, 768 KB/frame); decode + DSP
    #             run inside the encode program — the eval-side twin of
    #             TRAINING.chunkSource. Falls back to cubes (with a notice)
    #             when the captures don't cover the split.
    sequenceSource: str = "cubes"


@dataclass
class SetupConfig:
    numWorkers: int = 4
    # Wire format for the host->device radar planes (utils/transfer.py):
    # "float32" (default, bit-faithful reference numerics) or "bfloat16" /
    # "float16" — half the bytes on the host->device link for every
    # transfer-bound path (classic loader, chunk train, sequence eval).
    # Compute stays f32: planes are cast back at XLA program entry BEFORE
    # normalization, so only the raw cube values are quantized (~3 decimal
    # digits for bfloat16). Opt-in: a numerics change (near-tied argmax
    # bins can flip) — tests/test_transfer.py bounds it.
    transferDtype: str = "float32"


@dataclass
class Config:
    DATASET: DatasetConfig = field(default_factory=DatasetConfig)
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    TRAINING: TrainingConfig = field(default_factory=TrainingConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    SETUP: SetupConfig = field(default_factory=SetupConfig)


def _build(dc_type, d: dict, section: str):
    """Build a dataclass from a dict; unknown keys are accepted (the
    reference's attr-object tolerates anything) but WARNED about, so a
    typo'd `lrDeacy:` can't silently train with the default."""
    names = {f.name for f in dataclasses.fields(dc_type)}
    unknown = sorted(set(d) - names)
    if unknown:
        warnings.warn(
            f"config section {section}: unknown key(s) {unknown} ignored "
            f"(valid keys: {sorted(names)})", stacklevel=3)
    return dc_type(**{k: v for k, v in d.items() if k in names})


def config_from_dict(d: dict) -> Config:
    sections = ("DATASET", "MODEL", "TRAINING", "TEST", "SETUP")
    unknown = sorted(set(d) - set(sections))
    if unknown:
        warnings.warn(f"config: unknown section(s) {unknown} ignored "
                      f"(valid sections: {list(sections)})", stacklevel=2)
    return Config(
        DATASET=_build(DatasetConfig, d.get("DATASET", {}), "DATASET"),
        MODEL=_build(ModelConfig, d.get("MODEL", {}), "MODEL"),
        TRAINING=_build(TrainingConfig, d.get("TRAINING", {}), "TRAINING"),
        TEST=_build(TestConfig, d.get("TEST", {}), "TEST"),
        SETUP=_build(SetupConfig, d.get("SETUP", {}), "SETUP"),
    )


def _deep_merge(base: dict, override: dict) -> dict:
    """Override wins; dict values merge recursively (so a variant config can
    set MODEL.attention without restating MODEL.numFilters)."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config_dict(path: str, _seen=()) -> dict:
    """YAML -> dict, honoring an optional top-level `BASE: <file>` include
    (resolved relative to the including file's directory; chains allowed).
    Additive over the reference's schema: configs without BASE parse
    identically, and the TPU variant configs stay small overlays instead of
    triplicating the 235-line sequence-split lists."""
    real = os.path.realpath(path)
    if real in _seen:
        raise ValueError(f"config BASE include cycle at {path}")
    with open(path, "r") as f:
        # empty / comments-only YAML parses to None -> all-defaults Config
        d = yaml.safe_load(f) or {}
    base = d.pop("BASE", None)
    if base:
        if not os.path.isabs(base):
            base = os.path.join(os.path.dirname(path) or ".", base)
        d = _deep_merge(load_config_dict(base, _seen + (real,)), d)
    return d


def load_config(path: str) -> Config:
    return config_from_dict(load_config_dict(path))


def build_arg_parser() -> argparse.ArgumentParser:
    """The reference's 8 CLI flags (/root/reference/main.py:17-30), minus the
    unsafe type=eval on --gpuIDs (here a plain comma list, used only as a
    truthiness check in the reference)."""
    p = argparse.ArgumentParser(description="HuPR TPU-native framework")
    p.add_argument("--seed", type=int, default=0, metavar="S",
                   help="random seed (default: 0)")
    p.add_argument("--dir", type=str, default="test", metavar="B",
                   help="directory of saving/loading")
    p.add_argument("--visDir", type=str, default="none", metavar="B",
                   help="directory of visualization")
    p.add_argument("--config", type=str, default="mscsa_prgcn.yaml", metavar="B",
                   help="config file name under ./config/")
    p.add_argument("--gpuIDs", default="0", type=str,
                   help="accepted for reference CLI compatibility (ignored on TPU)")
    p.add_argument("--eval", action="store_true")
    p.add_argument("-sr", "--sampling_ratio", type=int, default=1,
                   help="sampling ratio for training/test (default: 1)")
    p.add_argument("--keypoints", action="store_true",
                   help="print out the APs of all keypoints")
    return p


def resolve_config_path(name: str) -> str:
    """Reference always loads './config/<name>' (/root/reference/main.py:31);
    keep that, but also accept absolute/relative paths that exist as given."""
    if os.path.exists(name):
        return name
    return os.path.join(".", "config", name)


def apply_platform_env() -> None:
    """Honor HUPR_PLATFORM (e.g. `cpu` for a chip-less smoke run) in every
    CLI. Must run before jax backend init; threaded through jax.config
    because some platform plugins ignore the JAX_PLATFORMS env var."""
    platform = os.environ.get("HUPR_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
