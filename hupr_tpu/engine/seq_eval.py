"""Sequence-mode evaluation: device-side window assembly for the eval loop.

The classic eval path (reference tools/run.py:35-63 via DataLoader) makes the
host assemble a (G, C, 2, R, A, E) window per sample — 33.6 MB of memcpy and
host->device traffic per frame, G-1/G of it redundant because adjacent eval
windows share G-1 of G frames (datasets/dataset.py:126-138). On a TPU host
the device finishes a window in ~2 ms while the host spends ~170 ms building
it: eval is loader-bound.

Sequence mode ships each frame ONCE as raw per-frame chirp planes (4 MB) and
moves everything else on device, reusing the serving pipeline's dedup
(engine/pipeline.py): normalize + MNet chirp encoding run per frame, the
sliding window stacks encoded (R, A, F) maps via static slices, and pose
decoding + loss run per TEST.batchSize window batch. Outputs are the same
eval_step dict, batch for batch, so the Runner's logging/keypoint-export/
visualization logic is unchanged — and results are equal to the classic path
(tests/test_seq_eval.py pins it).

Applicability (falls back to the classic loader otherwise):
  * sampling_ratio == 1 (every frame, in order — the benchmark eval setting)
  * lossDecay == -1 (annealing advances per computeLoss call; batch count
    differs between the two paths when sequences don't divide the batch)
  * every sequence in the split has exactly DATASET.duration frames: the
    reference's clamp (`index % duration`) only defines in-range windows in
    that case (a shorter sequence makes the global window_indices table
    point past the end of the data — the classic path crashes there too).

With a multi-device mesh, the encode program shards the frame axis and the
pose program shards the window-batch axis (params replicated, encoded maps
replicated between the two) whenever the axis divides the device count.

FUSED ADC mode (TEST.sequenceSource: adc): the host ships raw int16 DCA1000
capture slices instead of cube planes and the encode program runs decode +
the full radar-cube DSP on device — evaluation straight from the sensor's
.bin files with no offline .npy hop, completing BASELINE config #5 ("fused
preprocessing -> train -> eval") for the eval half (training's twin is
TRAINING.chunkSource, engine/chunk_train.py). Results equal the cube-fed
path per tests/test_adc_eval.py (the cubes ARE the offline product of the
same DSP, pinned bit-exact in test_dsp_differential.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hupr_tpu.ops.heatmap import bce_loss, generate_target_batch, get_max_preds
from hupr_tpu.ops.normalize import normalize_radar_window


def sequence_groups(image_ids: List[int]) -> List[Tuple[int, int]]:
    """Split the dataset's image_id list (frame + seq*100000, annot.py) into
    contiguous per-sequence (start, length) runs, preserving order."""
    groups = []
    start = 0
    for i in range(1, len(image_ids) + 1):
        if i == len(image_ids) or image_ids[i] // 100000 != \
                image_ids[start] // 100000:
            groups.append((start, i - start))
            start = i
    return groups


def make_sequence_encoder(model, group: int, mesh=None):
    """Jitted (variables, hre, him, vre, vim, pad_to) -> (ra_pad, re_pad).

    Inputs are per-frame chirp planes (F, C, R, A, E) f32 per component/view
    (the dataset's cached frame format). Outputs are chirp-encoded maps
    (pad_to + G - 1, R, A, Fc) per view, replicate-padded for window slicing
    (pipeline.replicate_pad): frames beyond F replicate the last frame so a
    final partial window batch stays shape-static (those windows are masked
    out of the loss and dropped on the host).

    With `mesh`, the per-frame encode is sharded over the frame axis (the
    caller guarantees F divides the device count); outputs are replicated
    for the pose program's dynamic window slicing."""
    from hupr_tpu.engine.pipeline import replicate_pad

    def encode(variables, hre, him, vre, vim, pad_to: int):
        def prep(re, im):
            x = jnp.stack([re, im], axis=2)          # (F, C, 2, R, A, E)
            # wire format may be half-width (SETUP.transferDtype)
            x = normalize_radar_window(x.astype(jnp.float32))
            return x[:, None]                        # (F, 1, C, 2, R, A, E)

        ra, re_m = model.apply(variables, prep(hre, him), prep(vre, vim),
                               method="chirp_maps")
        ra, re_m = ra[:, 0], re_m[:, 0]              # (F, R, A, Fc)
        return (replicate_pad(ra, group, pad_to),
                replicate_pad(re_m, group, pad_to))

    if mesh is not None:
        from hupr_tpu.parallel.mesh import batch_sharding, replicated
        shard, rep = batch_sharding(mesh), replicated(mesh)
        # pad_to must be positional: pjit rejects kwargs with in_shardings
        return jax.jit(encode, static_argnums=(5,),
                       in_shardings=(rep,) + (shard,) * 4,
                       out_shardings=(rep, rep))
    return jax.jit(encode, static_argnums=(5,))


def make_adc_sequence_encoder(model, group: int, mesh=None,
                              radar_params=None, num_frames: int = 8):
    """Jitted (variables, hori, vert, pad_to) -> (ra_pad, re_pad) over RAW
    int16 DCA1000 stream slices (F, frame_samples) per view: device-side
    decode + radar-cube DSP (bit-exact vs the reference's generateHeatmap)
    + normalize + MNet chirp encode in one program — the eval-side twin of
    chunk_train.make_adc_frame_prep, deleting the offline .npy hop
    (reference preprocessing/process_iwr1843.py:180-196) from evaluation.
    Wire: 768 KB int16/frame vs ~4.2 MB f32 (2.1 MB bf16) cube planes."""
    from hupr_tpu.engine.chunk_train import make_adc_frame_prep
    from hupr_tpu.engine.pipeline import replicate_pad

    prep = make_adc_frame_prep(radar_params, num_frames)

    def encode(variables, hori, vert, pad_to: int):
        ra, re_m = model.apply(variables, prep(hori), prep(vert),
                               method="chirp_maps")
        ra, re_m = ra[:, 0], re_m[:, 0]              # (F, R, A, Fc)
        return (replicate_pad(ra, group, pad_to),
                replicate_pad(re_m, group, pad_to))

    if mesh is not None:
        from hupr_tpu.parallel.mesh import batch_sharding, replicated
        shard, rep = batch_sharding(mesh), replicated(mesh)
        return jax.jit(encode, static_argnums=(3,),
                       in_shardings=(rep, shard, shard),
                       out_shardings=(rep, rep))
    return jax.jit(encode, static_argnums=(3,))


def make_window_eval_step(model, group: int, geometry=(14, 64, 256),
                          batch_size: int = 32, mesh=None):
    """Jitted (variables, ra_pad, re_pad, joints, mask, start) -> the
    eval_step output dict for the `batch_size` consecutive windows beginning
    at frame `start` (steps.make_eval_step parity, lossDecay == -1).

    With `mesh`, the window-batch axis is sharded across devices (the caller
    guarantees batch_size divides the device count); the padded maps stay
    replicated so every shard slices its own windows locally."""
    num_keypoints, heatmap_size, img_size = geometry

    def step(variables, ra_pad, re_pad, joints, mask, start):
        def windows(maps_pad):
            raw = jax.lax.dynamic_slice_in_dim(
                maps_pad, start, batch_size + group - 1, axis=0)
            # window b = padded frames [b, b+G): same slice-stack as
            # pipeline.window_stack, batched from a dynamic offset
            return jnp.stack([raw[j:j + batch_size] for j in range(group)],
                             axis=1)                 # (B, G, R, A, Fc)

        heatmap, gcn = model.apply(variables, windows(ra_pad),
                                   windows(re_pad), method="pose_from_maps")
        targets, _ = generate_target_batch(
            joints, num_keypoints=num_keypoints, heatmap_size=heatmap_size,
            img_size=img_size)
        k, h = targets.shape[1], targets.shape[2]
        main = heatmap.reshape(-1, k, h, h)
        refined = gcn.reshape(-1, k, h, h)
        loss1 = bce_loss(main, targets, mask)
        loss2 = bce_loss(refined, targets, mask)
        pred2d, maxvals = get_max_preds(refined)
        gt_dec, _ = get_max_preds(targets)
        return {"loss": loss1 + loss2, "loss1": loss1, "loss2": loss2,
                "pred2d": pred2d, "gt2d": gt_dec, "maxvals": maxvals,
                "predHeatmap": refined}

    if mesh is not None:
        from hupr_tpu.parallel.mesh import batch_sharding, replicated
        shard, rep = batch_sharding(mesh), replicated(mesh)
        out_sh = {"loss": rep, "loss1": rep, "loss2": rep, "pred2d": shard,
                  "gt2d": shard, "maxvals": shard, "predHeatmap": shard}
        return jax.jit(step, in_shardings=(rep, rep, rep, shard, shard, rep),
                       out_shardings=out_sh)
    return jax.jit(step)


class SequenceEvaluator:
    """Drives eval over per-sequence frame planes with device windowing.

    eval_batches(dataset, variables) yields (out, image_ids, bbox, true_b)
    tuples equivalent to the classic device_prefetch + eval_step loop."""

    def __init__(self, model, cfg, mesh=None, adc_source=None):
        """`adc_source`: an ADCFrameSource (TEST.sequenceSource: adc) —
        evaluation then ships raw int16 capture slices and runs the full
        DSP on device instead of reading preprocessed .npy cubes."""
        from hupr_tpu.utils.transfer import transfer_dtype
        d = cfg.DATASET
        self.transfer_dtype = transfer_dtype(
            getattr(cfg.SETUP, "transferDtype", "float32"))
        self.group = d.numGroupFrames
        self.duration = d.duration
        self.batch_size = cfg.TEST.batchSize
        self.geometry = (d.numKeypoints, d.heatmapSize, d.imgSize)
        self.adc = adc_source
        # shard only when BOTH axes divide the mesh (the flagship 600/32-on-8
        # case does) — all-or-nothing so the encode outputs and pose inputs
        # agree on placement; otherwise run single-program, still correct
        ndev = mesh.size if mesh is not None else 1
        if ndev > 1 and self.duration % ndev == 0 \
                and self.batch_size % ndev == 0:
            from hupr_tpu.parallel.mesh import batch_sharding, replicated
            self._shard, self._rep = batch_sharding(mesh), replicated(mesh)
        else:
            mesh = None
            self._shard = self._rep = None
        if adc_source is not None:
            self._encode = make_adc_sequence_encoder(
                model, self.group, mesh, d.radar_params(), d.numFrames)
        else:
            self._encode = make_sequence_encoder(model, self.group, mesh)
        self._step = make_window_eval_step(model, self.group, self.geometry,
                                           self.batch_size, mesh)

    @staticmethod
    def applicable(dataset, cfg) -> bool:
        if dataset.sampling_ratio != 1:
            return False
        if cfg.TRAINING.lossDecay != -1:
            return False
        # the reference clamp (index % duration) only defines in-range
        # windows for full-duration sequences; shorter ones send the global
        # window table past the end of the data in BOTH paths
        groups = sequence_groups(dataset.image_ids)
        return all(n == dataset.duration for _, n in groups)

    @staticmethod
    def adc_applicable(dataset, cfg, adc_source) -> bool:
        """Fused-ADC eval additionally needs the capture .bin files to
        cover the split (same gate as ADCChunkLoader.applicable)."""
        if not SequenceEvaluator.applicable(dataset, cfg):
            return False
        return adc_source is not None and \
            adc_source.available(dataset.image_ids)

    def _load_planes(self, dataset, start: int, length: int):
        """Host side: one sequence's frame payload — raw int16 capture
        slices in ADC mode (768 KB/frame, the sensor-native floor), else
        per-frame (C, R, A, E) cube planes (4 MB/frame f32; the classic
        loader moves 33.6 MB/window)."""
        if self.adc is not None:
            out = []
            for view in ("hori", "vert"):
                arr = np.empty((length, self.adc.frame_samples), np.int16)
                self.adc.read_frames(dataset.image_ids, start, length,
                                     view, arr)
                out.append(arr)
            return out                               # [hori, vert] int16
        idx = range(start, start + length)
        out = []
        for paths in (dataset.paths_hori, dataset.paths_vert):
            frames = dataset._frames([paths[i] for i in idx])
            for c in (0, 1):
                p = np.stack([f[c] for f in frames])
                if self.transfer_dtype != np.float32:
                    p = p.astype(self.transfer_dtype)  # half-width wire
                out.append(p)
        return out                                   # [hre, him, vre, vim]

    def eval_batches(self, dataset, variables,
                     groups=None) -> Iterator[tuple]:
        """`groups`: optional subset of sequence_groups(dataset.image_ids)
        (start, length) runs to evaluate — multi-host eval hands each
        process its own share."""
        from hupr_tpu.utils.prefetch import stop_aware_put

        if groups is None:
            groups = sequence_groups(dataset.image_ids)
        # place the parameter tree on device ONCE: callers may hand host
        # numpy (multi-host eval fetches the globally-sharded state to host
        # first), and leaving it host-side would re-transfer the full tree
        # on every jitted encode/step call — ~20 uploads per sequence
        variables = (jax.device_put(variables, self._rep)
                     if self._rep is not None else jax.device_put(variables))
        stop = threading.Event()

        # one-sequence lookahead: load sequence s+1 while the device chews s.
        # Puts are stop-aware so an abandoned generator releases the thread
        # (and its ~2.4 GB of planes) instead of pinning them forever.
        def put(q, item) -> bool:
            return stop_aware_put(q, item, stop)

        def producer(q):
            try:
                for start, length in groups:
                    if not put(q, (start, length,
                                   self._load_planes(dataset, start, length))):
                        return
            except BaseException as exc:    # propagate to the consumer
                put(q, exc)
            finally:
                put(q, None)

        q: queue.Queue = queue.Queue(maxsize=1)
        threading.Thread(target=producer, args=(q,), daemon=True).start()

        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                start, length, planes = item
                n_batches = -(-length // self.batch_size)
                pad_to = n_batches * self.batch_size
                if self._shard is not None:
                    # meshed programs need explicitly placed inputs (jit
                    # refuses to auto-shard numpy under multi-process
                    # runtimes; pre-placement is also the faster path)
                    planes = [jax.device_put(p, self._shard) for p in planes]
                ra_pad, re_pad = self._encode(variables, *planes, pad_to)
                for b in range(n_batches):
                    s = b * self.batch_size
                    true_b = min(self.batch_size, length - s)
                    joints = np.zeros(
                        (self.batch_size,) + dataset.joints.shape[1:],
                        dtype=np.float32)
                    joints[:true_b] = \
                        dataset.joints[start + s:start + s + true_b]
                    mask = np.zeros((self.batch_size,), np.float32)
                    mask[:true_b] = 1.0
                    if self._shard is not None:
                        joints = jax.device_put(joints, self._shard)
                        mask = jax.device_put(mask, self._shard)
                        s_dev = jax.device_put(np.int32(s), self._rep)
                    else:
                        joints, mask = jnp.asarray(joints), jnp.asarray(mask)
                        s_dev = jnp.asarray(s, jnp.int32)
                    out = self._step(variables, ra_pad, re_pad,
                                     joints, mask, s_dev)
                    image_ids = np.asarray(
                        dataset.image_ids[start + s:start + s + true_b])
                    bbox = dataset.bboxes[start + s:start + s + true_b]
                    yield out, image_ids, bbox, true_b
        finally:
            stop.set()      # consumer finished or bailed: release producer
