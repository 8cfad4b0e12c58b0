"""Device-side window assembly for TRAINING (opt-in `TRAINING.chunkTrain`).

The classic train loop (reference tools/run.py:65-86 via DataLoader) makes
the host assemble a (G, C, 2, R, A, E) window per sample — 33.6 MB of memcpy
and host->device traffic each — although adjacent windows share G-1 of G
frames (datasets/dataset.py:126-138). BENCH_r02 measured the result: the
loader sustains ~46 samples/s while the chip consumes ~118 — real training
on this host is ~2.5x host-bound.

Chunk mode trains each step on a batch of B CONSECUTIVE windows of one
sequence. The host ships the union of their frames ONCE (exactly
B + G - 1 padded per-frame planes, ~6x less memcpy/transfer at the flagship
B=20, G=8) plus a (B, G) gather table derived from the SAME clamped
window_indices the classic dataset uses. On device, normalize + the MNet
chirp encode (BN-free, per-frame — models/hupr.py chirp_maps) run once per
unique frame, windows gather the encoded (R, A, F) maps, and the pose
network + loss + Adam update are byte-identical program structure to
steps.make_train_step. Autodiff sums each shared frame's cotangents across
the windows that gather it, so parameter gradients EQUAL the classic step's
on the same window batch (tests/test_chunk_train.py pins loss + updated
params); MNet also runs ~6x fewer frame encodes as a side effect.

Why it's opt-in (a documented training-semantics change, not a numerics
change): the epoch shuffles CHUNKS, not individual windows — every optimizer
step sees B consecutive, temporally-correlated windows, which alters
SGD/BatchNorm batch mixing relative to the reference's fully-shuffled epochs.
Per-step math on a given window batch is unchanged.

Applicability mirrors sequence-mode eval (engine/seq_eval.py): sampling
ratio 1, lossDecay == -1 (step counts differ from the classic epoch when
duration % B != 0, which would desynchronize the annealing trajectory), and
full-duration sequences (the reference's `index % duration` clamp only
defines in-range windows then). Multi-host runs shard BOTH padded axes by
process block (no frame halo needed: window gathers ride the same GSPMD
all-gather of encoded maps the single-host meshed step already uses), so
each host assembles 1/nproc of every chunk's frames and rows.

FUSED ADC mode (TRAINING.chunkSource: adc) goes one step further: instead
of center-chirp cube planes read from preprocessed .npy files, the host
ships each frame's raw int16 DCA1000 stream slice straight from the
capture .bin (data/adc.py) and the step runs decode + the full radar-cube
DSP on device before the MNet encode — the north-star "fused preprocessing
-> train" configuration (BASELINE config #5): no offline .npy hop, ~2.7x
fewer wire bytes than f32 planes, per-step gradients equal to the cube-fed
step (tests/test_adc_train.py).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hupr_tpu.engine.steps import TrainState
from hupr_tpu.ops.heatmap import bce_loss, generate_target_batch
from hupr_tpu.ops.normalize import normalize_radar_window


def chunk_table(windows: np.ndarray, duration: int, batch_size: int,
                pad_rows_to: int = 0) -> list[dict]:
    """Split the dataset's (N, G) window table into per-sequence chunks of
    `batch_size` consecutive windows.

    Returns one dict per chunk:
      lo        — first dataset frame index the chunk's windows touch
      n_frames  — number of distinct frames (contiguous: lo .. lo+n_frames-1)
      rel       — (max(batch_size, pad_rows_to), G) int32 gather into the
                  shipped frame stack; padded rows repeat the last real
                  window's row (masked out downstream)
      row0      — dataset index of the chunk's first window
      true_b    — number of real (unmasked) windows
    `pad_rows_to` pads every chunk's row count up (device_put refuses a
    sharded axis the mesh size doesn't divide, so a meshed step needs
    batch rows padded to a device-count multiple — mesh.shard_batch's
    padding, applied here at table-build time).
    Frames are contiguous because window_indices clamps into the window's own
    sequence, so the union of B consecutive rows is an integer interval.
    """
    n = windows.shape[0]
    rows_out = max(batch_size, pad_rows_to)
    chunks = []
    for seq_start in range(0, n, duration):
        seq_len = min(duration, n - seq_start)
        for s in range(0, seq_len, batch_size):
            true_b = min(batch_size, seq_len - s)
            rows = windows[seq_start + s:seq_start + s + true_b]
            lo = int(rows.min())
            hi = int(rows.max())
            rel = np.empty((rows_out, windows.shape[1]), np.int32)
            rel[:true_b] = rows - lo
            rel[true_b:] = rel[true_b - 1]
            chunks.append({"lo": lo, "n_frames": hi - lo + 1, "rel": rel,
                           "row0": seq_start + s, "true_b": true_b})
    return chunks


def _cube_frame_prep(x):
    """Default per-frame prep: shipped center-chirp cube planes
    (F, C, 2, R, A, E), possibly in the half-width wire format
    (SETUP.transferDtype) -> normalized model input (F, 1, C, 2, R, A, E)."""
    x = normalize_radar_window(x.astype(jnp.float32))
    return x[:, None]                               # frame axis as batch, G=1


def make_adc_frame_prep(radar_params=None, num_frames: int = 8):
    """Per-frame prep for FUSED ADC training: shipped raw int16 DCA1000
    stream slices (F, frame_samples) -> device-side decode (ops/dsp.
    decode_dca1000) -> radar cube DSP (radar_cube_single_frame, bit-exact
    vs the reference's generateHeatmap) -> center-chirp slice + normalize
    (engine/pipeline.cube_chirp_input). Deletes the offline .npy hop
    (reference preprocessing/process_iwr1843.py:180-196) from the train
    path entirely."""
    import jax

    from hupr_tpu.engine.pipeline import cube_chirp_input
    from hupr_tpu.ops.dsp import (RadarParams, decode_dca1000,
                                  radar_cube_single_frame)

    rp = radar_params if radar_params is not None else RadarParams()

    def prep(x):                                    # (F, S) int16
        frames = jax.vmap(lambda r: decode_dca1000(r, rp))(x)
        cubes = jax.vmap(lambda f: radar_cube_single_frame(f, rp))(frames)
        return cube_chirp_input(jnp.real(cubes), jnp.imag(cubes), num_frames)

    return prep


def make_chunk_train_step(model, tx, geometry=(14, 64, 256), mesh=None,
                          frame_prep=None):
    """Returns jitted step(state, batch, lr, alpha) -> (state, metrics),
    metrics-compatible with steps.make_train_step (lossDecay == -1 only —
    the chunk applicability gate guarantees it, so loss = loss1 + loss2).

    batch leaves (F/B both padded to mesh-size multiples when meshed —
    ChunkTrainLoader's pads; device_put refuses uneven shardings):
      hori, vert    per-frame payloads consumed by `frame_prep` — cube
                    planes (F, C, 2, R, A, E) by default, raw int16 ADC
                    stream slices (F, S) with make_adc_frame_prep
      rel           (B, G) int32 gather into the frame axis
      jointsGroup   (B, K, 2)
      mask          (B,) 1.0 real / 0.0 padded window rows

    With `mesh`, the frame payloads shard over the frame axis (the
    prep+encode are per-frame data parallelism) and the window batch/joints/
    mask shard over the batch axis; GSPMD inserts the all-gather of the
    encoded ~14 MB maps between the two, which rides ICI. Params/opt-state
    stay replicated.
    """
    num_keypoints, heatmap_size, img_size = geometry
    encode_frames = frame_prep if frame_prep is not None else _cube_frame_prep

    def step(state: TrainState, batch, lr, alpha):
        del alpha  # annealing is gated off (lossDecay == -1) in chunk mode
        rel, mask = batch["rel"], batch["mask"]

        def loss_fn(params):
            ra, re_m = model.apply(
                {"params": params}, encode_frames(batch["hori"]),
                encode_frames(batch["vert"]), method="chirp_maps")
            ra, re_m = ra[:, 0], re_m[:, 0]         # (F, R, A, Fc)
            # window b = encoded frames rel[b, :]: the clamped reference
            # window, gathered on device instead of memcpy'd on host
            ra_w, re_w = jnp.take(ra, rel, axis=0), jnp.take(re_m, rel, axis=0)

            (heatmap, gcn), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ra_w, re_w, True, mask, method="pose_from_maps",
                mutable=["batch_stats"])
            targets, _ = generate_target_batch(
                batch["jointsGroup"], num_keypoints=num_keypoints,
                heatmap_size=heatmap_size, img_size=img_size)
            k, h = targets.shape[1], targets.shape[2]
            loss1 = bce_loss(heatmap.reshape(-1, k, h, h), targets, mask)
            loss2 = bce_loss(gcn.reshape(-1, k, h, h), targets, mask)
            return loss1 + loss2, (loss1, loss2, mutated["batch_stats"])

        (loss, (loss1, loss2, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "loss1": loss1, "loss2": loss2}

    if mesh is not None:
        from hupr_tpu.parallel.mesh import batch_sharding, replicated
        shard, rep = batch_sharding(mesh), replicated(mesh)
        batch_sh = {"hori": shard, "vert": shard, "rel": shard,
                    "jointsGroup": shard, "mask": shard}
        # `rep` is a pytree PREFIX covering the whole TrainState/metrics tree
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(rep, batch_sh, rep, rep),
                       out_shardings=(rep, rep))
    return jax.jit(step, donate_argnums=(0,))


class ChunkTrainLoader:
    """Chunk-batch iterator over a HuPRDataset: yields ready-to-step dicts
    (frame planes + gather table + joints + mask), chunks shuffled with the
    same (seed, epoch)-keyed rng scheme as data.BatchLoader so epochs are
    reproducible. A one-chunk background prefetch overlaps the host frame
    reads with the device step, exactly like data.BatchLoader's queue."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 shuffle: bool = True, prefetch: int = 2,
                 pad_multiple: int = 1, transfer_dtype=np.float32,
                 process=None):
        """`pad_multiple`: mesh device count — both shipped axes (frame
        stack F, window rows B) pad up to a multiple of it so the meshed
        step's shardings are valid (device_put refuses uneven splits).
        `transfer_dtype`: wire format for the frame planes
        (SETUP.transferDtype via utils/transfer.py).
        `process=(pid, nproc)`: multi-host mode — this process assembles
        only ITS contiguous block of both padded global axes (the p-th
        device block owns the p-th frame/row block); every process derives
        the identical (seed, epoch)-keyed chunk order. Per-host wire bytes
        AND disk reads drop by nproc (SURVEY §2.10 'data loading sharded
        per host', now for the chunk path too)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.transfer_dtype = np.dtype(transfer_dtype)
        self.group = dataset.num_group_frames
        self.seed = seed
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.process = process
        self._epoch = 0
        m = max(1, int(pad_multiple))
        self.rows_pad = batch_size + (-batch_size) % m
        self.chunks = chunk_table(dataset.windows, dataset.duration,
                                  batch_size, pad_rows_to=self.rows_pad)
        f = batch_size + self.group - 1
        self.f_pad = f + (-f) % m
        if process is not None:
            nproc = process[1]
            if self.rows_pad % nproc or self.f_pad % nproc:
                raise ValueError(
                    f"process mode needs the padded axes (rows {self.rows_pad}"
                    f", frames {self.f_pad}) divisible by nproc={nproc}; "
                    f"pass pad_multiple = global device count")

    @staticmethod
    def applicable(dataset, cfg) -> bool:
        from hupr_tpu.engine.seq_eval import sequence_groups
        if dataset.sampling_ratio != 1:
            return False
        if cfg.TRAINING.lossDecay != -1:
            return False
        groups = sequence_groups(dataset.image_ids)
        return all(n == dataset.duration for _, n in groups)

    def __len__(self) -> int:
        return len(self.chunks)

    def _block(self, padded: int) -> tuple:
        """This process's contiguous index block [lo, hi) of a padded
        global axis (the whole axis single-process)."""
        if self.process is None:
            return 0, padded
        pid, nproc = self.process
        blk = padded // nproc
        return pid * blk, (pid + 1) * blk

    def _window_rows(self, chunk: dict) -> dict:
        """The window-axis leaves of one assembled batch: this process's
        row block of rel/joints/mask (global rows past true_b repeat the
        last real window, mask 0)."""
        ds = self.dataset
        true_b, row0 = chunk["true_b"], chunk["row0"]
        r_lo, r_hi = self._block(self.rows_pad)
        joints = np.stack([ds.joints[row0 + min(r, true_b - 1)]
                           for r in range(r_lo, r_hi)])
        mask = (np.arange(r_lo, r_hi) < true_b).astype(np.float32)
        return dict(rel=chunk["rel"][r_lo:r_hi], jointsGroup=joints,
                    mask=mask, trueB=true_b, fPad=self.f_pad,
                    rowsPad=self.rows_pad,
                    imageId=np.asarray(ds.image_ids[row0:row0 + true_b]))

    def _assemble(self, chunk: dict) -> dict:
        """Host side: ONE copy of each distinct frame into this process's
        block of the padded (F_pad, C, 2, R, A, E) stacks; pad frames repeat
        the last real frame (never gathered, but they must stay finite: a
        0-cotangent VJP through a NaN activation still poisons the
        gradient)."""
        ds = self.dataset
        nf = chunk["n_frames"]
        f_lo, f_hi = self._block(self.f_pad)
        # global frame g holds dataset frame lo + min(g, nf-1)
        idx = [chunk["lo"] + min(g, nf - 1) for g in range(f_lo, f_hi)]
        shape = (f_hi - f_lo, ds.num_frames, 2) + ds._inner_shape
        out = {}
        for key, paths in (("hori", ds.paths_hori), ("vert", ds.paths_vert)):
            frames = ds._frames([paths[i] for i in idx])
            arr = np.empty(shape, np.float32)
            for g, (re, im) in enumerate(frames):
                arr[g, :, 0] = re
                arr[g, :, 1] = im
            if self.transfer_dtype != np.float32:
                arr = arr.astype(self.transfer_dtype)
            out[key] = arr
        out.update(self._window_rows(chunk))
        return out

    def _order(self) -> list[int]:
        order = np.arange(len(self.chunks))
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        self._epoch += 1
        return [int(i) for i in order]

    def __iter__(self) -> Iterator[dict]:
        import queue
        import threading

        from hupr_tpu.utils.prefetch import stop_aware_put

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        done = object()
        failure: list = []
        stop = threading.Event()

        def worker():
            try:
                for i in self._order():
                    if not stop_aware_put(q, self._assemble(self.chunks[i]),
                                          stop):
                        return
            except BaseException as exc:
                failure.append(exc)
            finally:
                stop_aware_put(q, done, stop)

        threading.Thread(target=worker, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is done:
                    if failure:
                        raise failure[0]
                    return
                yield item
        finally:
            stop.set()


def make_adc_chunk_train_step(model, tx, geometry=(14, 64, 256), mesh=None,
                              radar_params=None, num_frames: int = 8):
    """Chunk train step over raw int16 ADC stream slices: device-side
    decode + DSP + normalize + encode + window gather + loss + Adam in ONE
    XLA program (TRAINING.chunkSource: adc). Gradients equal the cube-fed
    chunk step's on the same windows (the DSP consumes data, not params —
    tests/test_adc_train.py pins loss/params/BN stats)."""
    return make_chunk_train_step(
        model, tx, geometry, mesh=mesh,
        frame_prep=make_adc_frame_prep(radar_params, num_frames))


class ADCChunkLoader(ChunkTrainLoader):
    """ChunkTrainLoader over raw capture .bin files (data/adc.py): ships
    each chunk's frame union as int16 DCA1000 stream slices — the sensor's
    native sample format, ~2.7x fewer wire bytes than f32 cube planes —
    and never touches the preprocessed .npy cubes. SETUP.transferDtype
    does not apply (int16 is already the floor)."""

    def __init__(self, dataset, batch_size: int, adc_source, seed: int = 0,
                 shuffle: bool = True, prefetch: int = 2,
                 pad_multiple: int = 1, process=None):
        super().__init__(dataset, batch_size, seed=seed, shuffle=shuffle,
                         prefetch=prefetch, pad_multiple=pad_multiple,
                         process=process)
        self.adc = adc_source

    @staticmethod
    def applicable(dataset, cfg, adc_source=None) -> bool:
        if not ChunkTrainLoader.applicable(dataset, cfg):
            return False
        return adc_source is not None and \
            adc_source.available(dataset.image_ids)

    def _assemble(self, chunk: dict) -> dict:
        ds = self.dataset
        nf = chunk["n_frames"]
        f_lo, f_hi = self._block(self.f_pad)
        real_n = max(0, min(f_hi, nf) - f_lo)   # real frames in this block
        out = {}
        for view in ("hori", "vert"):
            arr = np.empty((f_hi - f_lo, self.adc.frame_samples), np.int16)
            if real_n > 0:
                self.adc.read_frames(ds.image_ids, chunk["lo"] + f_lo,
                                     real_n, view, arr)
                arr[real_n:] = arr[real_n - 1]   # clamp rows: repeat last
            else:
                # the whole block is clamp rows (short chunk tail)
                last = np.empty((1, self.adc.frame_samples), np.int16)
                self.adc.read_frames(ds.image_ids, chunk["lo"] + nf - 1,
                                     1, view, last)
                arr[:] = last
            out[view] = arr
        out.update(self._window_rows(chunk))
        return out


def device_put_chunk(batch: dict, mesh=None) -> tuple[dict, int]:
    """Place one assembled chunk batch on device (frame payloads on the
    frame axis, window-keyed leaves on the batch axis when meshed). Under a
    multi-process runtime each process holds only its block of every axis
    (ChunkTrainLoader process mode) and the leaves become global jax.Arrays
    (jax.make_array_from_process_local_data). Returns (device_batch,
    true_b)."""
    true_b = int(batch["trueB"])
    leaves = {k: batch[k] for k in ("hori", "vert", "rel", "jointsGroup",
                                    "mask")}
    if mesh is not None and jax.process_count() > 1:
        from hupr_tpu.parallel.mesh import batch_sharding
        shard = batch_sharding(mesh)
        axis_rows = {"hori": batch["fPad"], "vert": batch["fPad"],
                     "rel": batch["rowsPad"], "jointsGroup": batch["rowsPad"],
                     "mask": batch["rowsPad"]}
        dev = {}
        for k, v in leaves.items():
            v = np.asarray(v)
            dev[k] = jax.make_array_from_process_local_data(
                shard, v, global_shape=(int(axis_rows[k]),) + v.shape[1:])
    elif mesh is not None and mesh.devices.size > 1:
        from hupr_tpu.parallel.mesh import batch_sharding
        shard = batch_sharding(mesh)
        dev = {k: jax.device_put(v, shard) for k, v in leaves.items()}
    else:
        dev = {k: jnp.asarray(v) for k, v in leaves.items()}
    return dev, true_b
