"""Runner (L4): training/eval orchestration.

Parity: tools/base.py (BaseRunner) + tools/run.py (Runner). Behavior kept:
  * ./logs/<dir> checkpoints: best-by-val-AP, latest each epoch, every 5
  * warmup back-computation of the initial LR (run.py:30-32) and the
    warmup-growth/decay schedule applied at batch 0 and every lrDecayIter
    batches (run.py:81-82, base.py:66-72)
  * keypoint export: argmax coords x upsamplingFactor, vis=1, xywh->center/
    scale with 1.25 inflation and pixel_std 200, score 1.0
    (base.py:49-64,124-152) -> {val,test}_results.json
  * per-epoch val evaluation, loss-list JSONs, tqdm logging
TPU redesign: one fused jitted step per batch on a data-parallel mesh
(hupr_tpu.parallel), host only schedules LR scalars and writes JSON.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from hupr_tpu.data import BatchLoader, get_dataset
from hupr_tpu.engine.checkpoint import (
    AsyncCheckpointer, find_checkpoint, load_checkpoint,
    load_torch_checkpoint)
from hupr_tpu.engine.logger import Logger
from hupr_tpu.engine.steps import (
    init_state, make_eval_step, make_optimizer, make_train_step)
from hupr_tpu.models import build_model
from hupr_tpu.parallel import make_mesh, replicate_state
from hupr_tpu.parallel.mesh import device_prefetch


def xywh_to_center_scale(x, y, w, h, aspect_ratio=1.0, pixel_std=200.0):
    """bbox -> COCO center/scale with 1.25 inflation (base.py:49-64)."""
    center = np.array([x + w * 0.5, y + h * 0.5], dtype=np.float32)
    if w > aspect_ratio * h:
        h = w * 1.0 / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w / pixel_std, h / pixel_std], dtype=np.float32)
    if center[0] != -1:
        scale = scale * 1.25
    return center, scale


class Runner:
    def __init__(self, args, cfg, mesh=None):
        self.args = args
        self.cfg = cfg
        np.random.seed(args.seed)
        self.dir = os.path.join("./logs", args.dir)
        self.vis_dir = os.path.join("./visualization", args.visDir)
        os.makedirs(self.dir, exist_ok=True)
        if args.visDir != "none":
            os.makedirs(self.vis_dir, exist_ok=True)

        d = cfg.DATASET
        self.heatmap_size = d.heatmapSize
        self.img_size = d.imgSize
        self.num_keypoints = d.numKeypoints
        self.img_heatmap_ratio = d.imgSize / d.heatmapSize
        self.start_epoch = 0

        self.mesh = mesh if mesh is not None else make_mesh()

        # multi-host (HUPR_MULTIHOST=1): data loading sharded per host —
        # every process assembles only its slice of each padded global batch.
        # This block runs BEFORE any jit compile: the checks fail fast, and
        # the device-collective warm-up must happen while processes are
        # still tightly synchronized (compile times skew across processes
        # when one hits the persistent cache and another doesn't)
        self.n_proc = jax.process_count()
        self.pid = jax.process_index()
        ndev = self.mesh.devices.size
        t = cfg.TRAINING
        mh = {}
        if self.n_proc > 1:
            mh = dict(process=(self.pid, self.n_proc),
                      padded_rows=t.batchSize + (-t.batchSize) % ndev)
            from hupr_tpu.parallel import multihost
            # the rank-file eval merge + process-0 checkpointing need a
            # filesystem all processes share — fail now, not after epoch 0
            multihost.assert_shared_dir(self.dir)
            multihost.warmup_device_collectives(self.mesh)

        self.model = build_model(cfg)
        self.tx = make_optimizer(cfg)
        self.state = init_state(self.model, cfg, jax.random.PRNGKey(args.seed),
                                tx=self.tx)
        self.state = replicate_state(self.state, self.mesh)
        geometry = (d.numKeypoints, d.heatmapSize, d.imgSize)
        self.train_step = make_train_step(self.model, self.tx,
                                          cfg.TRAINING.lossDecay, geometry)
        self.eval_step = make_eval_step(self.model, cfg.TRAINING.lossDecay,
                                        geometry)
        self._seq_eval = None   # built lazily on first sequence-mode eval

        from hupr_tpu.utils.transfer import transfer_dtype
        wire = transfer_dtype(getattr(cfg.SETUP, "transferDtype", "float32"))
        self.train_set, self.train_loader = None, None
        self._chunk_loader, self._chunk_step = None, None
        if not args.eval:
            self.train_set = get_dataset("train", cfg, args.sampling_ratio)
            if getattr(t, "chunkTrain", False):
                from hupr_tpu.engine.chunk_train import (
                    ChunkTrainLoader, make_chunk_train_step)
                # multi-host: every process assembles only its block of the
                # padded frame/row axes (ChunkTrainLoader process mode) —
                # per-host wire bytes and disk reads drop by nproc
                chunk_proc = ((self.pid, self.n_proc)
                              if self.n_proc > 1 else None)
                if not ChunkTrainLoader.applicable(self.train_set, cfg):
                    print("==========>chunkTrain requested but inapplicable "
                          "(needs sampling_ratio 1, lossDecay -1, "
                          "full-duration sequences) — classic loader")
                elif getattr(t, "chunkSource", "cubes") == "adc" and \
                        self._try_adc_chunk(cfg, args, ndev, geometry,
                                            chunk_proc):
                    pass  # fused ADC loader/step installed
                else:
                    self._chunk_loader = ChunkTrainLoader(
                        self.train_set, t.batchSize, seed=args.seed,
                        shuffle=True, pad_multiple=ndev, transfer_dtype=wire,
                        process=chunk_proc)
                    self._chunk_step = make_chunk_train_step(
                        self.model, self.tx, geometry, mesh=self.mesh)
            if self._chunk_loader is None:
                # only when chunk mode does NOT drive training: building both
                # loaders would waste a thread pool and log a misleading
                # steps/epoch count
                self.train_loader = BatchLoader(
                    self.train_set, cfg.TRAINING.batchSize, shuffle=True,
                    seed=args.seed, workers=cfg.SETUP.numWorkers,
                    transfer_dtype=wire, **mh)
                if not getattr(t, "chunkTrain", False):
                    from hupr_tpu.engine.chunk_train import ChunkTrainLoader
                    if ChunkTrainLoader.applicable(self.train_set, cfg):
                        # steer input-bound classic runs to the fast path
                        # (README "Which config should I train with?"):
                        # the classic loop ships every 33.6 MB window
                        # separately and is the measured bottleneck on
                        # transfer- or host-bound setups
                        print("==========>hint: this run qualifies for "
                              "chunk-mode training (TRAINING.chunkTrain: "
                              "true, or config/mscsa_prgcn_tpu_fast.yaml) "
                              "— ~an order of magnitude faster when the "
                              "loader or host->device link is the "
                              "bottleneck; per-step math is unchanged, "
                              "epochs shuffle chunks instead of windows")
        # optional args.evalPhase overrides the reference's eval->test /
        # train->val pairing (main.py:36-44): lets an eval-mode run score
        # the VAL split without constructing the train loader at all
        # (scripts/parity_audit.py --split val needs exactly that)
        phase = getattr(args, "evalPhase", None) or \
            ("test" if args.eval else "val")
        self.test_set = get_dataset(phase, cfg, args.sampling_ratio)
        self.test_loader = BatchLoader(self.test_set, cfg.TEST.batchSize,
                                       shuffle=False, seed=args.seed,
                                       workers=cfg.SETUP.numWorkers,
                                       transfer_dtype=wire)
        if self.n_proc > 1:
            from hupr_tpu.parallel import multihost
            # per-host copies of the data must describe the SAME global
            # dataset: a divergent annotation file gives hosts different
            # batch counts, so one host would issue collectives the others
            # never join (a diagnostic-free hang at the coordination
            # timeout). Fail fast with the per-process sizes instead.
            multihost.assert_agreement(
                "train dataset size",
                -1.0 if self.train_set is None else float(
                    len(self.train_set)))
            multihost.assert_agreement(
                f"{self.test_set.phase} dataset size",
                float(len(self.test_set)))
            # eval under multi-host requires sequence mode: fail at startup,
            # not after a full epoch of pod time
            self._require_sequence_eval()

        # steps/epoch under the loader that actually drives training (chunk
        # mode has ceil(duration/B) chunks per sequence, which exceeds
        # ceil(N/B) when duration % B != 0); None in eval mode
        driving_loader = (self._chunk_loader if self._chunk_loader is not None
                          else self.train_loader)
        # warmup LR back-computation (run.py:30-32); eval mode has no train
        # loader and never steps the optimizer, so plain lr suffices there
        if t.warmupEpoch == -1 or driving_loader is None:
            self.lr = t.lr
        else:
            step_size = len(driving_loader) * t.warmupEpoch
            self.lr = t.lr / (t.warmupGrowth ** step_size)
        # loss-annealing weight; the reference's LossComputer advances it
        # BEFORE combining losses, on every computeLoss call — train AND
        # eval batches alike (misc/losses.py:36-42); beta == 1 - alpha exactly
        self.alpha = 0.0

        self.logger = Logger()
        self.checkpointer = AsyncCheckpointer()
        if driving_loader is not None:
            kind = "chunk steps" if self._chunk_loader is not None \
                else "batches"
            print(f"==========>Train set size: {len(driving_loader)} {kind}")
        print("==========>Test set size:", len(self.test_loader))

    def _try_adc_chunk(self, cfg, args, ndev, geometry,
                       process=None) -> bool:
        """Install the fused raw-ADC chunk loader + step
        (TRAINING.chunkSource: adc) when the capture .bin files cover the
        train split; returns False (with a printed notice) otherwise so the
        caller falls back to cube chunks."""
        from hupr_tpu.data.adc import ADCFrameSource
        from hupr_tpu.engine.chunk_train import (ADCChunkLoader,
                                                 make_adc_chunk_train_step)
        d = cfg.DATASET
        rp = d.radar_params()       # raises on a geometry mismatch
        adc = ADCFrameSource(d.adcDir, rp)
        ok = ADCChunkLoader.applicable(self.train_set, cfg, adc)
        if self.n_proc > 1:
            # one host missing captures would silently fall back to cube
            # chunks and desynchronize the collective schedule — agree, or
            # raise on every process together
            from hupr_tpu.parallel import multihost
            multihost.assert_agreement("adc chunk availability", float(ok))
        if not ok:
            print("==========>chunkSource adc requested but the captures "
                  f"under DATASET.adcDir={d.adcDir!r} don't cover the "
                  "train split — cube chunks")
            return False
        self._chunk_loader = ADCChunkLoader(
            self.train_set, cfg.TRAINING.batchSize, adc, seed=args.seed,
            shuffle=True, pad_multiple=ndev, process=process)
        self._chunk_step = make_adc_chunk_train_step(
            self.model, self.tx, geometry, mesh=self.mesh,
            radar_params=rp, num_frames=d.numFrames)
        return True

    # ---------------- LR schedule (base.py:66-72) ----------------

    def adjust_lr(self, epoch: int):
        t = self.cfg.TRAINING
        if epoch < t.warmupEpoch:
            self.lr *= t.warmupGrowth
        else:
            self.lr *= t.lrDecay

    def advance_alpha(self):
        """Advance the annealing weight exactly as the reference does at the
        top of every computeLoss call (misc/losses.py:36-38)."""
        if self.alpha < 1.0:
            self.alpha += self.cfg.TRAINING.lossDecay

    def _sequence_eval_applicable(self) -> bool:
        """Single source of truth for 'eval can run in sequence mode' —
        shared by the startup multi-host guard and per-epoch eval dispatch
        so the two sites cannot drift."""
        from hupr_tpu.engine.seq_eval import SequenceEvaluator
        return (getattr(self.cfg.TEST, "sequenceEval", True)
                and SequenceEvaluator.applicable(self.test_set, self.cfg))

    def _require_sequence_eval(self):
        if not self._sequence_eval_applicable():
            raise RuntimeError(
                "multi-host eval needs sequence mode (TEST.sequenceEval on, "
                "sampling_ratio 1, lossDecay -1, full-duration sequences)")

    # ---------------- checkpoints ----------------

    def load_model_weight(self, mode: str):
        path = find_checkpoint(self.dir, mode)
        if self.n_proc > 1:
            # every process must make the same resume decision: a host that
            # can't see the checkpoint would silently keep fresh-init params
            # inside a "replicated" global array and run a different number
            # of epochs of collectives (hang/corruption). allgather (not
            # broadcast) so a disagreement raises on EVERY process together
            # instead of stranding the rest at the next collective
            from hupr_tpu.parallel import multihost
            found = multihost.allgather_scalar(0.0 if path is None else 1.0)
            if any(f != found[0] for f in found):
                missing = [i for i, f in enumerate(found) if not f]
                raise RuntimeError(
                    f"checkpoint visibility differs across hosts: process(es) "
                    f"{missing} did not find a '{mode}' checkpoint the others "
                    f"did — the logs dir must be a shared filesystem")
        if path is None:
            print("==========>Train the model from scratch")
            return
        if path.endswith(".pth"):
            self.state, epoch, acc, lr = load_torch_checkpoint(
                path, self.state)
            print(f"==========>Load the reference torch weights from {path}, "
                  f"saved at epoch {epoch}")
        else:
            self.state, epoch, acc, lr = load_checkpoint(path, self.state)
            print(f"==========>Load the model weight from {self.dir}, "
                  f"saved at epoch {epoch}")
        if not self.args.eval:
            # resume bookkeeping applies to BOTH formats (the reference
            # restores start_epoch + best AP from any checkpoint.pth,
            # tools/base.py:115-116) — a migrated torch run must not restart
            # at epoch 0 or let its first AP overwrite model_best
            self.start_epoch = epoch
            self.logger.update_best_acc(acc)
            if lr is not None:
                # continue the warmup-growth/decay trajectory at the saved
                # LR, exactly as the reference's optimizer.load_state_dict
                # does (tools/base.py:114) — __init__ recomputed the fresh-
                # run initial LR, which is wrong after N decays (and wildly
                # wrong mid-warmup)
                self.lr = lr
        if self.n_proc > 1:
            # same file, same content everywhere — a stale copy on one host
            # would desynchronize start_epoch (collective-schedule mismatch);
            # allgather so every process raises together on a mismatch
            from hupr_tpu.parallel import multihost
            epochs = multihost.allgather_scalar(float(epoch))
            if any(int(e) != int(epochs[0]) for e in epochs):
                raise RuntimeError(
                    f"checkpoint epoch differs across hosts: per-process "
                    f"epochs {[int(e) for e in epochs]}")
        self.state = replicate_state(self.state, self.mesh)

    def save_model_weight(self, epoch: int, acc: float):
        """Same retention policy as tools/base.py:75-90 (best / latest /
        every-5), but ONE host fetch per epoch written to all retention
        files, on a background thread (training continues immediately).
        Multi-host: params are replicated, so only process 0 writes."""
        if self.n_proc > 1 and self.pid != 0:
            self.logger.is_best_acc_ap(acc)   # keep best-AP tracking synced
            return
        paths = []
        if self.logger.is_best_acc_ap(acc):
            print("==========>Save the best model...")
            paths.append(os.path.join(self.dir, "model_best.ckpt"))
        print("==========>Save the latest model...")
        paths.append(os.path.join(self.dir, "checkpoint.ckpt"))
        if epoch % 5 == 0:
            paths.append(os.path.join(self.dir, f"checkpoint_{epoch}.ckpt"))
        self.checkpointer.save(paths, self.state, epoch,
                               self.logger.show_best_ap(), lr=self.lr)

    def save_loss_list(self, epoch: int, loss_list, mode: str):
        if self.n_proc > 1 and self.pid != 0:
            return
        path = os.path.join(self.dir, f"{mode}_loss_list_{epoch}.json")
        with open(path, "w") as fp:
            json.dump(loss_list, fp)

    # ---------------- keypoint export (base.py:124-152) ----------------

    def save_keypoints(self, save_preds: list, preds: np.ndarray,
                       bbox: np.ndarray, image_ids: np.ndarray,
                       pred_heatmap: Optional[np.ndarray] = None) -> list:
        vis = np.ones((len(preds), self.num_keypoints, 1))
        preds3 = np.concatenate([preds, vis], axis=2)
        for j in range(len(preds3)):
            center, scale = xywh_to_center_scale(*[float(v) for v in bbox[j]])
            block = {
                "category_id": 1,
                "center": center.tolist(),
                "image_id": int(image_ids[j]),
                "scale": scale.tolist(),
                "score": 1.0,
                "keypoints": preds3[j].reshape(-1).tolist(),
            }
            if pred_heatmap is not None:
                # torch .var() is unbiased (base.py:140) -> ddof=1
                block["sigma"] = [
                    float(np.var(pred_heatmap[j, k], ddof=1)
                          * self.heatmap_size)
                    for k in range(self.num_keypoints)]
            save_preds.append(block)
        return save_preds

    def write_keypoints(self, preds: list) -> str:
        # name from the dataset actually being scored, not args.eval: the
        # evalPhase override (parity_audit --split val) makes phase='val'
        # with eval=True, and dataset.evaluate reads f"{phase}_results.json"
        name = f"{self.test_set.phase}_results.json"
        path = os.path.join(self.dir, name)
        with open(path, "w") as fp:
            json.dump(preds, fp)
        return path

    # ---------------- eval (run.py:35-63) ----------------

    def _classic_eval_batches(self):
        """Per-window host assembly through the BatchLoader (the reference's
        DataLoader shape): yields (out, image_ids, bbox, true_b)."""
        for device_batch, batch, true_b in device_prefetch(
                self.test_loader, self.mesh,
                pad_to=self.cfg.TEST.batchSize):
            self.advance_alpha()
            out = self.eval_step(self.state, device_batch, self.alpha)
            yield out, batch["imageId"][:true_b], batch["bbox"][:true_b], true_b

    def _eval_batches(self):
        """Sequence mode (device-side windowing, engine/seq_eval.py) when the
        split supports it and TEST.sequenceEval is on; classic otherwise.

        Multi-host: evaluation is embarrassingly parallel — each process
        runs sequence mode over its round-robin share of the sequences on
        its LOCAL devices (no DCN traffic); eval() merges the rank results."""
        from hupr_tpu.engine.seq_eval import (SequenceEvaluator,
                                              sequence_groups)
        applicable = self._sequence_eval_applicable()
        self._eval_len = len(self.test_set)
        if self.n_proc > 1:
            self._require_sequence_eval()
            if self._seq_eval is None:
                local = jax.local_devices()
                local_mesh = make_mesh(local) if len(local) > 1 else None
                self._seq_eval = SequenceEvaluator(
                    self.model, self.cfg, mesh=local_mesh,
                    adc_source=self._adc_eval_source())
            variables = {"params": jax.device_get(self.state.params),
                         "batch_stats": jax.device_get(
                             self.state.batch_stats)}
            groups = sequence_groups(self.test_set.image_ids)
            share = groups[self.pid::self.n_proc]
            # the progress bar should track THIS process's share, not the
            # full dataset (it would end every epoch at ~1/n_proc otherwise)
            self._eval_len = sum(length for _, length in share)
            return self._seq_eval.eval_batches(self.test_set, variables,
                                               share)
        if applicable:
            if self._seq_eval is None:
                self._seq_eval = SequenceEvaluator(
                    self.model, self.cfg, mesh=self.mesh,
                    adc_source=self._adc_eval_source())
            variables = {"params": self.state.params,
                         "batch_stats": self.state.batch_stats}
            return self._seq_eval.eval_batches(self.test_set, variables)
        return self._classic_eval_batches()

    def _adc_eval_source(self):
        """ADCFrameSource for fused-ADC sequence eval (TEST.sequenceSource:
        adc) when the captures cover the test split; None -> cube planes.
        Multi-host availability must AGREE (a host silently falling back
        would run a different encode program and skew the schedule)."""
        if getattr(self.cfg.TEST, "sequenceSource", "cubes") != "adc":
            return None
        from hupr_tpu.data.adc import ADCFrameSource
        from hupr_tpu.engine.seq_eval import SequenceEvaluator
        d = self.cfg.DATASET
        rp = d.radar_params()       # raises on a geometry mismatch
        adc = ADCFrameSource(d.adcDir, rp)
        ok = SequenceEvaluator.adc_applicable(self.test_set, self.cfg, adc)
        if self.n_proc > 1:
            from hupr_tpu.parallel import multihost
            multihost.assert_agreement("adc eval availability", float(ok))
        if not ok:
            print("==========>sequenceSource adc requested but the captures "
                  f"under DATASET.adcDir={d.adcDir!r} don't cover the "
                  "test split — cube planes")
            return None
        return adc

    def _consume_eval_batch(self, item, loss_list, save_preds,
                            visualization: bool, epoch: int):
        """Host-side consumption of one eval batch: fetch results, log,
        export keypoints, optionally plot."""
        out, image_ids, bbox, true_b = item
        pred2d = np.asarray(out["pred2d"])[:true_b]
        loss = float(out["loss"])
        self.logger.display(loss, float(out["loss2"]), true_b, epoch)
        preds_img = pred2d * self.img_heatmap_ratio
        if visualization:
            from hupr_tpu.utils.plot import plot_human_pose
            plot_human_pose(preds_img, self.cfg, self.vis_dir, image_ids)
        self.save_keypoints(save_preds, preds_img, bbox, image_ids)
        loss_list.append(loss)

    def eval(self, visualization: bool = True, epoch: int = -1) -> float:
        loss_list: list = []
        save_preds: list = []
        batches = self._eval_batches()   # also sets self._eval_len
        self.logger.clear(self._eval_len)
        # result fetches convert one batch deferred (the train loop's
        # pattern): float()/np.asarray() block on that batch's completion,
        # so consuming batch i-1 while batch i runs overlaps the host fetch
        # RTT + logging/export work with device compute
        pending = None
        for item in batches:
            if pending is not None:
                self._consume_eval_batch(pending, loss_list, save_preds,
                                         visualization, epoch)
            pending = item
        if pending is not None:
            self._consume_eval_batch(pending, loss_list, save_preds,
                                     visualization, epoch)
        if self.n_proc > 1:
            # every process scored its own sequence share: write a rank
            # file, let process 0 merge + run the OKS evaluator, and agree
            # on the AP everywhere (best-model tracking must not diverge)
            from hupr_tpu.parallel import multihost
            phase = self.test_set.phase
            with open(multihost.rank_result_path(self.dir, phase),
                      "w") as fp:
                json.dump(save_preds, fp)
            multihost.barrier("hupr_eval_results")
            acc_ap = 0.0
            if self.pid == 0:
                # the evaluator reads f"{phase}_results.json" (dataset.py
                # evaluate) — derive the merge target from the same phase
                multihost.merge_rank_results(
                    self.dir, phase,
                    os.path.join(self.dir, f"{phase}_results.json"))
                if self.args.keypoints:
                    self.test_set.evaluate_each(self.dir)
                acc_ap = self.test_set.evaluate(self.dir)
            return multihost.broadcast_scalar(acc_ap)
        self.write_keypoints(save_preds)
        if self.args.keypoints:
            self.test_set.evaluate_each(self.dir)
        acc_ap = self.test_set.evaluate(self.dir)
        return acc_ap

    # ---------------- train (run.py:65-86) ----------------

    def train(self):
        if self._chunk_loader is not None:
            return self._train_chunks()
        t = self.cfg.TRAINING
        for epoch in range(self.start_epoch, t.epochs):
            loss_list = []
            self.logger.clear(len(self.train_set))
            # loss scalars convert one step deferred: float() blocks on that
            # step's completion, so converting batch i-1 while batch i runs
            # keeps the device busy through the host's logging/LR work
            pending = None
            for idx_batch, (device_batch, _, true_b) in enumerate(
                    device_prefetch(self.train_loader, self.mesh,
                                    pad_to=t.batchSize)):
                self.advance_alpha()
                self.state, metrics = self.train_step(
                    self.state, device_batch, self.lr, self.alpha)
                if pending is not None:
                    pm, pb = pending
                    loss = float(pm["loss"])
                    self.logger.display(loss, float(pm["loss2"]), pb, epoch)
                    loss_list.append(loss)
                pending = (metrics, true_b)
                if idx_batch % t.lrDecayIter == 0:
                    self.adjust_lr(epoch)
            if pending is not None:
                pm, pb = pending
                loss = float(pm["loss"])
                self.logger.display(loss, float(pm["loss2"]), pb, epoch)
                loss_list.append(loss)
            acc_ap = self.eval(visualization=False, epoch=epoch)
            self.save_model_weight(epoch, acc_ap)
            self.save_loss_list(epoch, loss_list, "train")
        self.checkpointer.wait()  # flush the last epoch's async save

    def _train_chunks(self):
        """TRAINING.chunkTrain epoch loop: device-side window assembly
        (engine/chunk_train.py) — same LR/annealing/logging/eval/checkpoint
        schedule as train(), the step consumes chunk batches instead."""
        from hupr_tpu.engine.chunk_train import device_put_chunk
        t = self.cfg.TRAINING
        for epoch in range(self.start_epoch, t.epochs):
            loss_list = []
            self.logger.clear(len(self.train_set))
            pending = None
            for idx_batch, batch in enumerate(self._chunk_loader):
                device_batch, true_b = device_put_chunk(batch, self.mesh)
                self.advance_alpha()
                self.state, metrics = self._chunk_step(
                    self.state, device_batch, self.lr, self.alpha)
                if pending is not None:
                    pm, pb = pending
                    loss = float(pm["loss"])
                    self.logger.display(loss, float(pm["loss2"]), pb, epoch)
                    loss_list.append(loss)
                pending = (metrics, true_b)
                if idx_batch % t.lrDecayIter == 0:
                    self.adjust_lr(epoch)
            if pending is not None:
                pm, pb = pending
                loss = float(pm["loss"])
                self.logger.display(loss, float(pm["loss2"]), pb, epoch)
                loss_list.append(loss)
            acc_ap = self.eval(visualization=False, epoch=epoch)
            self.save_model_weight(epoch, acc_ap)
            self.save_loss_list(epoch, loss_list, "train")
        self.checkpointer.wait()
