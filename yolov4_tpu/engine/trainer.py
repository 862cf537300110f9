"""Training engine (reference main_amp.py:61-235 + engine/build.py:41-108).

Epoch loop: sharded host loading -> one compiled shard_map step per
iteration (forward, loss, pmean grads, accumulation, optimizer, LR — all
on device) -> periodic throughput/loss logging -> per-epoch COCO validation
on the primary process -> checkpointing with best-AP50 tracking (the
reference's criterion, main_amp.py:215-218) and FULL state resume
(params + batch_stats + optimizer + counters; the reference's optimizer
restore was dead code, SURVEY discrepancy #7).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from yolov4_tpu.data.pipeline import build_data
from yolov4_tpu.engine.evaluator import validate
from yolov4_tpu.engine.predictor import Predictor
from yolov4_tpu.models import build_model
from yolov4_tpu.models.yolov4 import init_variables
from yolov4_tpu.ops.loss import build_criterion
from yolov4_tpu.optim import build_lr_schedule, build_optimizer
from yolov4_tpu.parallel import create_mesh, create_train_state, make_train_step
from yolov4_tpu.parallel.mesh import batch_sharding
from yolov4_tpu.utils import checkpoint as ckpt_lib
from yolov4_tpu.utils.logging import get_logger
from yolov4_tpu.utils.metrics import AverageMeter, MetricsJSONL

logger = get_logger(__name__)


class Trainer:
    def __init__(self, cfg: Dict, data_root: str, resume: Optional[str] = None,
                 print_freq: int = 10, seed: int = 0, profile_steps: int = 0,
                 evaluate_only: bool = False):
        from yolov4_tpu.utils.profiling import StepProfiler

        self.cfg = cfg
        self.print_freq = print_freq
        self.output_dir = cfg["TRAIN"]["OUTPUT_DIR"]
        self.profiler = StepProfiler(
            os.path.join(cfg["TRAIN"]["OUTPUT_DIR"], "profile"),
            start=10, count=profile_steps)
        self.process_index = jax.process_index()
        self.is_primary = self.process_index == 0
        import os as _os
        self.metrics_log = MetricsJSONL(
            _os.path.join(self.output_dir, "metrics.jsonl"),
            enabled=self.is_primary)

        self.mesh = create_mesh()
        self.batch_sharding = batch_sharding(self.mesh)
        n_devices = len(jax.devices())
        local_devices = len(jax.local_devices())
        logger.info(f"mesh: {n_devices} device(s), "
                    f"{jax.process_count()} process(es)")

        # per-process loaders; global batch = BATCH_SIZE * n_devices
        self.evaluate_only = evaluate_only
        if evaluate_only:
            from yolov4_tpu.data.coco import COCODataset
            from yolov4_tpu.data.transforms import Transform
            self.train_loader = None
            val_dataset = COCODataset(
                root=data_root, name="val2017", img_size=cfg["TEST"]["IMGSIZE"],
                is_train=False,
                transform=Transform(cfg, is_train=False, keep_uint8=True),
                num_classes=cfg["MODEL"]["N_CLASSES"])
            from yolov4_tpu.data.pipeline import DataLoader
            self.val_loader = DataLoader(
                val_dataset, batch_size=cfg["TEST"].get("BATCH_SIZE", 8),
                shuffle=False, num_workers=cfg["DATA"]["WORKERS"],
                process_index=self.process_index,
                process_count=jax.process_count())
        else:
            per_process_batch = cfg["DATA"]["BATCH_SIZE"] * local_devices
            self.train_loader, self.val_loader = build_data(
                cfg, data_root, process_index=self.process_index,
                process_count=jax.process_count(), seed=seed)
            self.train_loader.batch_size = per_process_batch
            self.train_loader.drop_last = True

        self.model = build_model(cfg)
        self.criterion = build_criterion(cfg)

        variables = init_variables(
            self.model, jax.random.PRNGKey(seed), cfg["TRAIN"]["IMGSIZE"])
        pretrained = cfg["MODEL"].get("BACKBONE_PRETRAINED")
        if pretrained and os.path.isfile(pretrained):
            logger.info(f"loading pretrained backbone: {pretrained}")
            variables = ckpt_lib.load_pretrained_backbone(variables, pretrained)
        elif pretrained:
            logger.warning(f"BACKBONE_PRETRAINED not found, skipping: {pretrained}")

        self.tx = build_optimizer(cfg, variables["params"])
        len_epoch = len(self.train_loader) if self.train_loader else 1
        self.lr_schedule = build_lr_schedule(cfg, len_epoch=len_epoch)
        self.device_aug = None
        if cfg["AUGMENTATION"].get("DEVICE", False):
            aug = cfg["AUGMENTATION"]
            self.device_aug = {
                "jitter": aug["JITTER"], "hue": aug["HUE"],
                "saturation": aug["SATURATION"], "exposure": aug["EXPOSURE"],
                "min_offset": aug["MIN_OFFSET"],
                "flip": bool(aug["RANDOM_HORIZONTAL_FLIP"]),
                "dither": bool(aug["COLOR_DITHERING"]),
            }
            logger.info("device-side augmentation enabled")
        # s2d wire layout for the image transfer (host packs the s2d stem's
        # input order; kills the in-program 3-channel relayout copies —
        # 2.56 ms/step of the 608/b8 train trace). One extra host repack
        # per batch (native.pack_s2d_f32); TRAIN.TRANSFER_LAYOUT: "nhwc"
        # opts out (e.g. host-core-starved machines).
        self.transfer_layout = "nhwc"
        if (cfg["TRAIN"].get("TRANSFER_LAYOUT", "s2d") == "s2d"
                and self.device_aug is None
                and cfg["MODEL"].get("S2D_STEM", True) in (True, "fused")
                and cfg["TRAIN"]["IMGSIZE"] % 2 == 0):
            self.transfer_layout = "s2d"
        # opt-in parameter EMA (TRAIN.EMA_DECAY > 0, off = reference
        # behavior): the step keeps shadow weights; eval + best-checkpoint
        # selection score them (checkpoints carry both trees)
        self.ema_decay = float(cfg["TRAIN"].get("EMA_DECAY", 0.0))
        # opt-in multi-scale bucket training (TRAIN.MULTISCALE, the
        # reference's dead RANDOM_RESIZE path, engine/build.py:105-107):
        # one compiled step per size, built lazily on first use
        self.ms_sizes = [int(s) for s in (cfg["TRAIN"].get("MULTISCALE")
                                          or [])]
        self.ms_every = int(cfg["TRAIN"].get("MULTISCALE_EVERY", 10))
        self._seed = seed
        self._train_steps: Dict[int, object] = {}
        self.train_step = None
        self._train_lockstep_done = False
        if not evaluate_only:
            self.train_step = self._make_step(cfg["TRAIN"]["IMGSIZE"])
        self.state = create_train_state(variables, self.tx,
                                        ema=self.ema_decay > 0)

        self.start_epoch = cfg["TRAIN"]["START_EPOCH"]
        self.best_ap50 = 0.0
        self.best_ap50_95 = 0.0
        # preemption-safe mid-epoch checkpointing: every N steps the full
        # state rolls into checkpoint.ckpt (atomic tmp+replace), tagged
        # mid_epoch so resume restarts INSIDE the epoch at the next batch.
        # 0 = off (end-of-epoch saves only, the reference's cadence).
        self.ckpt_every = int(cfg["TRAIN"].get("CHECKPOINT_EVERY_STEPS", 0))
        self._resume_skip = 0
        if resume:
            self._resume(resume)

        # validation shards the batch across the whole mesh (round 1 ran
        # eval on one device while the others idled)
        self.predictor = Predictor(
            cfg, variables={"params": self.state.params,
                            "batch_stats": self.state.batch_stats},
            batch_size=cfg["TEST"].get("BATCH_SIZE", 8),
            mesh=self.mesh)

    # ------------------------------------------------------------------
    def _make_step(self, img_size: int):
        """Compiled train step for one input size (cached per size — each
        size is its own static-shape XLA program/bucket)."""
        if img_size not in self._train_steps:
            cfg = self.cfg
            self._train_steps[img_size] = make_train_step(
                self.model, self.criterion, self.tx, self.lr_schedule,
                self.mesh,
                accumulation_steps=cfg["TRAIN"]["ACCUMULATION_STEPS"],
                img_size=img_size, device_aug=self.device_aug,
                aug_seed=self._seed,
                skip_nonfinite=bool(cfg["TRAIN"].get("SKIP_NONFINITE_UPDATES",
                                                     False)),
                input_layout=self.transfer_layout,
                ema_decay=self.ema_decay)
        return self._train_steps[img_size]

    def _ms_size_for(self, epoch: int, batch_index: int) -> int:
        """Deterministic multi-scale draw: one size per MULTISCALE_EVERY
        batch segment, seeded by (seed, epoch, segment) — resume-stable
        and identical on every process (shards must agree on shapes)."""
        seg = batch_index // self.ms_every
        rng = np.random.default_rng((self._seed, 7919, epoch, seg))
        return int(self.ms_sizes[rng.integers(len(self.ms_sizes))])

    # ------------------------------------------------------------------
    def _resume(self, path: str) -> None:
        logger.info(f"resuming from {path}")
        raw = ckpt_lib.load_checkpoint_raw(path)
        variables = raw["variables"]
        # EMA checkpoints store the servable EMA tree in variables.params
        # and the raw training params in raw_params (save() layout)
        train_params = raw.get("raw_params", variables["params"])
        self.state = self.state.replace(
            params=ckpt_lib.restore_onto(self.state.params, train_params),
            batch_stats=ckpt_lib.restore_onto(self.state.batch_stats,
                                              variables["batch_stats"]),
        )
        if self.state.ema_params is not None:
            # resume the shadow average when the checkpoint has one; a
            # non-EMA checkpoint seeds EMA from its params (fresh start)
            ema_src = (variables["params"] if "raw_params" in raw
                       else train_params)
            self.state = self.state.replace(
                ema_params=ckpt_lib.restore_onto(self.state.ema_params,
                                                 ema_src))
        if "opt_state" in raw:  # full resume (reference's was dead code)
            self.state = self.state.replace(
                opt_state=ckpt_lib.restore_onto(self.state.opt_state,
                                                raw["opt_state"]))
        meta = raw.get("meta", {})
        if meta.get("mid_epoch"):
            # preemption checkpoint: re-enter the SAME epoch at the next
            # batch — loader order (set_epoch) and per-batch augmentation
            # seeds are index-deterministic, so the resumed stream is the
            # one the uninterrupted run would have seen
            self.start_epoch = int(meta["epoch"])
            self._resume_skip = int(meta["batch_index"])
        else:
            self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_ap50 = float(meta.get("best_ap50", 0.0))
        self.best_ap50_95 = float(meta.get("best_ap50_95", 0.0))
        if "step" in meta:
            self.state = self.state.replace(
                step=np.asarray(int(meta["step"]), np.int32))
        logger.info(
            f"resumed at epoch {self.start_epoch}"
            + (f" batch {self._resume_skip}" if self._resume_skip else "")
            + f", step {int(self.state.step)}, best AP50 {self.best_ap50}")

    def _put_batch(self, imgs: np.ndarray, labels: np.ndarray):
        if imgs.ndim == 5:  # device-aug canvases [B, 4, S, S, 3] uint8
            from yolov4_tpu import native
            b = imgs.shape[0]
            planar = native.pack_planar_u8(imgs.reshape((-1,) + imgs.shape[2:]))
            flat = planar.reshape(b, -1)
        else:
            if self.transfer_layout == "s2d":
                from yolov4_tpu import native
                imgs = native.pack_s2d_f32(np.ascontiguousarray(imgs))
            flat = np.ascontiguousarray(imgs).reshape(imgs.shape[0], -1)
            transfer = self.cfg["TRAIN"].get("TRANSFER_DTYPE", "bfloat16")
            if flat.dtype == np.float32 and transfer == "bfloat16":
                import ml_dtypes
                flat = flat.astype(ml_dtypes.bfloat16)
            elif flat.dtype == np.float32 and transfer == "uint8":
                flat = np.clip(flat * 255.0 + 0.5, 0, 255).astype(np.uint8)
        imgs = jax.make_array_from_process_local_data(self.batch_sharding, flat)
        labels = jax.make_array_from_process_local_data(self.batch_sharding, labels)
        return imgs, labels

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> float:
        cfg = self.cfg
        self.train_loader.set_epoch(epoch)
        # mid-epoch resume: skip straight to the checkpointed batch (the
        # loader keeps indices/seeds/numbering aligned — no skipped-batch
        # collate cost); consumed once, later epochs start at 0
        skip, self._resume_skip = self._resume_skip, 0
        self.train_loader.start_batch = skip
        n_batches = len(self.train_loader)
        batch_time = AverageMeter()
        global_batch = (cfg["DATA"]["BATCH_SIZE"] * len(jax.devices()))
        end = time.time()
        loss_val = float("nan")

        if self.ms_sizes:
            # multi-scale: the loader evaluates the SAME schedule per
            # batch (sizes ride with the prefetch tasks), so the step
            # picked here always matches the arriving batch's shape
            self.train_loader.size_schedule = self._ms_size_for

        label_key = "member_boxes" if self.device_aug else "padded_labels"
        cur_size = cfg["TRAIN"]["IMGSIZE"]
        step_fn = self.train_step
        for i, (imgs, target) in enumerate(self.train_loader, start=skip):
            if self.ms_sizes:
                cur_size = self._ms_size_for(epoch, i)
                step_fn = self._make_step(cur_size)
            imgs, labels = self._put_batch(imgs, target[label_key])
            if jax.process_count() > 1 and not self._train_lockstep_done:
                # compile, then coordinator barrier, then first dispatch:
                # gloo context creation at the first execution has a
                # hardcoded ~30 s rendezvous that cross-process compile
                # skew can blow (parallel.mesh.coordinator_lockstep)
                step_fn.lower(self.state, imgs, labels).compile()
                from yolov4_tpu.parallel.mesh import coordinator_lockstep
                coordinator_lockstep("train_step")
                self._train_lockstep_done = True
            self.state = step_fn(self.state, imgs, labels)
            if self.profiler.count:
                # host-side counter: reading state.step would force a sync
                self._host_step = getattr(self, "_host_step", 0) + 1
                self.profiler.on_step(self._host_step)
            if self.ckpt_every and (i + 1) % self.ckpt_every == 0 \
                    and (i + 1) < n_batches:
                self._save_mid_epoch(epoch, i + 1)

            if (i + 1) % self.print_freq == 0:
                loss_val = float(self.state.loss)  # forces device sync
                batch_time.update((time.time() - end) / self.print_freq)
                end = time.time()
                lr = float(self.lr_schedule(int(self.state.step) - 1))
                ips = global_batch / max(batch_time.val, 1e-9)
                logger.info(
                    f"Epoch: [{epoch + 1}][{i + 1}/{n_batches}] "
                    f"Time {batch_time.val:.3f} ({batch_time.avg:.3f}) "
                    f"Speed {ips:.1f} img/s "
                    f"Lr {lr:.8f} "
                    f"Loss {loss_val:.4f} "
                    f"ImgSize: {cur_size}x{cur_size}")
                self.metrics_log.write({
                    "kind": "train", "epoch": epoch + 1,
                    "step": int(self.state.step), "loss": loss_val,
                    "lr": lr, "img_s": round(ips, 1),
                    "batch_time_s": round(batch_time.val, 4)})
        return loss_val

    def _save_mid_epoch(self, epoch: int, batch_index: int) -> None:
        """Preemption checkpoint: the full state rolls into
        checkpoint.ckpt atomically (TRAIN.CHECKPOINT_EVERY_STEPS cadence).
        Serializing the state fetches it to host, so pick a cadence whose
        fetch cost amortizes (hundreds of steps on real configs); no
        collective is involved — non-primary processes skip the IO and
        resume re-reads the same file on every process."""
        if not self.is_primary:
            return
        meta = {"epoch": epoch, "batch_index": batch_index,
                "mid_epoch": True, "step": int(self.state.step),
                "best_ap50": self.best_ap50,
                "best_ap50_95": self.best_ap50_95}
        bundle = {
            "variables": {"params": self.state.params,
                          "batch_stats": self.state.batch_stats},
            "opt_state": self.state.opt_state,
            "meta": meta,
        }
        if self.state.ema_params is not None:
            # same layout as save(): variables.params = EMA (servable),
            # raw_params = training params (resume)
            meta["ema_decay"] = self.ema_decay
            bundle["variables"] = {"params": self.state.ema_params,
                                   "batch_stats": self.state.batch_stats}
            bundle["raw_params"] = self.state.params
        ckpt_lib.save_checkpoint(bundle, is_best=False,
                                 output_dir=self.output_dir, meta=meta)
        logger.info(f"mid-epoch checkpoint (epoch {epoch + 1} "
                    f"batch {batch_index}, step {meta['step']})")

    def evaluate(self):
        # EMA enabled: score the shadow weights (what a deployment would
        # serve); raw params remain what training continues from
        params = (self.state.ema_params
                  if self.state.ema_params is not None else self.state.params)
        self.predictor.variables = {"params": params,
                                    "batch_stats": self.state.batch_stats}
        return validate(self.val_loader, self.predictor,
                        conf_threshold=self.cfg["TEST"]["CONFTHRE"],
                        nms_threshold=self.cfg["TEST"]["NMSTHRE"])

    def save(self, epoch: int, ap50: float, ap50_95: float) -> None:
        # best-metric tracking runs on EVERY process (validate() already
        # broadcast the APs), so fit() returns the same values on all
        # ranks; only the file IO below is primary-only.
        is_best = ap50 > self.best_ap50
        self.best_ap50 = max(ap50, self.best_ap50)
        self.best_ap50_95 = max(ap50_95, self.best_ap50_95)
        if not self.is_primary:
            return
        bundle = {
            "variables": {"params": self.state.params,
                          "batch_stats": self.state.batch_stats},
            "opt_state": self.state.opt_state,
            "meta": {"epoch": epoch, "step": int(self.state.step),
                     "ap50": ap50, "ap50_95": ap50_95,
                     "best_ap50": self.best_ap50,
                     "best_ap50_95": self.best_ap50_95},
        }
        if self.state.ema_params is not None:
            # variables.params = the EMA weights: they are what evaluate()
            # scored, so whatever val/detect/serve loads from this file
            # reproduces the recorded AP. Raw training params ride in
            # raw_params for resume (both trees persist).
            bundle["variables"] = {"params": self.state.ema_params,
                                   "batch_stats": self.state.batch_stats}
            bundle["raw_params"] = self.state.params
            bundle["meta"]["ema_decay"] = self.ema_decay
        ckpt_lib.save_checkpoint(bundle, is_best, output_dir=self.output_dir,
                                 meta=bundle["meta"])
        logger.info(f"checkpoint saved (epoch {epoch}, best={is_best})")

    def fit(self, evaluate_only: bool = False):
        if evaluate_only:
            ap, ap50 = self.evaluate()
            logger.info(f"AP[.50:.95] = {ap:.5f}  AP50 = {ap50:.5f}")
            return ap, ap50

        max_epochs = self.cfg["TRAIN"]["MAX_EPOCHS"]
        for epoch in range(self.start_epoch, max_epochs):
            t0 = time.time()
            self.train_epoch(epoch)
            logger.info(f"epoch {epoch + 1} trained in {time.time() - t0:.1f}s")
            # every process evaluates its val shard over the full mesh
            # (validate() allgathers rows, scores on the primary, barriers,
            # and broadcasts the APs back)
            ap, ap50 = self.evaluate()
            self.save(epoch, ap50, ap)  # all ranks: updates best_* (the
            # one place they change; the record below reads the attribute)
            if self.is_primary:
                logger.info(f"epoch {epoch + 1}: AP {ap:.5f} AP50 {ap50:.5f} "
                            f"(best AP50 {self.best_ap50:.5f})")
                self.metrics_log.write({
                    "kind": "eval", "epoch": epoch + 1, "ap": ap,
                    "ap50": ap50, "best_ap50": self.best_ap50})
        # closed HERE (not per-epoch) so a --profile window that crosses
        # an epoch boundary keeps tracing into the next epoch
        self.profiler.close()
        return self.best_ap50_95, self.best_ap50
