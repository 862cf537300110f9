"""CSPDarknet53 ImageNet classification trainer
(reference darknet/main_amp.py:120-547), TPU-native.

Data-parallel shard_map step: uint8 batches normalized ON DEVICE with
ImageNet mean/std (the reference's CUDA-stream prefetcher did this,
main_amp.py:284-321), cross-entropy with label smoothing 0.1
(main_amp.py:184), Adam with LR scaled by global_batch/256
(main_amp.py:154-159), step-LR at 60/90/110 with 5-epoch warmup applied
per iteration (main_amp.py:518-546), top-1/top-5 validation, best-prec1
checkpointing. The resulting checkpoint's backbone subtree is what
YOLOv4 training consumes as BACKBONE_PRETRAINED.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yolov4_tpu.classify.data import IMAGENET_MEAN, IMAGENET_STD
from yolov4_tpu.models.darknet import CSPDarknet53
from yolov4_tpu.parallel.mesh import DATA_AXIS, batch_sharding, create_mesh
from yolov4_tpu.parallel.train_step import TrainState, create_train_state
from yolov4_tpu.utils import checkpoint as ckpt_lib
from yolov4_tpu.utils.logging import get_logger
from yolov4_tpu.utils.metrics import AverageMeter, MetricsJSONL

logger = get_logger(__name__)


def classifier_lr_schedule(base_lr: float, len_epoch: int):
    """Step LR 60/90/110 (gamma 0.1) + 5-epoch per-iteration warmup
    (reference darknet/main_amp.py:518-546)."""
    milestones = jnp.asarray([60, 90, 110])

    def schedule(global_step):
        global_step = jnp.asarray(global_step)
        epoch = global_step // len_epoch
        factor = jnp.sum(epoch >= milestones).astype(jnp.float32)
        lr = base_lr * 0.1 ** factor
        warm = lr * (1.0 + global_step.astype(jnp.float32)) / (5.0 * len_epoch)
        return jnp.where(epoch < 5, warm, lr)

    return schedule


def normalize_images(u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC -> normalized float (on device)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (u8.astype(jnp.float32) - mean) / std


def pack_cls_wire(imgs: np.ndarray, layout: str) -> np.ndarray:
    """Host side of the flat wire: uint8 NHWC [B, S, S, 3] -> [B, 3*S*S].

    An NHWC device transfer with trailing dim 3 lane-pads 3->128 (a ~40x
    byte tax, docs/PERF.md); the classifier ships the SAME wire bytes as
    the detection path (engine/predictor.pack_wire — one copy of the
    layout contract). "nhwc" ships the raw array (debug/fallback only).
    """
    if layout == "nhwc":
        return imgs
    from yolov4_tpu.engine.predictor import pack_wire
    return pack_wire(imgs, imgs.shape[0], s2d_wire=layout == "s2d")


def decode_cls_wire(flat: jnp.ndarray, size: int, layout: str) -> jnp.ndarray:
    """Device side: flat wire bytes -> ImageNet-normalized float input in
    the layout the backbone consumes. For "s2d" the tensor STAYS in the
    stem's [B, S/2, S/2, 12] layout (channel (dy*2+dx)*3+c, so mean/std
    tile 4x) and the caller passes input_s2d=True; no relayout copies
    ever run on device."""
    mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)
    if layout == "s2d":
        x = flat.reshape(-1, size // 2, size // 2, 12)
        mean, std = jnp.tile(mean, 4), jnp.tile(std, 4)
    elif layout == "planar":
        x = jnp.transpose(flat.reshape(-1, 3, size, size), (0, 2, 3, 1))
    else:
        x = flat
    return (x.astype(jnp.float32) - mean) / std


def smoothed_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                num_classes: int, smoothing: float = 0.1) -> jnp.ndarray:
    target = optax.smooth_labels(
        jax.nn.one_hot(labels, num_classes), smoothing)
    return jnp.mean(optax.softmax_cross_entropy(logits.astype(jnp.float32),
                                                target))


def make_cls_train_step(model, tx, lr_schedule, mesh, num_classes: int,
                        size: int, layout: str = "nhwc"):
    from yolov4_tpu.parallel.train_step import wrap_step

    multi = mesh.devices.size > 1
    pmean = (lambda x: jax.lax.pmean(x, DATA_AXIS)) if multi else (lambda x: x)

    def shard_body(state: TrainState, u8, labels) -> TrainState:
        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                decode_cls_wire(u8, size, layout), train=True,
                input_s2d=layout == "s2d", mutable=["batch_stats"])
            return smoothed_ce(logits, labels, num_classes), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = pmean(grads)
        loss = pmean(loss)
        new_bs = pmean(new_bs)

        lr = lr_schedule(state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_bs, opt_state=opt_state,
                             loss=loss)

    return wrap_step(shard_body, mesh)


def make_eval_step(model, size: int, layout: str = "nhwc"):
    """Masked top-1/top-5 COUNTS over the (global) batch.

    Summing in-program makes the outputs replicated scalars, so the same
    jit works single-process and over a multi-process mesh (the inputs
    enter via make_array_from_process_local_data and GSPMD inserts the
    cross-device reduction); per-sample boolean outputs would not be
    addressable off-process."""
    @jax.jit
    def eval_step(variables, u8, labels, mask):
        logits = model.apply(variables, decode_cls_wire(u8, size, layout),
                             train=False, input_s2d=layout == "s2d")
        top5 = jnp.argsort(-logits, axis=-1)[:, :5]
        correct1 = (top5[:, 0] == labels) & mask
        correct5 = jnp.any(top5 == labels[:, None], axis=-1) & mask
        return (jnp.sum(correct1.astype(jnp.int32)),
                jnp.sum(correct5.astype(jnp.int32)),
                jnp.sum(mask.astype(jnp.int32)))

    return eval_step


class ClassifierTrainer:
    def __init__(self, data_root: str, batch_size: int = 128, lr: float = 0.1,
                 epochs: int = 120, workers: int = 4, crop_size: int = 256,
                 val_size: int = 288, num_classes: int = 1000,
                 output_dir: str = "./outputs/cspdarknet53",
                 print_freq: int = 10, resume: Optional[str] = None,
                 compute_dtype=jnp.bfloat16, seed: int = 0,
                 sync_bn: bool = False, transfer_layout: str = "s2d",
                 width: float = 1.0, depth: float = 1.0,
                 profile_steps: int = 0, checkpoint_every_steps: int = 0):
        from yolov4_tpu.classify.data import ImageFolderDataset
        from yolov4_tpu.data.pipeline import DataLoader
        from yolov4_tpu.utils.profiling import StepProfiler

        # trace window over steps [10, 10+profile_steps) — the reference's
        # nvtx/cudaProfiler `--prof` window (darknet/main_amp.py:350-427)
        self.profiler = StepProfiler(os.path.join(output_dir, "profile"),
                                     start=10, count=profile_steps)
        self.print_freq = print_freq
        self.epochs = epochs
        self.output_dir = output_dir
        # same machine-readable scalar sink as the detection Trainer
        self.metrics_log = MetricsJSONL(
            os.path.join(output_dir, "metrics.jsonl"),
            enabled=jax.process_index() == 0)
        self.num_classes = num_classes
        self.mesh = create_mesh()
        self.sharding = batch_sharding(self.mesh)
        n_devices = len(jax.devices())
        self.global_batch = batch_size * n_devices
        # reference LR scaling: lr * global_batch / 256 (main_amp.py:154-155)
        self.base_lr = lr * self.global_batch / 256.0

        self.train_ds = ImageFolderDataset(
            f"{data_root}/train", crop_size, val_size, is_train=True, seed=seed)
        self.val_ds = ImageFolderDataset(
            f"{data_root}/val", crop_size, val_size, is_train=False)
        local_batch = batch_size * len(jax.local_devices())
        self.train_loader = DataLoader(
            self.train_ds, local_batch, shuffle=True, num_workers=workers,
            seed=seed, drop_last=True, process_index=jax.process_index(),
            process_count=jax.process_count())
        # val is process-sharded like train: each process scores its slice
        # and the in-program sum reduces across the mesh (validate())
        self.val_loader = DataLoader(self.val_ds, local_batch, shuffle=False,
                                     num_workers=workers,
                                     process_index=jax.process_index(),
                                     process_count=jax.process_count())

        # SyncBN (reference darknet/main_amp.py:147-150): batch statistics
        # pmean'd across the mesh inside the shard_map step. The axis only
        # exists on multi-device meshes; like the reference flag on one GPU,
        # it is a no-op single-device.
        use_sync = sync_bn and self.mesh.devices.size > 1
        if sync_bn and not use_sync:
            logger.warning("--sync_bn requested on a 1-device mesh: no-op")
        # flat wire transfers (see pack_cls_wire); the s2d layout needs the
        # fused stem, which needs even spatial dims
        self.layout = transfer_layout
        if self.layout == "s2d" and crop_size % 2:
            logger.warning(f"transfer_layout=s2d needs an even crop size "
                           f"(got {crop_size}): falling back to planar")
            self.layout = "planar"
        self.crop_size = crop_size
        self.model = CSPDarknet53(num_classes=num_classes, dtype=compute_dtype,
                                  bn_axis=DATA_AXIS if use_sync else None,
                                  width=width, depth=depth)
        init = jax.jit(lambda r, d: self.model.init({"params": r}, d, train=False))
        variables = init(jax.random.PRNGKey(seed),
                         jnp.zeros((1, crop_size, crop_size, 3), jnp.float32))

        # torch Adam defaults; weight decay ignored for Adam as in reference
        self.tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        self.lr_schedule = classifier_lr_schedule(
            self.base_lr, len(self.train_loader))
        self.train_step = make_cls_train_step(
            self.model, self.tx, self.lr_schedule, self.mesh, num_classes,
            size=crop_size, layout=self.layout)
        self.eval_step = make_eval_step(self.model, size=crop_size,
                                        layout=self.layout)
        self.state = create_train_state(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, self.tx)

        self.start_epoch = 0
        self.best_prec1 = 0.0
        self._train_lockstep_done = False
        self._eval_lockstep_done = False
        # preemption-safe mid-epoch checkpointing (same contract as the
        # detection trainer's TRAIN.CHECKPOINT_EVERY_STEPS): ImageNet
        # epochs are long, so per-epoch-only saves lose real work on
        # preemptible pools. 0 = end-of-epoch saves only.
        self.ckpt_every = int(checkpoint_every_steps)
        self._resume_skip = 0
        if resume:
            if resume.endswith((".pth", ".pth.tar", ".pt")):
                # fail clearly instead of an opaque msgpack unpack error:
                # a torch classifier checkpoint's Adam state has no optax
                # mapping, so a trajectory-faithful resume is impossible
                raise ValueError(
                    f"--resume {resume}: classifier resume needs a native "
                    "checkpoint (checkpoint.ckpt). For reference torch "
                    "weights, graft the backbone into detection training "
                    "via MODEL.BACKBONE_PRETRAINED instead (the torch "
                    "optimizer state cannot resume an optax schedule).")
            raw = ckpt_lib.load_checkpoint_raw(resume)
            self.state = self.state.replace(
                params=ckpt_lib.restore_onto(self.state.params,
                                             raw["variables"]["params"]),
                batch_stats=ckpt_lib.restore_onto(
                    self.state.batch_stats, raw["variables"]["batch_stats"]),
                opt_state=ckpt_lib.restore_onto(self.state.opt_state,
                                                raw["opt_state"]))
            meta = raw.get("meta", {})
            if meta.get("mid_epoch"):
                # re-enter the SAME epoch at the next batch (loader order
                # and per-batch seeds are index-deterministic)
                self.start_epoch = int(meta["epoch"])
                self._resume_skip = int(meta["batch_index"])
            else:
                self.start_epoch = int(meta.get("epoch", -1)) + 1
            self.best_prec1 = float(meta.get("best_prec1", 0.0))
            if "step" in meta:
                self.state = self.state.replace(
                    step=np.asarray(int(meta["step"]), np.int32))
            logger.info(
                f"resumed epoch {self.start_epoch}"
                + (f" batch {self._resume_skip}" if self._resume_skip else "")
                + f" best_prec1 {self.best_prec1:.3f}")

    def _put(self, imgs, labels):
        imgs = jax.make_array_from_process_local_data(
            self.sharding, pack_cls_wire(imgs, self.layout))
        labels = jax.make_array_from_process_local_data(
            self.sharding, labels.astype(np.int32))
        return imgs, labels

    def train_epoch(self, epoch: int) -> None:
        self.train_loader.set_epoch(epoch)
        # mid-epoch resume: skip straight to the checkpointed batch
        # (consumed once; later epochs start at 0)
        skip, self._resume_skip = self._resume_skip, 0
        self.train_loader.start_batch = skip
        n = len(self.train_loader)
        batch_time = AverageMeter()
        end = time.time()
        for i, (imgs, target) in enumerate(self.train_loader, start=skip):
            u8, labels = self._put(imgs, target["label"])
            if jax.process_count() > 1 and not self._train_lockstep_done:
                # compile, then barrier, then dispatch: gloo's first
                # collective rendezvous must not absorb compile skew
                # (parallel.mesh.coordinator_lockstep)
                self.train_step.lower(self.state, u8, labels).compile()
                from yolov4_tpu.parallel.mesh import coordinator_lockstep
                coordinator_lockstep("cls_train_step")
                self._train_lockstep_done = True
            self.state = self.train_step(self.state, u8, labels)
            if self.profiler.count:
                # host-side counter: reading state.step would force a sync
                self._host_step = getattr(self, "_host_step", 0) + 1
                self.profiler.on_step(self._host_step)
            if self.ckpt_every and (i + 1) % self.ckpt_every == 0 \
                    and (i + 1) < n:
                self._save_mid_epoch(epoch, i + 1)
            if (i + 1) % self.print_freq == 0:
                loss = float(self.state.loss)
                batch_time.update((time.time() - end) / self.print_freq)
                end = time.time()
                lr = float(self.lr_schedule(int(self.state.step) - 1))
                logger.info(
                    f"Epoch: [{epoch + 1}][{i + 1}/{n}] "
                    f"Time {batch_time.val:.3f} "
                    f"Speed {self.global_batch / max(batch_time.val, 1e-9):.1f} "
                    f"Lr {lr:.6f} Loss {loss:.4f}")
                # epoch is 1-based in metrics.jsonl, matching the detection
                # trainer's records (one schema across both sinks)
                self.metrics_log.write({
                    "kind": "train", "epoch": epoch + 1,
                    "step": int(self.state.step), "loss": loss, "lr": lr,
                    "img_s": round(
                        self.global_batch / max(batch_time.val, 1e-9), 1),
                    "batch_time_s": round(batch_time.val, 4)})

    def _save_mid_epoch(self, epoch: int, batch_index: int) -> None:
        """Preemption checkpoint: full state rolls into checkpoint.ckpt
        atomically (same contract as engine/trainer._save_mid_epoch)."""
        if jax.process_index() != 0:
            return
        meta = {"epoch": epoch, "batch_index": batch_index,
                "mid_epoch": True, "step": int(self.state.step),
                "best_prec1": self.best_prec1}
        bundle = {
            "variables": {"params": self.state.params,
                          "batch_stats": self.state.batch_stats},
            "opt_state": self.state.opt_state,
            "meta": meta,
        }
        ckpt_lib.save_checkpoint(bundle, is_best=False,
                                 output_dir=self.output_dir, meta=meta)
        logger.info(f"mid-epoch checkpoint (epoch {epoch + 1} "
                    f"batch {batch_index}, step {meta['step']})")

    def validate(self) -> Tuple[float, float]:
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        # Wrap-pad dedup: the sharded loader pads the GLOBAL index list to
        # a multiple of process_count by wrapping (pipeline._local_indices:
        # this process serves padded positions p, p+P, ...), so any local
        # sample whose padded position >= len(dataset) is another process's
        # image served again — masked out of the counts. The first
        # ceil((n - p)/P) local samples are the real ones.
        n_ds = len(self.val_ds)
        P, p = jax.process_count(), jax.process_index()
        real_local = max(0, -(-(n_ds - p) // P))
        n1 = n5 = total = 0
        seen = 0
        for imgs, target in self.val_loader:
            mask = np.asarray(target["batch_mask"], bool).copy()
            mask &= seen + np.arange(len(mask)) < real_local
            seen += int(target["batch_mask"].sum())
            u8, labels = self._put(imgs, target["label"])
            m = jax.make_array_from_process_local_data(self.sharding, mask)
            if P > 1 and not self._eval_lockstep_done:
                # compile, then barrier: gloo's first collective context
                # has a hardcoded rendezvous that cross-process compile
                # skew can blow (parallel.mesh.coordinator_lockstep)
                self.eval_step.lower(variables, u8, labels, m).compile()
                from yolov4_tpu.parallel.mesh import coordinator_lockstep
                coordinator_lockstep("cls_eval")
                self._eval_lockstep_done = True
            c1, c5, t = self.eval_step(variables, u8, labels, m)
            n1 += int(c1)
            n5 += int(c5)
            total += int(t)
        prec1 = 100.0 * n1 / max(total, 1)
        prec5 = 100.0 * n5 / max(total, 1)
        logger.info(f"* Prec@1 {prec1:.3f} Prec@5 {prec5:.3f}")
        return prec1, prec5

    def save(self, epoch: int, prec1: float) -> None:
        # best-metric tracking on EVERY process (fit() returns it); only
        # the file IO is primary-only — and it is the ONE place best_prec1
        # is updated (the eval record in fit() reads the attribute after)
        is_best = prec1 > self.best_prec1
        self.best_prec1 = max(prec1, self.best_prec1)
        if jax.process_index() != 0:
            return
        bundle = {
            "variables": {"params": self.state.params,
                          "batch_stats": self.state.batch_stats},
            "opt_state": self.state.opt_state,
            "meta": {"epoch": epoch, "step": int(self.state.step),
                     "prec1": prec1, "best_prec1": self.best_prec1},
        }
        ckpt_lib.save_checkpoint(bundle, is_best, output_dir=self.output_dir,
                                 meta=bundle["meta"])

    def fit(self, evaluate_only: bool = False):
        if evaluate_only:
            return self.validate()
        for epoch in range(self.start_epoch, self.epochs):
            self.train_epoch(epoch)
            prec1, prec5 = self.validate()
            self.save(epoch, prec1)  # updates best_prec1 (single place)
            self.metrics_log.write({
                "kind": "eval", "epoch": epoch + 1, "prec1": prec1,
                "prec5": prec5, "best_prec1": self.best_prec1})
        # closed HERE (not per-epoch) so a --prof window that crosses an
        # epoch boundary keeps tracing into the next epoch
        self.profiler.close()
        return self.best_prec1
