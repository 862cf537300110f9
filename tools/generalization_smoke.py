#!/usr/bin/env python3
"""Generalization smoke: train on synthetic detectable shapes, score a
HELD-OUT split.

Stronger evidence than tools/overfit_smoke.py (which drives one fixed
batch to memorization): here the annotations correspond to drawn objects
(rectangle / circle / triangle = three classes, tests/fixtures.py
make_shapes_coco), the training split is iterated through the REAL loader
(shuffling, fresh batches every epoch), and AP is measured on images the
model has never seen — nonzero held-out AP can only come from learned,
generalizable detection, not memorization.

    python tools/generalization_smoke.py [--epochs 40] [--img-size 320]
        [--train-images 128] [--val-images 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import ml_dtypes
import numpy as np

from tests.fixtures import make_shapes_coco
from yolov4_tpu.config import load_config
from yolov4_tpu.data.coco import COCODataset
from yolov4_tpu.data.pipeline import DataLoader
from yolov4_tpu.data.transforms import Transform
from yolov4_tpu.engine.evaluator import validate
from yolov4_tpu.engine.predictor import Predictor
from yolov4_tpu.models import build_model
from yolov4_tpu.models.yolov4 import init_variables
from yolov4_tpu.ops.loss import build_criterion
from yolov4_tpu.optim import build_lr_schedule, build_optimizer
from yolov4_tpu.parallel import create_mesh, create_train_state, make_train_step


def report_recipe_curve(output_dir, milestones):
    """Print the per-epoch held-out AP curve from metrics.jsonl and say
    whether the post-milestone LR drop measurably helped (mean AP50 of the
    post-first-milestone epochs vs the 3 epochs just before it)."""
    import json
    path = os.path.join(output_dir, "metrics.jsonl")
    evals = [json.loads(l) for l in open(path)]
    evals = [r for r in evals if r.get("kind") == "eval"]
    curve = [(r["epoch"], r["ap"], r["ap50"]) for r in evals]
    print("held-out AP curve (epoch, AP, AP50):")
    for e, ap, ap50 in curve:
        mark = " <- milestone" if e - 1 in milestones else ""
        print(f"  {e:3d}  {ap:.3f}  {ap50:.3f}{mark}")
    m0 = milestones[0]
    pre = [ap50 for e, _, ap50 in curve if m0 - 3 < e <= m0]
    post = [ap50 for e, _, ap50 in curve if e > m0]
    if pre and post:
        print(f"post-milestone LR drop: mean AP50 {np.mean(pre):.3f} "
              f"(3 epochs pre) -> {np.mean(post):.3f} (post), "
              f"delta {np.mean(post) - np.mean(pre):+.4f}")


def quant_ab(cfg, variables, root, S, B):
    """Held-out-split accuracy of the serving presets vs bf16 on the SAME
    params (the train-set-only overfit numbers were weaker evidence: bf16
    run-to-run spread there is the same magnitude as the quant delta)."""
    import copy

    val_ds = COCODataset(root, "val2017", img_size=S, is_train=False,
                         transform=Transform(cfg, is_train=False,
                                             keep_uint8=True))

    def score(mode_cfg):
        pred = Predictor(mode_cfg, variables=variables, img_size=S,
                         batch_size=B, conf_thre=0.3, nms_thre=0.4)
        return validate(DataLoader(val_ds, batch_size=B, shuffle=False),
                        pred, verbose=False)

    base_cfg = copy.deepcopy(dict(cfg))
    base_cfg["MODEL"]["QUANT"] = "none"
    base_cfg["TEST"]["APPROX_TOPK"] = False
    ap, ap50 = score(base_cfg)
    print(f"bf16 held-out (same params): AP {ap:.3f} AP50 {ap50:.3f}")
    presets = [("int8/late", {"QUANT": "int8", "QUANT_SPAN": "late"}, {}),
               ("int8/full", {"QUANT": "int8", "QUANT_SPAN": "full"}, {}),
               ("int8_static/late",
                {"QUANT": "int8_static", "QUANT_SPAN": "late"}, {}),
               ("int8_static/full",
                {"QUANT": "int8_static", "QUANT_SPAN": "full"}, {}),
               ("approx_topk", {}, {"APPROX_TOPK": True})]
    for name, mupd, tupd in presets:
        qcfg = copy.deepcopy(dict(cfg))
        qcfg["MODEL"]["QUANT"] = "none"
        qcfg["TEST"]["APPROX_TOPK"] = False
        qcfg["MODEL"].update(mupd)
        qcfg["TEST"].update(tupd)
        qap, qap50 = score(qcfg)
        print(f"{name:18s} held-out: AP {qap:.3f} (delta {qap - ap:+.4f}) "
              f"AP50 {qap50:.3f} (delta {qap50 - ap50:+.4f})")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--img-size", type=int, default=320)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--train-images", type=int, default=128)
    parser.add_argument("--val-images", type=int, default=32)
    parser.add_argument("--root", default="/tmp/coco_shapes")
    parser.add_argument("--assert-ap50", type=float, default=-1.0,
                        help="fail below this held-out AP50 (<0 = report only)")
    parser.add_argument("--use-trainer", action="store_true",
                        help="drive the PRODUCTION engine.Trainer instead "
                             "of the manual loop: reference augmentation "
                             "(mosaic/flip/HSV), per-epoch held-out eval, "
                             "best-AP50 checkpointing")
    parser.add_argument("--device-aug", action="store_true",
                        help="with --use-trainer: run the augmentation on "
                             "device (AUGMENTATION.DEVICE)")
    parser.add_argument("--recipe", action="store_true",
                        help="with --use-trainer: the FULL reference "
                             "training recipe scaled to the smoke — "
                             "per-iter warmup (2 ep) -> Adam -> MultiStep "
                             "milestones at [2/3, 5/6]*epochs (gamma 0.1) "
                             "-> accumulation 2 -> per-epoch held-out eval "
                             "-> best-AP50 ckpt (reference "
                             "main_amp.py:190-229 + lr_schedulers/"
                             "build.py:17-27); prints the AP curve and "
                             "whether the post-milestone LR drop helped")
    parser.add_argument("--quant-eval", action="store_true",
                        help="after training, score the HELD-OUT split "
                             "through the int8 / int8_static / approx-topk "
                             "serving presets and report AP deltas vs the "
                             "bf16 eval of the same params")
    parser.add_argument("--resume", default=None,
                        help="with --use-trainer: resume a killed smoke "
                             "run from its checkpoint.ckpt (same flags -> "
                             "same OUTPUT_DIR; the curve in metrics.jsonl "
                             "spans both segments)")
    parser.add_argument("--seed", type=int, default=0,
                        help="init/loader/aug seed — run 3+ seeds for "
                             "mean±spread learning evidence")
    parser.add_argument("--hard", action="store_true",
                        help="harder dataset: 6 classes (incl. a hollow "
                             "ring), up to 8 overlapping shapes/image, "
                             "log-uniform scales ~min/40..min/4 "
                             "(tests/fixtures.make_shapes_coco hard=True)")
    # ---- opt-in recipe knobs (A/B levers; all match the cfg keys) ----
    parser.add_argument("--box-loss", default=None,
                        choices=("mse", "iou", "giou", "diou", "ciou"),
                        help="CRITERION.BOX_LOSS for this run")
    parser.add_argument("--ema", type=float, default=None,
                        help="TRAIN.EMA_DECAY for this run (e.g. 0.99)")
    parser.add_argument("--multiscale", default=None,
                        help="comma-separated TRAIN.MULTISCALE sizes, "
                             "e.g. 288,320,352")
    parser.add_argument("--letterbox", action="store_true",
                        help="TEST.LETTERBOX eval geometry")
    parser.add_argument("--width", type=float, default=1.0,
                        help="MODEL.WIDTH (reduced variants for CPU "
                             "plumbing checks; recorded runs use 1.0)")
    parser.add_argument("--depth", type=float, default=1.0)
    args = parser.parse_args()
    S, B = args.img_size, args.batch_size

    # regenerate when the on-disk dataset was built with different params
    # (a stale root would silently train on data the flags don't describe)
    import json
    stamp_path = os.path.join(args.root, "dataset_params.json")
    stamp = {"train_images": args.train_images, "val_images": args.val_images,
             "img_size": S, "hard": bool(args.hard)}
    on_disk = None
    if os.path.isfile(stamp_path):
        with open(stamp_path) as f:
            on_disk = json.load(f)
    if on_disk != stamp:
        if os.path.isdir(args.root):
            import shutil
            shutil.rmtree(args.root)
        # disjoint seeds -> disjoint shape layouts; val images are unseen.
        # NOTE: dataset seeds stay FIXED — --seed varies init/shuffle/aug
        # only, so multi-seed runs measure training variance on one task.
        make_shapes_coco(args.root, "train2017", n_images=args.train_images,
                         seed=100, img_hw=(S, S), id_base=1000,
                         hard=args.hard)
        make_shapes_coco(args.root, "val2017", n_images=args.val_images,
                         seed=999, img_hw=(S, S), id_base=90000,
                         hard=args.hard)
        with open(stamp_path, "w") as f:
            json.dump(stamp, f)

    cfg = load_config()
    if args.width != 1.0 or args.depth != 1.0:
        cfg["MODEL"].update(WIDTH=args.width, DEPTH=args.depth)
    cfg["TRAIN"]["IMGSIZE"] = S
    cfg["TEST"].update(IMGSIZE=S, BATCH_SIZE=B, CONFTHRE=0.3, NMSTHRE=0.4)
    # light, label-preserving augmentation: flips on (shapes stay valid),
    # mosaic/color off to keep the smoke fast and deterministic-ish
    cfg["AUGMENTATION"].update(IS_MOSAIC=False, COLOR_DITHERING=False,
                               RANDOM_HORIZONTAL_FLIP=True, JITTER=0.0)
    cfg["OPTIMIZER"]["LR"] = 1e-3
    cfg["LR_SCHEDULER"].update(IS_WARMUP=True, WARMUP_EPOCH=1)
    knob_desc = []
    if args.box_loss is not None:
        cfg["CRITERION"]["BOX_LOSS"] = args.box_loss
        knob_desc.append(f"box_loss={args.box_loss}")
    if args.ema is not None:
        cfg["TRAIN"]["EMA_DECAY"] = args.ema
        knob_desc.append(f"ema={args.ema}")
    if args.multiscale is not None:
        sizes = [int(s) for s in args.multiscale.split(",") if s]
        cfg["TRAIN"]["MULTISCALE"] = sizes
        knob_desc.append(f"multiscale={sizes}")
    if args.letterbox:
        cfg["TEST"]["LETTERBOX"] = True
        knob_desc.append("letterbox")
    if args.hard:
        knob_desc.append("hard")
    if args.seed:
        knob_desc.append(f"seed={args.seed}")
    knobs = (" [" + ", ".join(knob_desc) + "]") if knob_desc else ""

    if args.use_trainer:
        # the full production path: reference mosaic/crop/flip/HSV
        # augmentation (host, or on-device with --device-aug), per-epoch
        # held-out validation, best-AP50 checkpoint (reference
        # main_amp.py's whole epoch loop)
        from yolov4_tpu.engine.trainer import Trainer
        cfg["AUGMENTATION"].update(IS_MOSAIC=True, COLOR_DITHERING=True,
                                   JITTER=0.3, DEVICE=bool(args.device_aug))
        out_tag = "out" + ("_" + "_".join(
            d.replace("=", "").replace("[", "").replace("]", "")
            .replace(", ", "-").replace(" ", "")
            for d in knob_desc) if knob_desc else "")
        if args.device_aug:
            out_tag += "_devaug"
        cfg["TRAIN"].update(MAX_EPOCHS=args.epochs,
                            OUTPUT_DIR=os.path.join(args.root, out_tag))
        cfg["DATA"].update(WORKERS=0, BATCH_SIZE=B)
        milestones = []
        if args.recipe:
            # the reference recipe composed end-to-end, epoch counts scaled
            # from 90/[50,70,80]/warmup-5/accum-1|4 down to the smoke
            milestones = sorted({max(2, round(args.epochs * 2 / 3)),
                                 max(3, round(args.epochs * 5 / 6))})
            cfg["LR_SCHEDULER"].update(TYPE="MultiStepLR",
                                       MILESTONES=milestones, GAMMA=0.1,
                                       IS_WARMUP=True, WARMUP_EPOCH=2)
            cfg["TRAIN"]["ACCUMULATION_STEPS"] = 2
        t0 = time.time()
        trainer = Trainer(cfg, args.root, resume=args.resume, seed=args.seed)
        best_ap, best_ap50 = trainer.fit()
        print(f"TRAINER mode ({'device' if args.device_aug else 'host'} "
              f"aug{', full recipe' if args.recipe else ''}){knobs}: "
              f"best held-out AP {best_ap:.3f} AP50 {best_ap50:.3f} "
              f"in {time.time() - t0:.0f}s")
        if args.recipe:
            report_recipe_curve(cfg["TRAIN"]["OUTPUT_DIR"], milestones)
        if args.quant_eval:
            variables = {"params": trainer.state.params,
                         "batch_stats": trainer.state.batch_stats}
            quant_ab(cfg, variables, args.root, S, B)
        if args.assert_ap50 >= 0:
            assert best_ap50 >= args.assert_ap50, (
                f"held-out AP50 {best_ap50:.3f} < {args.assert_ap50}")
        return

    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), S)
    tx = build_optimizer(cfg, variables["params"])

    train_ds = COCODataset(args.root, "train2017", img_size=S, is_train=True,
                           transform=Transform(cfg, is_train=True, seed=0),
                           seed=0)
    loader = DataLoader(train_ds, batch_size=B, shuffle=True, seed=0)
    len_epoch = len(loader)
    sched = build_lr_schedule(cfg, len_epoch=len_epoch)
    step = make_train_step(model, build_criterion(cfg), tx, sched,
                           create_mesh(), accumulation_steps=1, img_size=S)
    state = create_train_state(variables, tx)

    t0 = time.time()
    it = 0
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        for imgs, target in loader:
            flat = np.ascontiguousarray(imgs).reshape(
                imgs.shape[0], -1).astype(ml_dtypes.bfloat16)
            state = step(state, flat, target["padded_labels"])
            it += 1
        if (epoch + 1) % 5 == 0 or epoch == 0:
            print(f"epoch {epoch + 1}/{args.epochs} (step {it}): "
                  f"loss {float(state.loss):.1f}", flush=True)

    val_ds = COCODataset(args.root, "val2017", img_size=S, is_train=False,
                         transform=Transform(cfg, is_train=False,
                                             keep_uint8=True))
    predictor = Predictor(
        cfg, variables={"params": state.params,
                        "batch_stats": state.batch_stats},
        img_size=S, batch_size=B, conf_thre=0.3, nms_thre=0.4)
    ap, ap50 = validate(DataLoader(val_ds, batch_size=B, shuffle=False),
                        predictor, verbose=False)
    # train-split score for the generalization gap readout
    tr_eval_ds = COCODataset(args.root, "train2017", img_size=S,
                             is_train=False,
                             transform=Transform(cfg, is_train=False,
                                                 keep_uint8=True))
    tr_ap, tr_ap50 = validate(
        DataLoader(tr_eval_ds, batch_size=B, shuffle=False),
        predictor, verbose=False)
    dt = time.time() - t0
    print(f"HELD-OUT val: AP {ap:.3f} AP50 {ap50:.3f} | "
          f"train split: AP {tr_ap:.3f} AP50 {tr_ap50:.3f} | "
          f"{it} steps in {dt:.0f}s")
    if args.quant_eval:
        quant_ab(cfg, {"params": state.params,
                       "batch_stats": state.batch_stats}, args.root, S, B)
    if args.assert_ap50 >= 0:
        assert ap50 >= args.assert_ap50, (
            f"held-out AP50 {ap50:.3f} < {args.assert_ap50}")


if __name__ == "__main__":
    main()
