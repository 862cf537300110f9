#!/usr/bin/env python3
"""End-to-end learning smoke: overfit 8 synthetic images on one chip and
verify AP -> ~1.0 on the training images.

Round-1 result on the real v5e (320x320, batch 8, bf16, Adam 1e-3 with
30-step warmup): loss 2725 -> 92 over 300 steps, train-set AP 0.959 /
AP50 1.000. Run time ~5 min warm cache.

    python tools/overfit_smoke.py [--steps 300] [--img-size 320]
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

from tests.fixtures import make_fake_coco
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--img-size", type=int, default=320)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--root", default="/tmp/coco_overfit")
    parser.add_argument("--quant-eval", action="store_true",
                        help="also evaluate the trained model with "
                        "MODEL.QUANT int8 and report the AP delta")
    args = parser.parse_args()
    S, B = args.img_size, args.batch_size

    if not os.path.isdir(args.root):
        make_fake_coco(args.root, "train2017", n_images=B, seed=11, img_hw=(240, 320))
        make_fake_coco(args.root, "val2017", n_images=B, seed=11, img_hw=(240, 320))

    cfg = load_config()
    cfg["TRAIN"]["IMGSIZE"] = S
    cfg["TEST"].update(IMGSIZE=S, BATCH_SIZE=B, CONFTHRE=0.3, NMSTHRE=0.4)
    cfg["AUGMENTATION"].update(IS_MOSAIC=False, COLOR_DITHERING=False,
                               RANDOM_HORIZONTAL_FLIP=False, JITTER=0.0)
    cfg["OPTIMIZER"]["LR"] = 1e-3
    cfg["LR_SCHEDULER"].update(IS_WARMUP=True, WARMUP_EPOCH=1)

    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), S)
    tx = build_optimizer(cfg, variables["params"])
    sched = build_lr_schedule(cfg, len_epoch=30)
    step = make_train_step(model, build_criterion(cfg), tx, sched,
                           create_mesh(), accumulation_steps=1, img_size=S)
    state = create_train_state(variables, tx)

    ds = COCODataset(args.root, "train2017", img_size=S, is_train=True,
                     transform=Transform(cfg, is_train=True, seed=0), seed=0)
    imgs, target = next(iter(DataLoader(ds, batch_size=B, shuffle=False)))
    flat = np.ascontiguousarray(imgs).reshape(B, -1).astype(ml_dtypes.bfloat16)
    labels = target["padded_labels"]

    t0 = time.time()
    first = None
    for i in range(args.steps):
        state = step(state, flat, labels)
        if (i + 1) % 60 == 0 or i == 0:
            loss = float(state.loss)
            first = first or loss
            print(f"step {i + 1}: loss {loss:.1f}")

    val_ds = COCODataset(args.root, "val2017", img_size=S, is_train=False,
                         transform=Transform(cfg, is_train=False, keep_uint8=True))
    predictor = Predictor(
        cfg, variables={"params": state.params, "batch_stats": state.batch_stats},
        img_size=S, batch_size=B, conf_thre=0.3, nms_thre=0.4)
    ap, ap50 = validate(DataLoader(val_ds, batch_size=B, shuffle=False),
                        predictor, verbose=False)
    print(f"final loss {float(state.loss):.1f}, train-set AP {ap:.3f} "
          f"AP50 {ap50:.3f} in {time.time() - t0:.0f}s")

    if args.quant_eval:
        import copy

        for mode in ("int8", "int8_static"):
            for span in ("late", "full"):
                qcfg = copy.deepcopy(dict(cfg))
                qcfg["MODEL"].update(QUANT=mode, QUANT_SPAN=span)
                qpred = Predictor(
                    qcfg, variables={"params": state.params,
                                     "batch_stats": state.batch_stats},
                    img_size=S, batch_size=B, conf_thre=0.3, nms_thre=0.4)
                # int8_static auto-calibrates on the first dispatched batch
                qap, qap50 = validate(
                    DataLoader(val_ds, batch_size=B, shuffle=False),
                    qpred, verbose=False)
                print(f"{mode}/{span} serving eval: AP {qap:.3f} "
                      f"(delta {qap - ap:+.4f}) AP50 {qap50:.3f} "
                      f"(delta {qap50 - ap50:+.4f})")

    assert ap50 > 0.9, "learning smoke failed"


if __name__ == "__main__":
    main()
