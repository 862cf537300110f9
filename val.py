#!/usr/bin/env python3
"""COCO val2017 evaluation CLI (reference val.py surface).

Usage:
    python val.py COCO -c configs/yolov4_Tianxiaomo.cfg \
        --checkpoint outputs/model_best.ckpt \
        [--conf-thre 0.0001] [--nms-thre 0.4] [--batch-size 8]
"""

from __future__ import annotations

import argparse

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

from yolov4_tpu.config import load_config
from yolov4_tpu.data.coco import COCODataset
from yolov4_tpu.data.pipeline import DataLoader
from yolov4_tpu.data.transforms import Transform
from yolov4_tpu.engine.evaluator import validate
from yolov4_tpu.engine.predictor import Predictor
from yolov4_tpu.utils import checkpoint as ckpt_lib
from yolov4_tpu.utils.logging import setup_logging, get_logger


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("data", metavar="DIR", help="path to COCO dataset root")
    parser.add_argument("-c", "--cfg", type=str,
                        default="configs/yolov4_default.cfg")
    parser.add_argument("-ckpt", "--checkpoint", type=str, default=None,
                        help="checkpoint path (.ckpt or reference .pth.tar)")
    parser.add_argument("--conf-thre", type=float, default=-0.1)
    parser.add_argument("--nms-thre", type=float, default=-0.1)
    parser.add_argument("--batch-size", type=int, default=-1,
                        help="eval batch size (default cfg TEST.BATCH_SIZE)")
    parser.add_argument("--workers", type=int, default=-1)
    parser.add_argument("--pre-nms-topk", type=int, default=-1,
                        help="candidate cap before NMS (default cfg "
                             "TEST.PRE_NMS_TOPK; raise for conf thresholds "
                             "like the published 0.0001)")
    parser.add_argument("--max-dets", type=int, default=-1,
                        help="fixed detections per image (default cfg "
                             "TEST.MAX_DETS; the reference emits unlimited "
                             "rows and pycocotools caps 100 per category — "
                             "use 1024 with the default --cat-cap 100 to "
                             "match that exactly; overflow is logged)")
    parser.add_argument("--cat-cap", type=int, default=-1,
                        help="per-(image,category) scoring cap emulated on "
                             "device (default cfg TEST.CAT_CAP=100, "
                             "pycocotools maxDets semantics; 0 disables)")
    parser.add_argument("--approx-topk", action="store_true",
                        help="approx_max_k candidate selection (recall "
                             "~0.95): faster postprocess tail, not "
                             "reference-exact")
    parser.add_argument("--quant", choices=("none", "int8", "int8_static"),
                        default=None,
                        help="serving quantization mode (default cfg "
                             "MODEL.QUANT; int8* are faster but not "
                             "reference-exact)")
    parser.add_argument("--letterbox", action="store_true",
                        help="aspect-preserving letterbox eval geometry "
                             "(cfg TEST.LETTERBOX; default: the "
                             "reference's stretch-resize)")
    return parser.parse_args()


def main():
    args = parse_args()
    setup_logging(0)
    logger = get_logger(__name__)
    cfg = load_config(args.cfg)
    conf = cfg["TEST"]["CONFTHRE"] if args.conf_thre < 0 else args.conf_thre
    nms = cfg["TEST"]["NMSTHRE"] if args.nms_thre < 0 else args.nms_thre
    if args.pre_nms_topk > 0:
        cfg["TEST"]["PRE_NMS_TOPK"] = args.pre_nms_topk
    if args.max_dets > 0:
        cfg["TEST"]["MAX_DETS"] = args.max_dets
    if args.cat_cap >= 0:
        cfg["TEST"]["CAT_CAP"] = args.cat_cap
    if args.approx_topk:
        cfg["TEST"]["APPROX_TOPK"] = True
    if args.quant is not None:
        cfg["MODEL"]["QUANT"] = args.quant
    if args.letterbox:
        cfg["TEST"]["LETTERBOX"] = True
    batch_size = cfg["TEST"].get("BATCH_SIZE", 8) if args.batch_size < 0 else args.batch_size
    workers = cfg["DATA"]["WORKERS"] if args.workers < 0 else args.workers

    dataset = COCODataset(
        root=args.data, name="val2017", img_size=cfg["TEST"]["IMGSIZE"],
        is_train=False, transform=Transform(cfg, is_train=False, keep_uint8=True),
        num_classes=cfg["MODEL"]["N_CLASSES"])
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        num_workers=workers)
    logger.info(f"val2017: {len(dataset)} images, batch {batch_size}, "
                f"imgsize {cfg['TEST']['IMGSIZE']}, conf {conf}, nms {nms}")

    variables = None
    if args.checkpoint:
        variables = ckpt_lib.load_variables(args.checkpoint)
        logger.info(f"loaded checkpoint {args.checkpoint}")
    else:
        logger.warning("no --checkpoint given: evaluating RANDOM weights")

    predictor = Predictor(cfg, variables=variables, batch_size=batch_size,
                          conf_thre=conf, nms_thre=nms)
    ap, ap50 = validate(loader, predictor)
    logger.info(f"AP[.50:.95] = {ap:.5f}  AP50 = {ap50:.5f}")
    return ap, ap50


if __name__ == "__main__":
    main()
