#!/usr/bin/env python3
"""Export the serving program as a single self-contained artifact.

Weights (native .ckpt or reference .pth.tar, converted on the fly) are
baked into a serialized StableHLO module covering uint8 wire bytes ->
forward -> decode -> NMS; deployment needs only JAX on the target
backend and the emitted file (yolov4_tpu/utils/export.py). int8_static
exports calibrate on --calib-images first (the scales are program
constants in the artifact).

    python tools/export_serving.py out.y4x [--ckpt model_best.pth.tar]
        [--cfg configs/yolov4_Tianxiaomo.cfg] [--img-size 608]
        [--batch-size 16] [--quant int8_static --calib-images DIR]
        [--selfcheck]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("output")
    p.add_argument("--cfg", default="configs/yolov4_Tianxiaomo.cfg")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--conf-thre", type=float, default=-1)
    p.add_argument("--nms-thre", type=float, default=-1)
    p.add_argument("--quant", choices=("none", "int8", "int8_static"),
                   default=None)
    p.add_argument("--calib-images", default=None,
                   help="directory of jpg/png for int8_static calibration")
    p.add_argument("--wire-dtype", choices=("uint8", "float32"),
                   default="uint8")
    p.add_argument("--selfcheck", action="store_true",
                   help="reload the artifact and verify bit-identical "
                        "output vs the live predictor on a random batch")
    args = p.parse_args()

    from yolov4_tpu.config import load_config
    from yolov4_tpu.engine.predictor import Predictor
    from yolov4_tpu.utils import checkpoint as ckpt_lib
    from yolov4_tpu.utils.export import export_serving, load_serving

    cfg = load_config(args.cfg)
    if args.quant is not None:
        cfg["MODEL"]["QUANT"] = args.quant
    conf = cfg["TEST"]["CONFTHRE"] if args.conf_thre < 0 else args.conf_thre
    nms = cfg["TEST"]["NMSTHRE"] if args.nms_thre < 0 else args.nms_thre
    size = args.img_size or cfg["TEST"]["IMGSIZE"]

    variables = None
    if args.ckpt:
        variables = ckpt_lib.load_variables(args.ckpt)
        print(f"loaded {args.ckpt}")
    else:
        print("WARNING: no --ckpt — exporting RANDOM weights (plumbing "
              "check only)")

    predictor = Predictor(cfg, variables=variables, img_size=size,
                          batch_size=args.batch_size, conf_thre=conf,
                          nms_thre=nms)

    if cfg["MODEL"].get("QUANT") == "int8_static":
        import glob

        import cv2
        paths = []
        if args.calib_images:
            for pat in ("*.jpg", "*.png"):
                paths += glob.glob(os.path.join(args.calib_images, pat))
        loaded = []
        for f in paths[:args.batch_size]:
            img = cv2.imread(f)
            if img is None:
                print(f"WARNING: skipping unreadable image {f}")
                continue
            loaded.append(cv2.resize(img[:, :, ::-1], (size, size)))
        if loaded:
            imgs = np.stack(loaded).astype(np.uint8)
            print(f"calibrating on {len(imgs)} image(s)")
        else:
            print("WARNING: int8_static with no --calib-images — "
                  "calibrating on RANDOM data")
            imgs = np.random.default_rng(0).integers(
                0, 256, (args.batch_size, size, size, 3), np.uint8)
        predictor.calibrate(imgs)

    wire_dtype = np.uint8 if args.wire_dtype == "uint8" else np.float32
    header = export_serving(predictor, args.output, wire_dtype=wire_dtype)
    mb = os.path.getsize(args.output) / 1e6
    print(f"exported {args.output} ({mb:.1f} MB): {header}")

    if args.selfcheck:
        art = load_serving(args.output)
        rng = np.random.default_rng(0)
        imgs = (rng.integers(0, 256, (2, size, size, 3), np.uint8)
                if wire_dtype == np.uint8 else
                rng.random((2, size, size, 3), np.float32))
        got = art.predict(imgs)
        want = predictor.dispatch(imgs)  # raw outs: same arity as export
        for g, w, name in zip(got, want, header["outputs"]):
            w = np.asarray(w)[:imgs.shape[0]]
            assert g.shape == w.shape, (name, g.shape, w.shape)
            np.testing.assert_array_equal(g, w, err_msg=name)
        print(f"selfcheck OK: artifact output bit-identical "
              f"({[o for o in header['outputs']]})")


if __name__ == "__main__":
    main()
