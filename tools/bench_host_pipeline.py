#!/usr/bin/env python3
"""Host input-pipeline throughput: mosaic augmentation at 608^2 with N
worker processes (no device in the loop).

The train step consumes ~98 img/s/chip at 608/b8 (docs/PERF.md); the host
pipeline must sustain that per chip it feeds. Reference equivalence:
DataLoader workers, yolo/data/build.py:49-51.

    python tools/bench_host_pipeline.py [--workers 4 8 16] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def make_dataset_root(n_images: int = 48) -> str:
    """Realistic-resolution fake COCO (640x480 jpgs, several boxes each)."""
    import json

    import cv2

    root = tempfile.mkdtemp(prefix="coco_hostbench_")
    img_dir = os.path.join(root, "images", "train2017")
    os.makedirs(img_dir)
    os.makedirs(os.path.join(root, "annotations"))
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(1, n_images + 1):
        img = rng.integers(0, 255, (480, 640, 3), np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:012d}.jpg"), img)
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "width": 640, "height": 480})
        for _ in range(6):
            x, y = float(rng.uniform(0, 500)), float(rng.uniform(0, 350))
            w, h = float(rng.uniform(20, 130)), float(rng.uniform(20, 120))
            anns.append({"id": len(anns) + 1, "image_id": i,
                         "category_id": int(rng.integers(1, 81)),
                         "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
    cats = [{"id": c, "name": str(c)} for c in range(1, 91)]
    with open(os.path.join(root, "annotations",
                           "instances_train2017.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": cats}, f)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", type=int, nargs="+", default=[4, 8, 16])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--img-size", type=int, default=608)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--device-aug", action="store_true",
                   help="benchmark the CanvasTransform host path instead "
                        "(augmentation itself runs on device)")
    args = p.parse_args()

    from yolov4_tpu.config import load_config
    from yolov4_tpu.data.coco import COCODataset
    from yolov4_tpu.data.pipeline import DataLoader
    from yolov4_tpu.data.transforms import Transform

    root = make_dataset_root()
    cfg = load_config()
    cfg["TRAIN"]["IMGSIZE"] = args.img_size
    if args.device_aug:
        # device-aug path: host only decodes + stretch-resizes the members
        from yolov4_tpu.data.device_aug import CanvasTransform
        transform = CanvasTransform(cfg)
    else:
        transform = Transform(cfg, is_train=True)
    ds = COCODataset(root, "train2017", img_size=args.img_size, is_train=True,
                     transform=transform, num_classes=80)

    print(f"mosaic train pipeline @ {args.img_size}^2, batch {args.batch} "
          f"({os.cpu_count()} host CPUs)")
    for nw in args.workers:
        loader = DataLoader(ds, batch_size=args.batch, shuffle=True,
                            num_workers=nw, seed=0)
        n = 0
        # warm epoch spins up the pool
        for imgs, _ in loader:
            n += imgs.shape[0]
            break
        t0 = time.time()
        n = 0
        for ep in range(args.epochs):
            loader.set_epoch(ep)
            for imgs, _ in loader:
                n += imgs.shape[0]
        dt = time.time() - t0
        rate = n / dt
        print(f"workers={nw:3d}: {rate:7.1f} img/s "
              f"({rate / 98.0:.1f} chips' worth at 98 img/s/chip)")
        loader.close()


if __name__ == "__main__":
    main()
