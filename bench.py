#!/usr/bin/env python3
"""End-to-end inference benchmark (north star: preproc + model + NMS
images/sec/chip at 608x608, COCO eval protocol shapes).

Per batch, the measured pipeline is exactly what a serving loop does:
  host stretch-resize (cv2, thread pool) -> FLAT uint8 upload (flat avoids
  the 3->128 lane-padding transfer tax) -> on-device /255 normalize +
  YOLOv4 bf16 forward + anchor decode + class-wise NMS -> fixed-shape
  detections fetched to host.

Host preprocessing and uploads overlap device execution (async dispatch,
results fetched one batch behind).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput number (BASELINE.md), so
vs_baseline is null.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import cv2  # noqa: E402
import jax  # noqa: E402

from yolov4_tpu.config import load_config  # noqa: E402
from yolov4_tpu.engine.predictor import Predictor  # noqa: E402


def make_sources(n: int, seed: int = 0):
    """Synthetic 'decoded camera frames' of varied sizes (BGR uint8)."""
    rng = np.random.default_rng(seed)
    sizes = [(480, 640), (720, 1280), (576, 768), (1080, 810)]
    out = []
    for i in range(n):
        h, w = sizes[i % len(sizes)]
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        for _ in range(6):
            x, y = int(rng.integers(0, w - 60)), int(rng.integers(0, h - 60))
            cv2.rectangle(img, (x, y), (x + 50, y + 40),
                          tuple(int(c) for c in rng.integers(0, 255, 3)), -1)
        out.append(img)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--img-size", type=int, default=608)
    parser.add_argument("--batch-size", type=int, default=16)
    # 120 iters -> 12 measurement windows (~2-4 min): the shared tunnel
    # drifts 2-4x over minutes-long congestion episodes (observed 12-40
    # img/s across runs of identical programs), so the median needs to
    # sample a span longer than one episode
    parser.add_argument("--iters", type=int, default=120)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--conf-thre", type=float, default=0.005)
    parser.add_argument("--nms-thre", type=float, default=0.4)
    parser.add_argument("--preproc-threads", type=int, default=8)
    args = parser.parse_args()
    size, batch = args.img_size, args.batch_size

    cfg = load_config()
    predictor = Predictor(cfg, img_size=size, batch_size=batch,
                          conf_thre=args.conf_thre, nms_thre=args.nms_thre)

    sources = make_sources(64)
    pool = ThreadPoolExecutor(args.preproc_threads)

    def _resize(frame):
        return cv2.resize(frame[:, :, ::-1], (size, size),
                          interpolation=cv2.INTER_LINEAR)

    def preprocess_batch(i):
        chunk = [sources[(i * batch + j) % len(sources)] for j in range(batch)]
        return np.stack(list(pool.map(_resize, chunk)))

    # compile (uint8 variant) + warmup
    for i in range(args.warmup):
        det, valid = predictor.dispatch(preprocess_batch(i))
    np.asarray(det)

    # The shared-tunnel environment is noisy: measure several windows and
    # report the median (per-window rates go to stderr). Several batches
    # stay in flight so host preprocessing + tunnel uploads/fetches overlap
    # device execution (the tunnel adds 100s of ms of latency per transfer;
    # depth-1 pipelining left the chip idle between batches).
    from collections import deque

    def window(n_iters, depth=4):
        t0 = time.time()
        inflight = deque()
        for i in range(n_iters):
            inflight.append(predictor.dispatch(preprocess_batch(i)))
            if len(inflight) > depth:
                np.asarray(inflight.popleft()[1])
        while inflight:
            np.asarray(inflight.popleft()[1])
        return n_iters * batch / (time.time() - t0)

    windows = max(3, args.iters // 10)
    per_window = max(5, args.iters // windows)
    window(3)  # throwaway: tunnel/queue warm-up beyond program compile
    rates = [window(per_window) for _ in range(windows)]
    print(f"windows (img/s): {[round(r, 1) for r in rates]}", file=sys.stderr)
    images_per_sec = float(np.median(rates))
    result = {
        "metric": f"coco_e2e_images_per_sec_per_chip_{size}",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": None,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
