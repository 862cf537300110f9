#!/usr/bin/env python3
"""End-to-end inference benchmark (north star: preproc + model + NMS
images/sec/chip at 608x608, COCO eval protocol shapes).

Measures the full per-image pipeline on one chip:
  host stretch-resize (cv2, like the val transform) -> uint8 NHWC upload ->
  on-device normalize + YOLOv4 bf16 forward + decode + class-wise NMS ->
  detections fetched back to host.

Host preprocessing of batch i+1 overlaps device execution of batch i
(async dispatch, fetch one behind), mirroring a production serving loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput number (BASELINE.md), so
vs_baseline is null.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import cv2  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolov4_tpu.config import load_config  # noqa: E402
from yolov4_tpu.models import build_model  # noqa: E402
from yolov4_tpu.models.yolov4 import init_variables  # noqa: E402
from yolov4_tpu.ops.postprocess import postprocess  # noqa: E402


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
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--conf-thre", type=float, default=0.005)
    parser.add_argument("--nms-thre", type=float, default=0.4)
    args = parser.parse_args()
    size, batch = args.img_size, args.batch_size

    cfg = load_config()
    model = build_model(cfg)  # bf16 compute
    variables = jax.device_put(
        init_variables(model, jax.random.PRNGKey(0), size))

    @jax.jit
    def run(variables, u8):
        imgs = u8.astype(jnp.float32) / 255.0
        preds = model.apply(variables, imgs, train=False)
        return postprocess(preds, cfg["MODEL"]["N_CLASSES"],
                           args.conf_thre, args.nms_thre,
                           pre_nms_topk=cfg["TEST"]["PRE_NMS_TOPK"],
                           max_dets=cfg["TEST"]["MAX_DETS"])

    sources = make_sources(64)

    def preprocess_batch(i):
        chunk = [sources[(i * batch + j) % len(sources)] for j in range(batch)]
        resized = [cv2.resize(f[:, :, ::-1], (size, size),
                              interpolation=cv2.INTER_LINEAR) for f in chunk]
        return np.stack(resized)

    # compile + warmup
    for i in range(args.warmup):
        det, valid = run(variables, jnp.asarray(preprocess_batch(i)))
    np.asarray(det)

    # steady state: preproc of batch i+1 overlaps device batch i
    n_dets = 0
    t0 = time.time()
    pending = None
    for i in range(args.iters):
        u8 = preprocess_batch(i)
        fut = run(variables, jnp.asarray(u8))
        if pending is not None:
            det, valid = pending
            n_dets += int(np.asarray(valid).sum())
        pending = fut
    det, valid = pending
    n_dets += int(np.asarray(valid).sum())
    dt = time.time() - t0

    images_per_sec = args.iters * batch / dt
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
