#!/usr/bin/env python3
"""Serving-runtime benchmark: dynamic batcher vs raw pipelined Predictor.

Measures what the runtime layer costs on top of the compiled serving
program: requests flow one-at-a-time through the DynamicBatcher (closed-loop
concurrency C) and the same images run as pre-formed batches through
Predictor.dispatch with the same in-flight depth. Both sides sync by
fetching result VALUES (np.asarray of the detection buffers) — the honest
method on this backend (docs/PERF.md timing rules).

Usage:
    python tools/bench_serve.py [--size 608] [--batch-size 16] [--n 256]
        [--concurrency 64] [--max-wait-ms 8] [--quant int8_static]
        [--http]  # also measure through a real HTTP socket

Prints one JSON line with img/s + latency quantiles for each mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

from yolov4_tpu.config import load_config
from yolov4_tpu.engine.predictor import Predictor
from yolov4_tpu.serve import ServingRuntime, make_server, serve_background


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="configs/yolov4_Tianxiaomo.cfg")
    p.add_argument("--size", type=int, default=608)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--n", type=int, default=256, help="requests per mode")
    p.add_argument("--concurrency", type=int, default=64,
                   help="closed-loop in-flight requests (client side)")
    p.add_argument("--max-wait-ms", type=float, default=8.0)
    p.add_argument("--inflight", type=int, default=3)
    p.add_argument("--conf-thre", type=float, default=0.25)
    p.add_argument("--quant", choices=("none", "int8", "int8_static"),
                   default=None)
    p.add_argument("--http", action="store_true",
                   help="additionally drive requests over a real socket")
    p.add_argument("--warmup-batches", type=int, default=4)
    p.add_argument("--windows", type=int, default=4,
                   help="interleaved direct/runtime A-B windows")
    return p.parse_args()


def _quantiles(ms):
    arr = np.asarray(ms, np.float64)
    return {f"p{q}": round(float(np.percentile(arr, q)), 2)
            for q in (50, 90, 99)}


def bench_direct(pred: Predictor, images: np.ndarray, inflight: int) -> dict:
    """Ideal: pre-formed full batches, depth-pipelined dispatch,
    value-fetch sync on every batch's detections."""
    b = pred.batch_size
    n_batches = images.shape[0] // b
    t0 = time.perf_counter()
    pending = []
    for i in range(n_batches):
        pending.append(pred.dispatch(images[i * b:(i + 1) * b]))
        if len(pending) > inflight:
            out = pending.pop(0)
            np.asarray(out[0]), np.asarray(out[1])  # value fetch
    for out in pending:
        np.asarray(out[0]), np.asarray(out[1])
    dt = time.perf_counter() - t0
    return {"img_s": round(n_batches * b / dt, 1),
            "ms_per_batch": round(dt / n_batches * 1e3, 2)}


def bench_runtime(rt: ServingRuntime, images: np.ndarray,
                  concurrency: int, size: int) -> dict:
    bucket = rt.buckets[size]
    info = (size, size, size, size)
    lat = []
    t0 = time.perf_counter()

    def one(i):
        t = time.perf_counter()
        res = bucket.submit_canvas(images[i], info, timeout=60).result(600)
        lat.append((time.perf_counter() - t) * 1e3)
        return res

    with ThreadPoolExecutor(max_workers=concurrency) as ex:
        list(ex.map(one, range(images.shape[0])))
    dt = time.perf_counter() - t0
    snap = rt.metrics.snapshot()
    fill = snap["latency"]["batch_fill"]
    return {"img_s": round(images.shape[0] / dt, 1),
            "latency_ms": _quantiles(lat),
            "batch_fill_mean": round(fill.get("mean_window", 0.0), 3)}


def bench_http(rt: ServingRuntime, images: np.ndarray,
               concurrency: int, size: int) -> dict:
    """Measure both HTTP bodies: jpeg (/v1/detect, pays the host-CPU
    decode — the bound on 1-CPU hosts) and raw BGR (/v1/detect_raw,
    what a pre-decoded upstream ships — runtime-speed path)."""
    import cv2
    import urllib.request
    srv = make_server(rt, port=0)
    serve_background(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    h, w = images.shape[1:3]
    modes = {
        "jpeg": (f"{base}/v1/detect?size={size}",
                 [cv2.imencode(".jpg", img)[1].tobytes() for img in images]),
        "raw": (f"{base}/v1/detect_raw?h={h}&w={w}&size={size}",
                [img.tobytes() for img in images]),
    }
    out = {}
    for mode, (url, bodies) in modes.items():
        lat = []
        t0 = time.perf_counter()

        def one(i):
            t = time.perf_counter()
            req = urllib.request.Request(url, data=bodies[i], method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                json.loads(r.read())
            lat.append((time.perf_counter() - t) * 1e3)

        with ThreadPoolExecutor(max_workers=concurrency) as ex:
            list(ex.map(one, range(len(bodies))))
        dt = time.perf_counter() - t0
        out[mode] = {"img_s": round(len(bodies) / dt, 1),
                     "latency_ms": _quantiles(lat)}
    srv.shutdown()
    return out


def main():
    args = parse_args()
    cfg = load_config(args.cfg)
    if args.quant is not None:
        cfg["MODEL"]["QUANT"] = args.quant
    size = args.size
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (args.n, size, size, 3), np.uint8)

    rt = ServingRuntime(cfg, sizes=[size], batch_size=args.batch_size,
                        max_wait_ms=args.max_wait_ms, inflight=args.inflight,
                        conf_thre=args.conf_thre)
    rt.start(warmup=True)
    pred = rt.buckets[size].predictor
    warm = images[:args.batch_size]
    for _ in range(args.warmup_batches):
        out = pred.dispatch(warm)
    np.asarray(out[0])

    # INTERLEAVED paired windows: the tunnel drifts 2-4x between minutes,
    # so sequential A-then-B comparisons lie (docs/PERF.md); pair each
    # direct window with a runtime window on the same images and report
    # the median of per-window ratios.
    windows = max(2, args.windows)
    chunk = max(args.batch_size, args.n // windows
                // args.batch_size * args.batch_size)
    directs, runtimes, ratios = [], [], []
    for w in range(windows):
        # non-overlapping chunks; wrap only when n < windows * chunk
        start = (w * chunk) % (max(args.n - chunk, 0) + 1)
        imgs_w = images[start:start + chunk]
        d = bench_direct(pred, imgs_w, args.inflight)
        r = bench_runtime(rt, imgs_w, args.concurrency, size)
        directs.append(d), runtimes.append(r)
        ratios.append(r["img_s"] / d["img_s"])
    mid = sorted(range(windows), key=lambda i: ratios[i])[windows // 2]
    direct, runtime = directs[mid], runtimes[mid]
    result = {
        "metric": "serve_runtime_img_s", "size": size,
        "batch_size": args.batch_size, "n": args.n,
        "concurrency": args.concurrency, "quant":
            cfg["MODEL"].get("QUANT", "none"),
        "direct": direct, "runtime": runtime,
        "direct_img_s_windows": [d["img_s"] for d in directs],
        "runtime_img_s_windows": [r["img_s"] for r in runtimes],
        "runtime_vs_direct": round(sorted(ratios)[windows // 2], 3),
    }
    if args.http:
        result["http"] = bench_http(rt, images, args.concurrency, size)
    rt.close()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
