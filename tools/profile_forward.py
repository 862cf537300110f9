#!/usr/bin/env python3
"""Capture a device trace of the eval forward program and print an op-level
time table (no TensorBoard in this environment — the trace .json.gz is
parsed directly).

    python tools/profile_forward.py [--img-size 608] [--batch 16] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolov4_tpu.config import load_config  # noqa: E402
from yolov4_tpu.models import build_model  # noqa: E402
from yolov4_tpu.models.yolov4 import init_variables  # noqa: E402
from yolov4_tpu.ops.postprocess import postprocess  # noqa: E402


def capture(trace_dir: str, img_size: int, batch: int, with_nms: bool,
            target: str, pallas_csp: bool = False, quant: str = "none",
            span: str | None = None):
    rng = np.random.default_rng(0)
    if target == "aug":
        from yolov4_tpu.data.device_aug import augment_batch_impl

        canv = jnp.asarray(
            rng.integers(0, 255, (batch, 4, img_size, img_size, 3)), jnp.uint8)
        boxes = np.zeros((batch, 4, 60, 5), np.float32)
        boxes[:, :, 0] = [60, 60, 180, 170, 3]
        boxes = jnp.asarray(boxes)

        @jax.jit
        def f(key):
            return augment_batch_impl(key, canv, boxes, size=img_size)

        args = (jax.random.PRNGKey(0),)
    elif target == "train":
        from yolov4_tpu.ops.loss import build_criterion
        from yolov4_tpu.optim import build_lr_schedule, build_optimizer
        from yolov4_tpu.parallel import (create_mesh, create_train_state,
                                         make_train_step)

        cfg = load_config()
        model = build_model(cfg)
        variables = init_variables(model, jax.random.PRNGKey(0), img_size)
        criterion = build_criterion(cfg)
        tx = build_optimizer(cfg, variables["params"])
        sched = build_lr_schedule(cfg, len_epoch=100)
        mesh = create_mesh(jax.devices()[:1])
        step = make_train_step(model, criterion, tx, sched, mesh,
                               img_size=img_size)
        state = create_train_state(variables, tx)
        labels = np.zeros((batch, 60, 5), np.float32)
        labels[:, 0] = [100, 100, 40, 40, 3]
        flat = jnp.asarray(rng.random((batch, img_size * img_size * 3)),
                           jnp.float32)
        labels = jnp.asarray(labels)

        # the step donates state; thread it through the timing loop
        class _Step:
            def __init__(self, st):
                self.st = st

            def __call__(self, *_):
                self.st = step(self.st, flat, labels)
                return self.st

        f = _Step(state)
        args = ()
    elif target == "serve":
        # the DEPLOYMENT program: Predictor._run (uint8 s2d wire ->
        # normalize -> forward -> decode -> class-wise NMS)
        from yolov4_tpu.engine.predictor import Predictor, pack_wire

        cfg = load_config()
        if quant != "none":
            cfg["MODEL"]["QUANT"] = quant
        if span:
            cfg["MODEL"]["QUANT_SPAN"] = span
        pred = Predictor(cfg, img_size=img_size, batch_size=batch)
        imgs_u8 = rng.integers(0, 256, (batch, img_size, img_size, 3)
                               ).astype(np.uint8)
        if quant == "int8_static":
            pred.calibrate(imgs_u8)
        flat = jax.device_put(pack_wire(imgs_u8, batch, pred._s2d_wire))

        def f(*_):
            return pred._run(pred.variables, flat, pred.conf_thre,
                             pred.nms_thre)

        args = ()
    else:
        cfg = load_config()
        if pallas_csp:
            cfg["MODEL"]["PALLAS_CSP"] = True
        # env knob only when --quant was not given explicitly (same
        # precedence as tools/attr_trace.py)
        if quant == "none" and os.environ.get("YOLOV4_PROFILE_QUANT") == "1":
            quant = "int8"
        if quant != "none":
            cfg["MODEL"]["QUANT"] = quant
        if span:
            cfg["MODEL"]["QUANT_SPAN"] = span
        model = build_model(cfg)
        variables = jax.device_put(
            init_variables(model, jax.random.PRNGKey(0), img_size))
        imgs = jnp.asarray(rng.random((batch, img_size, img_size, 3)),
                           jnp.float32)
        if quant == "int8_static":
            from yolov4_tpu.models.yolov4 import calibrate_variables
            variables = jax.device_put(
                calibrate_variables(model, variables, imgs))

        # variables as a jit ARG (closures bake weights into the cached
        # executable: ~550 MB per persistent-cache entry, measured r2)
        @jax.jit
        def f(v, x):
            preds = model.apply(v, x, train=False)
            if with_nms:
                return postprocess(preds, 80, 0.005, 0.4,
                                   pre_nms_topk=2048, max_dets=100)
            return preds

        args = (variables, imgs)

    import time
    jax.block_until_ready(f(*args))  # compile outside the trace
    t0 = time.time()
    for _ in range(10):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"measured: {(time.time() - t0) / 10 * 1000:.2f} ms/iter")
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = f(*args)
        jax.block_until_ready(out)


def summarize(trace_dir: str, top: int):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])

    # keep device-thread complete events (dur in us); drop host threads
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()}

    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        agg[name] += e["dur"]
        total += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f"trace: {path}")
    print(f"{'op':60s} {'ms':>10s} {'%':>6s}")
    for name, us in rows:
        print(f"{name[:60]:60s} {us / 1000:10.2f} {100 * us / total:6.1f}")
    print(f"{'TOTAL (all device events)':60s} {total / 1000:10.2f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-size", type=int, default=608)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--with-nms", action="store_true")
    p.add_argument("--target", type=str, default="fwd",
                   choices=["fwd", "aug", "train", "serve"])
    p.add_argument("--trace-dir", type=str, default="/tmp/yolov4_trace")
    p.add_argument("--pallas-csp", action="store_true",
                   help="profile the MODEL.PALLAS_CSP fused-stage forward")
    p.add_argument("--quant", choices=["none", "int8", "int8_static"],
                   default="none", help="MODEL.QUANT for the eval forward")
    p.add_argument("--span", choices=["late", "full"], default=None,
                   help="MODEL.QUANT_SPAN override")
    args = p.parse_args()
    if args.pallas_csp and args.target != "fwd":
        p.error("--pallas-csp only applies to --target fwd")
    if (args.quant != "none" or args.span) and args.target not in (
            "fwd", "serve"):
        p.error("--quant/--span only apply to --target fwd/serve")
    capture(args.trace_dir, args.img_size, args.batch, args.with_nms,
            args.target, pallas_csp=args.pallas_csp, quant=args.quant,
            span=args.span)
    summarize(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
