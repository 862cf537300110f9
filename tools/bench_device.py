#!/usr/bin/env python3
"""Device-resident component benchmarks (no host transfers in the loop).

Measures the hardware-meaningful rates the tunnel hides: inputs live on
device, N iterations are dispatched asynchronously, and ONE final fetch
closes the window (per-iteration block_until_ready lies through the async
tunnel). Medians over several windows; run nothing else heavy alongside.

    python tools/bench_device.py [--img-size 608] [--batch 16] \
        [--parts fwd,fwd_nms,nms,fwd_plain]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolov4_tpu.config import load_config  # noqa: E402
from yolov4_tpu.models import build_model  # noqa: E402
from yolov4_tpu.models.yolov4 import init_variables  # noqa: E402
from yolov4_tpu.ops.nms import greedy_nms_mask  # noqa: E402
from yolov4_tpu.ops.postprocess import postprocess  # noqa: E402


def timed(fn, args, iters=20, windows=5):
    out = fn(*args)
    jax.block_until_ready(out)  # compile

    # VALUE-fetch sync: on this backend block_until_ready can return
    # before the device finishes (first seen on donated programs, r3 also
    # observed on plain repeated dispatches — a 30 ms program "measured"
    # 0.6 ms). np.asarray of an output leaf must produce real data and
    # cannot lie; the fetched leaf is small (<=50 KB) so the one RTT per
    # window is noise at iters=20.
    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        np.asarray(leaf[(0,) * leaf.ndim])  # scalar slice: 4-byte RTT

    rates = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        rates.append((time.time() - t0) / iters)
    return float(np.median(rates)) * 1000.0  # ms/iter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-size", type=int, default=608)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--parts", type=str, default="fwd,fwd_nms,nms")
    p.add_argument("--conf-thre", type=float, default=0.005)
    p.add_argument("--nms-thre", type=float, default=0.4)
    p.add_argument("--json", action="store_true",
                   help="additionally print ONE machine-readable JSON line "
                   '{"batch": B, "results": {name: ms_per_batch}} as the '
                   "last stdout line (for callers like bench.py)")
    p.add_argument("--quant", choices=["none", "int8", "int8_static"],
                   default="none", help="serving quant mode for the "
                   "fwd/fwd_nms parts (int8_static auto-calibrates on the "
                   "benchmark input)")
    p.add_argument("--approx-topk", action="store_true",
                   help="fwd_nms uses approx_max_k candidate selection "
                   "(recall 0.95, the opt-in TEST.APPROX_TOPK trade)")
    args = p.parse_args()
    parts = args.parts.split(",")
    size, b = args.img_size, args.batch

    cfg = load_config()
    if args.quant != "none":
        cfg["MODEL"]["QUANT"] = args.quant
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((b, size, size, 3)), jnp.float32)

    results = {}

    def fwd_fn(model):
        # variables as a jit ARGUMENT, not a closure: closed-over weights
        # get baked into the executable as constants, and the persistent
        # cache then serializes ~550 MB per entry (measured; the round-2
        # .jax_cache grew to 9.8 GB from these tool programs alone).
        def f(v, x):
            return model.apply(v, x, train=False)
        return jax.jit(f)

    # one model + parameter upload shared by every eval-forward part
    model = variables = None
    if {"fwd", "fwd_nms", "topk"} & set(parts):
        model = build_model(cfg)
        variables = jax.device_put(
            init_variables(model, jax.random.PRNGKey(0), size))
        if args.quant == "int8_static":
            # record calibration scales once (dynamic abs-max pass), then
            # every timed program runs with the stored static scalars
            from yolov4_tpu.models.yolov4 import calibrate_variables
            variables = jax.device_put(
                calibrate_variables(model, variables, imgs))

    tag = "" if args.quant == "none" else f" {args.quant}"

    if {"fwd", "fwd_nms"} & set(parts):
        f = fwd_fn(model)
        if "fwd" in parts:
            results[f"fwd+decode (s2d){tag}"] = timed(f, (variables, imgs),
                                                      args.iters)

        if "fwd_nms" in parts:
            @jax.jit
            def full(v, x):
                preds = model.apply(v, x, train=False)
                return postprocess(preds, 80, args.conf_thre, args.nms_thre,
                                   pre_nms_topk=2048, max_dets=100,
                                   topk_approx=args.approx_topk)
            nm = f"fwd+decode+NMS (s2d){tag}" + (
                " approx-topk" if args.approx_topk else "")
            results[nm] = timed(full, (variables, imgs), args.iters)

    if "serve" in parts:
        # the DEPLOYMENT program: Predictor._run — uint8 s2d-wire input,
        # on-device normalize, forward, decode, class-wise NMS. This is
        # the program detect/val/export actually run; the fwd/fwd_nms
        # parts above feed float NHWC and pay an input relayout the wire
        # program structurally skips (PERF.md: s2d wire format).
        from yolov4_tpu.engine.predictor import Predictor, pack_wire

        scfg = load_config()
        if args.quant != "none":
            scfg["MODEL"]["QUANT"] = args.quant
        if args.approx_topk:
            scfg["TEST"]["APPROX_TOPK"] = True
        scfg["TEST"].update(CONFTHRE=args.conf_thre, NMSTHRE=args.nms_thre)
        pred = Predictor(scfg, img_size=size, batch_size=b)
        imgs_u8 = rng.integers(0, 256, (b, size, size, 3)).astype(np.uint8)
        if args.quant == "int8_static":
            pred.calibrate(imgs_u8)
        flat = jax.device_put(
            pack_wire(imgs_u8, b, pred._s2d_wire))
        nm = f"serve wire fwd+decode+NMS{tag}" + (
            " approx-topk" if args.approx_topk else "")
        results[nm] = timed(
            lambda v, x: pred._run(v, x, pred.conf_thre, pred.nms_thre),
            (pred.variables, flat), args.iters)

    if "fwd_plain" in parts:
        import yolov4_tpu.models.yolov4 as y4
        from yolov4_tpu.models.darknet import Backbone  # noqa: F401
        cfg_plain = load_config()
        model_p = build_model(cfg_plain)
        # rebuild with s2d disabled via the model's backbone flag
        model_p = (model_p.clone(s2d=False)
                   if hasattr(model_p, "s2d") else model_p)
        variables_p = jax.device_put(
            init_variables(model_p, jax.random.PRNGKey(0), size))
        f = fwd_fn(model_p)
        results["fwd+decode (plain)"] = timed(f, (variables_p, imgs),
                                              args.iters)

    if "aug" in parts:
        # VERDICT gate: device-aug train step <= 1.3x the no-aug step @320/b8
        from yolov4_tpu.ops.loss import build_criterion
        from yolov4_tpu.optim import build_lr_schedule, build_optimizer
        from yolov4_tpu.parallel import (create_mesh, create_train_state,
                                         make_train_step)

        s, tb = 320, 8
        cfg_t = load_config()
        model_t = build_model(cfg_t)
        variables_t = init_variables(model_t, jax.random.PRNGKey(0), s)
        criterion = build_criterion(cfg_t)
        tx = build_optimizer(cfg_t, variables_t["params"])
        sched = build_lr_schedule(cfg_t, len_epoch=100)
        mesh = create_mesh(jax.devices()[:1])

        labels = np.zeros((tb, 60, 5), np.float32)
        labels[:, 0] = [100, 100, 40, 40, 3]

        # the step donates its state, and block_until_ready over donated
        # outputs can return early on this backend (PERF.md rule #3):
        # sync by FETCHING a param value — the optimizer writes params
        # last and a value fetch cannot lie
        leaves = jax.tree.leaves(variables_t["params"])
        small_leaf = min(range(len(leaves)), key=lambda i: leaves[i].size)

        def window(step, state, inputs, iters=10):
            t0 = time.time()
            for _ in range(iters):
                state = step(state, *inputs)
            np.asarray(jax.tree.leaves(state.params)[small_leaf])
            return (time.time() - t0) / iters * 1000.0, state

        # the step donates its state: give each variant its own buffer copy
        vars_a = jax.tree.map(jnp.copy, variables_t)
        vars_b = jax.tree.map(jnp.copy, variables_t)

        plain_step = make_train_step(model_t, criterion, tx, sched, mesh,
                                     img_size=s)
        flat = jnp.asarray(rng.random((tb, s * s * 3)), jnp.float32)

        aug = cfg_t["AUGMENTATION"]
        dev_aug = {"jitter": aug["JITTER"], "hue": aug["HUE"],
                   "saturation": aug["SATURATION"],
                   "exposure": aug["EXPOSURE"],
                   "min_offset": aug["MIN_OFFSET"], "flip": True,
                   "dither": True}
        aug_step = make_train_step(model_t, criterion, tx, sched, mesh,
                                   img_size=s, device_aug=dev_aug)
        canv = jnp.asarray(
            rng.integers(0, 255, (tb, 4 * 3 * s * s)), jnp.uint8)
        member_boxes = np.zeros((tb, 4, 60, 5), np.float32)
        member_boxes[:, :, 0] = [60, 60, 180, 170, 3]

        # the tunnel's throughput drifts 2-4x between minutes: interleave
        # the two variants' windows and report the median PAIRED ratio
        st_p = create_train_state(vars_a, tx)
        st_a = create_train_state(vars_b, tx)
        in_p = (flat, jnp.asarray(labels))
        in_a = (canv, jnp.asarray(member_boxes))
        _, st_p = window(plain_step, st_p, in_p, iters=2)  # compile+warm
        _, st_a = window(aug_step, st_a, in_a, iters=2)
        ratios, p_ms, a_ms = [], [], []
        for _ in range(6):
            mp, st_p = window(plain_step, st_p, in_p)
            ma, st_a = window(aug_step, st_a, in_a)
            ratios.append(ma / mp)
            p_ms.append(mp)
            a_ms.append(ma)
        results[f"train step {s}/b{tb} (no aug)"] = float(np.median(p_ms))
        results[f"train step {s}/b{tb} (device aug)"] = float(np.median(a_ms))
        print(f"paired windows no-aug ms: {[round(x, 1) for x in p_ms]}")
        print(f"paired windows aug ms:    {[round(x, 1) for x in a_ms]}")
        print(f"aug/no-aug ratio: median {np.median(ratios):.2f}x "
              f"(windows {[round(r, 2) for r in ratios]})")

    if "topk" in parts:
        # exact vs approx_max_k candidate selection, INTERLEAVED paired
        # windows (full fwd+decode+NMS program both sides)

        def full_fn(approx):
            @jax.jit
            def full(v, x):
                preds = model.apply(v, x, train=False)
                return postprocess(preds, 80, args.conf_thre, args.nms_thre,
                                   pre_nms_topk=2048, max_dets=100,
                                   topk_approx=approx)
            return full

        f_exact, f_approx = full_fn(False), full_fn(True)
        jax.block_until_ready(f_exact(variables, imgs))
        jax.block_until_ready(f_approx(variables, imgs))

        def one_window(f, iters):
            # value-fetch sync (PERF.md rule #4: block_until_ready can lie
            # on plain repeated dispatches too)
            t0 = time.time()
            for _ in range(iters):
                out = f(variables, imgs)
            np.asarray(out[0][0, 0, 0])
            return (time.time() - t0) / iters * 1000.0

        e_ms, a_ms, ratios = [], [], []
        for _ in range(6):
            me = one_window(f_exact, args.iters)
            ma = one_window(f_approx, args.iters)
            e_ms.append(me)
            a_ms.append(ma)
            ratios.append(ma / me)
        results["fwd+NMS (exact topk)"] = float(np.median(e_ms))
        results["fwd+NMS (approx topk)"] = float(np.median(a_ms))
        print(f"approx/exact ratio: median {np.median(ratios):.3f}x "
              f"(windows {[round(r, 3) for r in ratios]})")

    if "nms" in parts:
        k = 2048
        boxes = jnp.asarray(rng.uniform(0, size, (b, k, 2)), jnp.float32)
        wh = jnp.asarray(rng.uniform(8, 120, (b, k, 2)), jnp.float32)
        xyxy = jnp.concatenate([boxes, boxes + wh], -1)
        valid = jnp.ones((b, k), bool)
        f = jax.jit(lambda bx, v: greedy_nms_mask(bx, v, args.nms_thre))
        results[f"NMS K={k}"] = timed(f, (xyxy, valid), args.iters)

    for name, ms in results.items():
        rate = args.batch / (ms / 1000.0)
        print(f"{name:28s} {ms:8.2f} ms/batch   {rate:8.1f} img/s")
    if args.json:
        import json

        print(json.dumps({"batch": args.batch, "results": results}))


if __name__ == "__main__":
    main()
