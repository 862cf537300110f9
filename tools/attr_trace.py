#!/usr/bin/env python3
"""Attribute device-trace op times to model scopes via HLO metadata.

Rebuilds the eval forward program (same shapes as profile_forward.py),
compiles it (persistent-cache hit — same executable as the trace), maps
HLO op name -> metadata op_name (the jax named-scope path), then joins
the newest trace under --trace-dir and prints per-op rows WITH scopes and
per-scope-group aggregates. This is the "HLO-metadata-joined" attribution
that drove the round-3 per-stage/per-component floor analyses, now a
committed tool instead of a session ad-hoc.

    YOLOV4_PROFILE_QUANT=1 python tools/attr_trace.py \
        --trace-dir /tmp/quant_trace [--img-size 608] [--batch 16] \
        [--group-depth 3] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def build_compiled(img_size, batch, quant, with_nms, span=None,
                   target="fwd"):
    from yolov4_tpu.config import load_config
    from yolov4_tpu.models import build_model
    from yolov4_tpu.models.yolov4 import init_variables
    from yolov4_tpu.ops.postprocess import postprocess

    if target == "serve":
        from yolov4_tpu.engine.predictor import Predictor, pack_wire

        cfg = load_config()
        if quant and quant != "none":
            cfg["MODEL"]["QUANT"] = "int8" if quant is True else quant
        if span:
            cfg["MODEL"]["QUANT_SPAN"] = span
        pred = Predictor(cfg, img_size=img_size, batch_size=batch)
        rng = np.random.default_rng(0)
        imgs_u8 = rng.integers(0, 256, (batch, img_size, img_size, 3)
                               ).astype(np.uint8)
        if cfg["MODEL"].get("QUANT") == "int8_static":
            pred.calibrate(imgs_u8)
        flat = jax.device_put(pack_wire(imgs_u8, batch, pred._s2d_wire))
        return pred._run.lower(pred.variables, flat, pred.conf_thre,
                               pred.nms_thre).compile()

    cfg = load_config()
    if quant and quant != "none":
        cfg["MODEL"]["QUANT"] = "int8" if quant is True else quant
    if span:
        cfg["MODEL"]["QUANT_SPAN"] = span
    model = build_model(cfg)
    variables = jax.device_put(
        init_variables(model, jax.random.PRNGKey(0), img_size))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, img_size, img_size, 3)),
                       jnp.float32)
    if cfg["MODEL"].get("QUANT") == "int8_static":
        from yolov4_tpu.models.yolov4 import calibrate_variables
        variables = jax.device_put(
            calibrate_variables(model, variables, imgs))

    def f(v, x):
        preds = model.apply(v, x, train=False)
        if with_nms:
            return postprocess(preds, 80, 0.005, 0.4,
                               pre_nms_topk=2048, max_dets=100)
        return preds

    return jax.jit(f).lower(variables, imgs).compile()


def op_scopes(compiled_text):
    """HLO op name -> op_name metadata (scope path)."""
    out = {}
    pat = re.compile(
        r"%?([\w.\-]+) = [^\n]*metadata=\{[^}]*op_name=\"([^\"]+)\"")
    for m in pat.finditer(compiled_text):
        out[m.group(1)] = m.group(2)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-size", type=int, default=608)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--trace-dir", type=str, default="/tmp/yolov4_trace")
    p.add_argument("--with-nms", action="store_true")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--group-depth", type=int, default=3,
                   help="scope path depth for the aggregate table")
    p.add_argument("--quant", choices=["none", "int8", "int8_static"],
                   default=None, help="MODEL.QUANT for the rebuilt program")
    p.add_argument("--span", choices=["late", "full"], default=None,
                   help="MODEL.QUANT_SPAN override")
    p.add_argument("--target", choices=["fwd", "serve"], default="fwd",
                   help="serve rebuilds the Predictor wire program")
    args = p.parse_args()
    quant = args.quant
    if quant is None:
        quant = ("int8" if os.environ.get("YOLOV4_PROFILE_QUANT") == "1"
                 else "none")

    # check for a trace BEFORE the (multi-minute) model compile
    paths = glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {args.trace_dir} — capture one "
                 f"first (tools/profile_forward.py)")
    path = max(paths, key=os.path.getmtime)

    compiled = build_compiled(args.img_size, args.batch, quant,
                              args.with_nms, span=args.span,
                              target=args.target)
    scopes = op_scopes(compiled.as_text())
    print(f"{len(scopes)} HLO ops carry scope metadata")
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p_ for p_, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()
                   or "xla" in n.lower()}

    per_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if "jit_" in name:
            continue  # whole-program envelope event
        per_op[name] += e["dur"]

    total = sum(per_op.values())
    top = args.top if args.top > 0 else None  # 0 = unlimited
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\ntrace: {path}")
    print(f"{'op':28s} {'ms':>9s} {'%':>5s}  scope")
    for name, us in rows[:top]:
        sc = scopes.get(name, "?")
        print(f"{name[:28]:28s} {us / 1000:9.2f} {100 * us / total:5.1f}  "
              f"{sc[:90]}")

    groups = defaultdict(float)
    for name, us in per_op.items():
        sc = scopes.get(name, "?")
        parts = sc.split("/")
        groups["/".join(parts[:args.group_depth])] += us
    print(f"\nper-scope-group (depth {args.group_depth}):")
    for g, us in sorted(groups.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us / 1000:9.2f} ms {100 * us / total:5.1f}%  {g[:100]}")
    print(f"  TOTAL {total / 1000:.2f} ms over the traced window")


if __name__ == "__main__":
    main()
