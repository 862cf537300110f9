#!/usr/bin/env python3
"""Int8 MXU feasibility probe: is s8xs8->s32 conv/matmul actually ~2x bf16
on this v5e through this XLA pipeline, and what does requantization cost?

One jit program holds chained-conv loops for every (shape, variant) so a
single compile answers everything; per-chain device time comes from a
profiler trace joined with HLO metadata (TPU executes ops serially, so
attribution is clean). Chains (square in/out channels so output feeds
input):

  s19k3  3x3 512->512 @19^2   (SPP/neck region, MXU-bound)
  s19k1  1x1 1024->1024 @19^2 (head/neck 1x1s)
  s38k3  3x3 256->256 @38^2   (stage4 / PAN mid)
  s76k3  3x3 128->128 @76^2   (stage3 / PAN top)
  s152k1 1x1 128->128 @152^2  (stage2-scale, HBM-bound: int8 also halves bytes)
  mm     [5776,512]x[512,512] dot_general (conv-free MXU check)

Variants: bf16 (model's current path), i8raw (s8 conv -> s32 -> cheap s8
cast), i8rq (realistic: s32 -> f32 * per-channel scale -> round/clip ->
s8). Usage:

    python tools/exp_int8.py [--depth 24] [--iters 5]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

DN = ("NHWC", "HWIO", "NHWC")


def conv_chain_bf16(tag, x, w, depth):
    with jax.named_scope(tag):
        pad = (w.shape[0] - 1) // 2

        def body(_, h):
            y = lax.conv_general_dilated(h, w, (1, 1), [(pad, pad)] * 2,
                                         dimension_numbers=DN)
            return (y * jnp.asarray(0.1, y.dtype)).astype(jnp.bfloat16)

        return lax.fori_loop(0, depth, body, x)


def conv_chain_i8(tag, x, w, depth, requant):
    with jax.named_scope(tag):
        pad = (w.shape[0] - 1) // 2
        # per-output-channel dequant scale (what folded-BN int8 would use)
        cs = jnp.linspace(1e-6, 2e-6, w.shape[-1], dtype=jnp.float32)

        def body(_, h):
            y = lax.conv_general_dilated(h, w, (1, 1), [(pad, pad)] * 2,
                                         dimension_numbers=DN,
                                         preferred_element_type=jnp.int32)
            if requant:
                f = y.astype(jnp.float32) * cs
                return jnp.clip(jnp.round(f * 127.0), -127, 127
                                ).astype(jnp.int8)
            return y.astype(jnp.int8)

        return lax.fori_loop(0, depth, body, x)


def mm_chain(tag, x, w, depth, out_dtype):
    with jax.named_scope(tag):
        def body(_, h):
            y = lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=(
                                    jnp.int32 if h.dtype == jnp.int8
                                    else jnp.float32))
            if h.dtype == jnp.int8:
                return y.astype(jnp.int8)
            return (y * 0.1).astype(out_dtype)

        return lax.fori_loop(0, depth, body, x)


SHAPES = [
    # (tag, h, w, channels, kernel)
    ("s19k3", 19, 19, 512, 3),
    ("s19k1", 19, 19, 1024, 1),
    ("s38k3", 38, 38, 256, 3),
    ("s76k3", 76, 76, 128, 3),
    ("s152k1", 152, 152, 128, 1),
    # early-stage shapes (stage1/2 interiors). The round-3 act-bound probe
    # disproved "Mish-VPU-bound" for the packed stages, so int8 there is
    # back on the table: unpacked C=64 at 304^2, and the W-packed layout
    # (two image columns per 128 channels — the packed 3x3 kernel is half
    # zero blocks but the MXU doesn't skip zeros, so a dense random
    # [3,3,128,128] probe prices it exactly)
    ("e304k3c64", 304, 304, 64, 3),
    ("e304k1c64", 304, 304, 64, 1),
    ("p304k3c128", 304, 152, 128, 3),
    ("p304k1c128", 304, 152, 128, 1),
    ("e152k3c128", 152, 152, 128, 3),
]


def build(depth, batch, only=None):
    rng = np.random.default_rng(0)
    shapes = [s for s in SHAPES if only is None or re.search(only, s[0])]
    args = {}
    for tag, h, wd, c, k in shapes:
        xb = jnp.asarray(rng.standard_normal((batch, h, wd, c)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((k, k, c, c)) * 0.05,
                         jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 128, (batch, h, wd, c)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 128, (k, k, c, c)), jnp.int8)
        args[tag] = (xb, wb, xi, wi)
    mm = only is None or re.search(only, "mm")
    mmb = (jnp.asarray(rng.standard_normal((5776, 512)), jnp.bfloat16),
           jnp.asarray(rng.standard_normal((512, 512)) * 0.05, jnp.bfloat16))
    mmi = (jnp.asarray(rng.integers(-127, 128, (5776, 512)), jnp.int8),
           jnp.asarray(rng.integers(-127, 128, (512, 512)), jnp.int8))

    def run(a, mb, mi):
        outs = []
        for tag, _, _, _, _ in shapes:
            xb, wb, xi, wi = a[tag]
            outs.append(conv_chain_bf16(f"{tag}_bf16", xb, wb, depth))
            outs.append(conv_chain_i8(f"{tag}_i8raw", xi, wi, depth,
                                      requant=False))
            outs.append(conv_chain_i8(f"{tag}_i8rq", xi, wi, depth,
                                      requant=True))
        if mm:
            outs.append(mm_chain("mm_bf16", mb[0], mb[1], depth,
                                 jnp.bfloat16))
            outs.append(mm_chain("mm_i8", mi[0], mi[1], depth, jnp.int8))
        return [o.reshape(-1)[0] for o in outs]

    return run, (args, mmb, mmi), shapes


def hlo_op_tags(compiled_text):
    """HLO op name -> chain tag, from metadata op_name scopes."""
    tags = {}
    pat = re.compile(r"%?([\w.\-]+) = .*metadata=\{[^}]*op_name=\"([^\"]+)\"")
    for m in pat.finditer(compiled_text):
        op, scope = m.groups()
        for t in re.findall(
                r"([sep]\d+k\d+(?:c\d+)?_(?:bf16|i8raw|i8rq)|mm_(?:bf16|i8))",
                scope):
            tags[op] = t
            break
    return tags


def summarize(trace_dir, tags, depth, iters):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()
                   or "xla" in n.lower()}
    per_tag = defaultdict(float)
    untagged = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        t = tags.get(name)
        if t is None:
            untagged[name] += e["dur"]
        else:
            per_tag[t] += e["dur"]
    print(f"\nper-layer device us (depth={depth}, iters={iters}):")
    rows = {}
    for t in sorted(per_tag):
        us = per_tag[t] / depth / iters
        rows[t] = us
        print(f"  {t:14s} {us:9.1f} us/layer")
    print("\nratios (vs bf16):")
    for tag, *_ in SHAPES + [("mm",)]:
        b = rows.get(f"{tag}_bf16")
        if not b:
            continue
        for v in ("i8raw", "i8rq", "i8"):
            r = rows.get(f"{tag}_{v}")
            if r:
                print(f"  {tag:8s} {v:6s} {r / b:6.3f}x  "
                      f"({r:.1f} vs {b:.1f} us)")
    top_un = sorted(untagged.items(), key=lambda kv: -kv[1])[:8]
    if top_un:
        print("\nuntagged top (total us over trace):")
        for n, us in top_un:
            print(f"  {n[:60]:60s} {us:10.0f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace-dir", type=str, default="/tmp/int8_trace")
    p.add_argument("--only", type=str, default=None,
                   help="regex over shape tags; 'mm' matches the matmul")
    args = p.parse_args()

    run, fargs, _ = build(args.depth, args.batch, args.only)
    jf = jax.jit(run)
    t0 = time.time()
    lowered = jf.lower(*fargs)
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.1f}s")
    tags = hlo_op_tags(compiled.as_text())
    print(f"tagged {len(tags)} HLO ops")

    out = compiled(*fargs)
    np.asarray(out[0])  # value-fetch sync
    t0 = time.time()
    for _ in range(3):
        out = compiled(*fargs)
    np.asarray(out[0])
    print(f"whole program: {(time.time() - t0) / 3 * 1000:.1f} ms/iter")

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            out = compiled(*fargs)
        np.asarray(out[0])
    summarize(args.trace_dir, tags, args.depth, args.iters)


if __name__ == "__main__":
    main()
