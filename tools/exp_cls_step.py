#!/usr/bin/env python3
"""Classifier (darknet pretrain) train-step A/B on chip.

Variants: the production default (flat s2d wire + lane packing) against
its two ablations — NHWC wire (the lane-pad transfer tax) and wpack off.
Interleaved paired windows; each step re-uploads a host batch so the wire
format's transfer cost is part of the measurement; sync by fetching a
param VALUE after each window (donated-output blocking lies —
docs/PERF.md).

    python tools/exp_cls_step.py [--batch 64] [--size 256] [--iters 8]
        [--windows 4] [--variants s2d_wpack,s2d_plain,nhwc_wpack]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import optax

from yolov4_tpu.classify.trainer import (classifier_lr_schedule,
                                         make_cls_train_step, pack_cls_wire)
from yolov4_tpu.models.darknet import CSPDarknet53
from yolov4_tpu.parallel.mesh import create_mesh
from yolov4_tpu.parallel.train_step import create_train_state

VARIANTS = {
    # name: (layout, wpack)
    "s2d_wpack": ("s2d", "auto"),
    "s2d_plain": ("s2d", False),
    "nhwc_wpack": ("nhwc", "auto"),
}


def _value_fetch(state):
    leaves = jax.tree.leaves(state.params)
    smallest = min(leaves, key=lambda l: l.size)
    np.asarray(smallest)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--windows", type=int, default=4)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--variants", type=str,
                   default="s2d_wpack,s2d_plain,nhwc_wpack")
    p.add_argument("--device-resident", action="store_true",
                   help="stage the wire batches on device once and chain "
                        "steps (isolates compute from the tunnel upload)")
    args = p.parse_args()
    names = [v for v in args.variants.split(",") if v]

    mesh = create_mesh()
    rng = np.random.default_rng(0)
    size, b = args.size, args.batch
    host_imgs = [rng.integers(0, 256, (b, size, size, 3), np.uint8)
                 for _ in range(2)]
    labels = jnp.asarray(rng.integers(0, args.num_classes, (b,), np.int64)
                         .astype(np.int32))
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    sched = classifier_lr_schedule(0.1, 5000)

    runners, states = {}, {}
    for name in names:
        layout, wpack = VARIANTS[name]
        model = CSPDarknet53(num_classes=args.num_classes,
                             dtype=jnp.bfloat16, wpack=wpack)
        init = jax.jit(lambda r, d, m=model: m.init({"params": r}, d,
                                                    train=False))
        variables = init(jax.random.PRNGKey(0),
                         jnp.zeros((1, size, size, 3), jnp.float32))
        states[name] = create_train_state(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, tx)
        step = make_cls_train_step(model, tx, sched, mesh, args.num_classes,
                                   size=size, layout=layout)
        wires = [pack_cls_wire(im, layout) for im in host_imgs]
        if args.device_resident:
            wires = [jnp.asarray(w) for w in wires]

        def run(n, name=name, step=step, wires=wires):
            state = states[name]
            t0 = time.perf_counter()
            for i in range(n):
                u8 = (wires[i % len(wires)] if args.device_resident
                      else jnp.asarray(wires[i % len(wires)]))
                state = step(state, u8, labels)
            _value_fetch(state)
            states[name] = state
            return (time.perf_counter() - t0) / n

        runners[name] = run
        print(f"[compile] {name} ...", flush=True)
        t0 = time.perf_counter()
        run(1)
        print(f"[compile] {name} ready in {time.perf_counter() - t0:.1f}s",
              flush=True)

    per = {name: [] for name in names}
    for w in range(args.windows):
        for name in names:
            ms = runners[name](args.iters) * 1e3
            per[name].append(round(ms, 1))
            print(f"[w{w}] {name}: {ms:.1f} ms/step", flush=True)

    med = {name: sorted(v)[len(v) // 2] for name, v in per.items()}
    out = {"metric": "cls_train_step_ms", "batch": b, "size": size,
           "windows": per, "median_ms": med,
           "img_s": {k: round(b / (v / 1e3), 1) for k, v in med.items()}}
    base = med.get("s2d_wpack")
    if base:
        out["ratio_vs_s2d_wpack"] = {
            k: round(v / base, 3) for k, v in med.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
