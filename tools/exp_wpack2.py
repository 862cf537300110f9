#!/usr/bin/env python3
"""Paired A/B: lane-packing span "stage1" (round-3 default until now) vs
"stage12" (stage2's CSP interior also runs at C=64 — fusion trace showed
~1.9 ms/iter of half-lane Mish/BN/K-64 dots there at 608/b16).

Full-model eval forward+decode at 608/b16 and the train step at 608/b8,
interleaved windows, value-fetch sync.

    python tools/exp_wpack2.py [--eval-only]
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


def build(span, size):
    cfg = load_config()
    cfg["MODEL"]["WPACK"] = span
    model = build_model(cfg)
    return cfg, model


def window(fn, args_, fetch, iters=20):
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args_)
    fetch(out)
    return (time.time() - t0) / iters * 1000.0


def paired(name, fa, aa, fb, ab, fetch, windows=6, iters=20):
    window(fa, aa, fetch, 3)
    window(fb, ab, fetch, 3)
    ta, tb = [], []
    for _ in range(windows):
        ta.append(window(fa, aa, fetch, iters))
        tb.append(window(fb, ab, fetch, iters))
    ratios = [b / a for a, b in zip(ta, tb)]
    print(f"{name}: stage1 {[round(v, 2) for v in ta]}")
    print(f"{name}: stage12 {[round(v, 2) for v in tb]}")
    print(f"{name}: stage12/stage1 median {np.median(ratios):.3f}x "
          f"windows {[round(r, 3) for r in ratios]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--size", type=int, default=608)
    args = p.parse_args()
    size = args.size
    rng = np.random.default_rng(0)

    # ---- eval forward+decode, b16 ----
    _, m1 = build("stage1", size)
    _, m2 = build("stage12", size)
    variables = jax.device_put(init_variables(m1, jax.random.PRNGKey(0), size))
    imgs = jnp.asarray(rng.random((16, size, size, 3)), jnp.float32)

    f1 = jax.jit(lambda v, x: m1.apply(v, x, train=False))
    f2 = jax.jit(lambda v, x: m2.apply(v, x, train=False))
    o1 = np.asarray(f1(variables, imgs)[:, :64], np.float32)
    o2 = np.asarray(f2(variables, imgs)[:, :64], np.float32)
    err = np.max(np.abs(o1 - o2)) / max(1e-6, np.max(np.abs(o1)))
    print(f"eval outputs (first 64 rows) max rel err: {err:.2e} "
          f"bitequal={np.array_equal(o1, o2)}")

    def fetch(o):
        np.asarray(o[0, 0, 0])

    paired(f"fwd+decode {size}/b16", f1, (variables, imgs),
           f2, (variables, imgs), fetch)

    if args.eval_only:
        return

    # ---- train step, b8 ----
    from yolov4_tpu.ops.loss import build_criterion
    from yolov4_tpu.optim import build_lr_schedule, build_optimizer
    from yolov4_tpu.parallel import (create_mesh, create_train_state,
                                     make_train_step)

    labels = np.zeros((8, 60, 5), np.float32)
    labels[:, 0] = [100, 100, 40, 40, 3]
    labels = jnp.asarray(labels)
    flat = jnp.asarray(rng.random((8, size * size * 3)), jnp.float32)
    mesh = create_mesh(jax.devices()[:1])

    steps, states = [], []
    for m in (m1, m2):
        cfg = load_config()
        v = init_variables(m, jax.random.PRNGKey(0), size)
        tx = build_optimizer(cfg, v["params"])
        step = make_train_step(m, build_criterion(cfg), tx,
                               build_lr_schedule(cfg, len_epoch=100), mesh,
                               img_size=size, input_layout="s2d")
        steps.append(step)
        states.append(create_train_state(v, tx))

    leafi = min(range(len(jax.tree.leaves(states[0].params))),
                key=lambda i: jax.tree.leaves(states[0].params)[i].size)

    def twindow(idx, iters=10):
        t0 = time.time()
        for _ in range(iters):
            states[idx] = steps[idx](states[idx], flat, labels)
        np.asarray(jax.tree.leaves(states[idx].params)[leafi])
        return (time.time() - t0) / iters * 1000.0

    twindow(0, 2); twindow(1, 2)
    l1 = float(states[0].loss); l2 = float(states[1].loss)
    print(f"loss stage1={l1:.3f} stage12={l2:.3f}")
    ta, tb = [], []
    for _ in range(6):
        ta.append(twindow(0))
        tb.append(twindow(1))
    ratios = [b / a for a, b in zip(ta, tb)]
    print(f"train {size}/b8: stage1 {[round(v, 2) for v in ta]}")
    print(f"train {size}/b8: stage12 {[round(v, 2) for v in tb]}")
    print(f"train: stage12/stage1 median {np.median(ratios):.3f}x "
          f"windows {[round(r, 3) for r in ratios]}")


if __name__ == "__main__":
    main()
