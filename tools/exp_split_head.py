#!/usr/bin/env python3
"""Paired A/B: fused 255-channel head output conv + [B,f,f,A,C] ->
[B,A,f,f,C] transpose decode (current) vs the per-anchor SPLIT output
conv (MODEL.SPLIT_HEAD) whose three 85-channel maps flatten straight
into the reference's anchor-major candidate order — the eval trace
charges ~2.5 ms/batch of convert+transpose copies to that layout at
608/b16 (docs/PERF.md). Same parameters; outputs must match.
"""

from __future__ import annotations

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


def main():
    size = 608
    cfg = load_config()
    m0 = build_model(cfg)
    cfg2 = load_config()
    cfg2["MODEL"]["SPLIT_HEAD"] = True
    m1 = build_model(cfg2)
    variables = jax.device_put(init_variables(m0, jax.random.PRNGKey(0),
                                              size))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((16, size, size, 3)), jnp.float32)

    f0 = jax.jit(lambda v, x: m0.apply(v, x, train=False))
    f1 = jax.jit(lambda v, x: m1.apply(v, x, train=False))

    a = np.asarray(f0(variables, imgs)[:2, :512], np.float32)
    b = np.asarray(f1(variables, imgs)[:2, :512], np.float32)
    err = np.max(np.abs(a - b)) / max(1e-6, np.max(np.abs(a)))
    print(f"outputs: bitequal={np.array_equal(a, b)} max rel err {err:.2e}")

    def fetch(o):
        np.asarray(o[0, 0, 0])

    def window(f, iters=20):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = f(variables, imgs)
        fetch(out)
        return (time.time() - t0) / iters * 1000.0

    window(f0, 3); window(f1, 3)
    t0s, t1s = [], []
    for _ in range(6):
        t0s.append(window(f0))
        t1s.append(window(f1))
    ratios = [y / x for x, y in zip(t0s, t1s)]
    print(f"fused ms: {[round(v, 2) for v in t0s]}")
    print(f"split ms: {[round(v, 2) for v in t1s]}")
    print(f"split/fused: median {np.median(ratios):.3f}x windows "
          f"{[round(r, 3) for r in ratios]}")


if __name__ == "__main__":
    main()
