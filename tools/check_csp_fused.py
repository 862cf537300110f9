#!/usr/bin/env python3
"""On-chip parity + paired A/B timing for the fused Pallas CSP stages
(MODEL.PALLAS_CSP) vs the plain XLA forward.

    python tools/check_csp_fused.py [--img-size 608] [--batch 16] [--f32]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-size", type=int, default=608)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--windows", type=int, default=6)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--no-bench", action="store_true")
    args = p.parse_args()
    size, b = args.img_size, args.batch

    cfg = load_config()
    if args.f32:
        cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    plain = build_model(cfg)
    cfg2 = load_config()
    if args.f32:
        cfg2["MODEL"]["COMPUTE_DTYPE"] = "float32"
    cfg2["MODEL"]["PALLAS_CSP"] = True
    fused = build_model(cfg2)

    variables = jax.device_put(
        init_variables(plain, jax.random.PRNGKey(0), size))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((b, size, size, 3)), jnp.float32)

    # variables as args (closures bake weights into half-GB cache entries)
    fp = jax.jit(lambda v, x: plain.apply(v, x, train=False))
    ff = jax.jit(lambda v, x: fused.apply(v, x, train=False))
    f_plain = lambda x: fp(variables, x)
    f_fused = lambda x: ff(variables, x)

    t0 = time.time()
    y0 = jax.block_until_ready(f_plain(imgs))
    print(f"plain compiled+ran in {time.time() - t0:.1f}s")
    t0 = time.time()
    y1 = jax.block_until_ready(f_fused(imgs))
    print(f"fused compiled+ran in {time.time() - t0:.1f}s")

    a0, a1 = np.asarray(y0, np.float32), np.asarray(y1, np.float32)
    denom = np.maximum(np.abs(a0), 1e-3)
    rel = np.abs(a1 - a0) / denom
    print(f"parity: max abs diff {np.max(np.abs(a1 - a0)):.3e}, "
          f"max rel {np.max(rel):.3e}, mean rel {np.mean(rel):.3e}")

    if args.no_bench:
        return

    def window(f, iters):
        t0 = time.time()
        for _ in range(iters):
            out = f(imgs)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters * 1000.0

    window(f_plain, 3)
    window(f_fused, 3)
    p_ms, f_ms, ratios = [], [], []
    for _ in range(args.windows):
        mp = window(f_plain, args.iters)
        mf = window(f_fused, args.iters)
        p_ms.append(mp)
        f_ms.append(mf)
        ratios.append(mp / mf)
    print(f"plain ms/batch: {[round(x, 2) for x in p_ms]}")
    print(f"fused ms/batch: {[round(x, 2) for x in f_ms]}")
    print(f"plain median {np.median(p_ms):.2f} ms "
          f"({b / np.median(p_ms) * 1000:.1f} img/s)  "
          f"fused median {np.median(f_ms):.2f} ms "
          f"({b / np.median(f_ms) * 1000:.1f} img/s)  "
          f"speedup paired median {np.median(ratios):.3f}x")


if __name__ == "__main__":
    main()
