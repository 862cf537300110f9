#!/usr/bin/env python3
"""Upper-bound probe: what is Mish actually costing the serving forward?

Compiles the eval fwd+decode program twice — once as shipped, once with
every act="mish" site TRACED as leaky_relu (ACTIVATIONS patched during
lowering only; params/layout/conv structure identical) — and times the
two compiled executables in interleaved paired windows. The delta is the
CEILING for any cheaper-activation scheme (approximation, table lookup):
no fast-mish can beat replacing the transcendental with a select.

This is a measurement probe, not a model option — leaky-for-mish changes
the numerics completely. If the ceiling is small, no fast-mish variant is
worth building (the v5e VPU evaluates the one-exp algebraic mish nearly
as fast as a select); if large, it motivates an opt-in approximation.

    python tools/exp_act_bound.py [--size 608] [--batch 16] [--quant X]
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
from yolov4_tpu.models import layers as L  # noqa: E402
from yolov4_tpu.models.yolov4 import init_variables  # noqa: E402


def compile_fwd(model, variables, imgs):
    def f(v, x):
        return model.apply(v, x, train=False)
    return jax.jit(f).lower(variables, imgs).compile()


def window(fn, args_, iters=20):
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args_)
    np.asarray(out[0, 0, 0])  # value-fetch sync (PERF.md rules #3/#4)
    return (time.time() - t0) / iters * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=608)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--quant", choices=["none", "int8", "int8_static"],
                   default="none")
    p.add_argument("--windows", type=int, default=6)
    args = p.parse_args()
    size, batch = args.size, args.batch
    rng = np.random.default_rng(0)

    cfg = load_config()
    if args.quant != "none":
        cfg["MODEL"]["QUANT"] = args.quant
    model = build_model(cfg)
    variables = jax.device_put(init_variables(model, jax.random.PRNGKey(0),
                                              size))
    imgs = jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32)
    if args.quant == "int8_static":
        from yolov4_tpu.models.yolov4 import calibrate_variables
        variables = jax.device_put(calibrate_variables(model, variables,
                                                       imgs))

    f_mish = compile_fwd(model, variables, imgs)

    # trace the SAME module with mish lowered as leaky_relu: the compiled
    # executable is frozen, so restoring the dict afterwards is safe
    real = L.ACTIVATIONS["mish"]
    L.ACTIVATIONS["mish"] = L.ACTIVATIONS["leaky_relu"]
    try:
        f_leaky = compile_fwd(model, variables, imgs)
    finally:
        L.ACTIVATIONS["mish"] = real

    window(f_mish, (variables, imgs), 3)
    window(f_leaky, (variables, imgs), 3)
    tm, tl = [], []
    for _ in range(args.windows):
        tm.append(window(f_mish, (variables, imgs)))
        tl.append(window(f_leaky, (variables, imgs)))
    ratios = [b / a for a, b in zip(tm, tl)]
    print(f"fwd+decode {size}/b{batch} quant={args.quant}")
    print(f"  mish  windows ms: {[round(v, 2) for v in tm]}")
    print(f"  leaky windows ms: {[round(v, 2) for v in tl]}")
    print(f"  leaky/mish median {np.median(ratios):.3f}x — mish ceiling "
          f"{np.median(tm) - np.median(tl):.2f} ms/batch")


if __name__ == "__main__":
    main()
