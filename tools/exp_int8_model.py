#!/usr/bin/env python3
"""Paired A/B: MODEL.QUANT "int8" vs "none" on the full serving programs
(fwd+decode and fwd+decode+NMS) at 608/b16. Interleaved windows,
value-fetch sync. Timing only — accuracy is measured separately on the
overfit-smoke trained model (tools/overfit_smoke.py --quant-eval).

    python tools/exp_int8_model.py [--size 608] [--batch 16] [--skip-nms]
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
from yolov4_tpu.ops.postprocess import postprocess  # noqa: E402


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
    print(f"{name}: bf16 {[round(v, 2) for v in ta]}")
    print(f"{name}: int8 {[round(v, 2) for v in tb]}")
    print(f"{name}: int8/bf16 median {np.median(ratios):.3f}x  "
          f"bf16 med {np.median(ta):.2f} ms  int8 med {np.median(tb):.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=608)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--skip-nms", action="store_true")
    p.add_argument("--static", action="store_true",
                   help="compare int8_static (calibrated scales) instead "
                   "of dynamic int8 against bf16")
    p.add_argument("--span", choices=["late", "full"], default=None,
                   help="QUANT_SPAN for the quant side (default: config)")
    p.add_argument("--base", choices=["bf16", "int8-late"], default="bf16",
                   help="baseline side: plain bf16, or int8 with span "
                   "'late' (to isolate the stage1/2 full-span delta)")
    args = p.parse_args()
    size, batch = args.size, args.batch
    rng = np.random.default_rng(0)

    qmode = "int8_static" if args.static else "int8"
    cfgp = load_config()
    if args.base == "int8-late":
        cfgp["MODEL"].update(QUANT=qmode, QUANT_SPAN="late")
    mp = build_model(cfgp)
    cfgq = load_config()
    cfgq["MODEL"]["QUANT"] = qmode
    if args.span:
        cfgq["MODEL"]["QUANT_SPAN"] = args.span
    mq = build_model(cfgq)

    variables = jax.device_put(init_variables(mp, jax.random.PRNGKey(0), size))
    imgs = jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32)

    if args.static:
        # record calibration scales once (dynamic abs-max pass), then time
        # the static program with them
        from yolov4_tpu.models.yolov4 import calibrate_variables
        qvariables = jax.device_put(calibrate_variables(mq, variables, imgs))
        if args.base == "int8-late":
            variables = jax.device_put(
                calibrate_variables(mp, variables, imgs))
    else:
        qvariables = variables

    fp = jax.jit(lambda v, x: mp.apply(v, x, train=False))
    fq = jax.jit(lambda v, x: mq.apply(v, x, train=False))

    def fetch(o):
        np.asarray(o[0, 0, 0])

    paired(f"fwd+decode {size}/b{batch}", fp, (variables, imgs),
           fq, (qvariables, imgs), fetch)

    if args.skip_nms:
        return

    def with_nms(model):
        def f(v, x):
            preds = model.apply(v, x, train=False)
            return postprocess(preds, 80, 0.005, 0.4,
                               pre_nms_topk=2048, max_dets=100)
        return jax.jit(f)

    gp, gq = with_nms(mp), with_nms(mq)

    def fetch_nms(o):
        np.asarray(o[0][0, 0, 0])

    paired(f"fwd+NMS {size}/b{batch}", gp, (variables, imgs),
           gq, (qvariables, imgs), fetch_nms)


if __name__ == "__main__":
    main()
