#!/usr/bin/env python3
"""Paired A/B: int8_static link chaining (MODEL.QUANT_CHAIN) on vs off on
the serving programs (fwd+decode and fwd+decode+NMS). Outputs are
bit-identical by construction (tests/test_quant.py); this measures the
bandwidth effect of producer-side quantization (bf16 intermediates and
separate quantize passes eliminated). Interleaved windows, value-fetch
sync.

    python tools/exp_chain.py [--size 608] [--batch 16] [--skip-nms]
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
from yolov4_tpu.models.yolov4 import (calibrate_variables,  # noqa: E402
                                      init_variables)
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
    print(f"{name}: no-chain {[round(v, 2) for v in ta]}")
    print(f"{name}: chain    {[round(v, 2) for v in tb]}")
    print(f"{name}: chain/no-chain median {np.median(ratios):.3f}x  "
          f"no-chain med {np.median(ta):.2f} ms  "
          f"chain med {np.median(tb):.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=608)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--skip-nms", action="store_true")
    args = p.parse_args()
    size, batch = args.size, args.batch
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32)

    models, variables = [], []
    for chain in (False, True):
        cfg = load_config()
        cfg["MODEL"].update(QUANT="int8_static", QUANT_CHAIN=chain)
        m = build_model(cfg)
        v = jax.device_put(init_variables(m, jax.random.PRNGKey(0), size))
        v = jax.device_put(calibrate_variables(m, v, imgs))
        models.append(m)
        variables.append(v)
    (ma, mb), (va, vb) = models, variables

    fa = jax.jit(lambda v, x: ma.apply(v, x, train=False))
    fb = jax.jit(lambda v, x: mb.apply(v, x, train=False))

    def fetch(o):
        np.asarray(o[0, 0, 0])

    paired(f"fwd+decode {size}/b{batch}", fa, (va, imgs), fb, (vb, imgs),
           fetch)
    if args.skip_nms:
        return

    def with_nms(model):
        @jax.jit
        def full(v, x):
            preds = model.apply(v, x, train=False)
            return postprocess(preds, 80, 0.005, 0.4,
                               pre_nms_topk=2048, max_dets=100)
        return full

    ga, gb = with_nms(ma), with_nms(mb)

    def fetch_nms(o):
        np.asarray(jax.tree.leaves(o)[0][0, 0, 0])

    paired(f"fwd+NMS {size}/b{batch}", ga, (va, imgs), gb, (vb, imgs),
           fetch_nms)


if __name__ == "__main__":
    main()
