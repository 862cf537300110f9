#!/usr/bin/env python3
"""Paired A/B: full postprocess program with sort-based lax.top_k vs the
PartialReduce exact top-k (_exact_top_k) at the serving shape
([16, 22743, 85], pre_nms_topk 2048, conf 0.0001 — the val protocol).

postprocess() is jitted at module level, so the variants are built from
postprocess.__wrapped__ with the module's _exact_top_k patched at trace
time. Interleaved windows; value-fetch sync.
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

import yolov4_tpu.ops.postprocess as pp  # noqa: E402

B, N, C = 16, 22743, 80


def make_preds(seed):
    rng = np.random.default_rng(seed)
    preds = np.zeros((B, N, 5 + C), np.float32)
    preds[..., 0:2] = rng.uniform(0, 608, (B, N, 2))
    preds[..., 2:4] = rng.uniform(4, 200, (B, N, 2))
    preds[..., 4] = 1.0 / (1.0 + np.exp(-rng.normal(-2.0, 2.0, (B, N))))
    preds[..., 5:] = 1.0 / (1.0 + np.exp(-rng.normal(-3.0, 2.0, (B, N, C))))
    return preds


def build(kind):
    orig = pp._exact_top_k
    if kind == "sort":
        pp._exact_top_k = lambda x, k: jax.lax.top_k(x, k)
    fn = jax.jit(lambda p: pp.postprocess.__wrapped__(
        p, C, 1e-4, 0.4, pre_nms_topk=2048, max_dets=100))
    dev = jnp.asarray(make_preds(0))
    out = fn(dev)  # trace+compile NOW, while the patch is active
    jax.block_until_ready(out)
    pp._exact_top_k = orig
    return fn, dev, out


def window(fn, dev, iters=30):
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(dev)
    np.asarray(out[0][:, :1, :1])
    return (time.time() - t0) / iters * 1000.0


def main():
    f_sort, dev, out_sort = build("sort")
    f_pr, _, out_pr = build("pr")

    det_s, val_s = (np.asarray(x) for x in out_sort[:2])
    det_p, val_p = (np.asarray(x) for x in out_pr[:2])
    print("valid equal:", np.array_equal(val_s, val_p),
          " det allclose:", np.allclose(det_s, det_p, rtol=1e-6, atol=1e-6),
          " det bitequal:", np.array_equal(det_s, det_p))

    for fn in (f_sort, f_pr):
        window(fn, dev, iters=5)
    ts, tp = [], []
    for _ in range(6):
        ts.append(window(f_sort, dev))
        tp.append(window(f_pr, dev))
    ratios = [b / a for a, b in zip(ts, tp)]
    print(f"sort  ms: {[round(t, 2) for t in ts]}")
    print(f"pr    ms: {[round(t, 2) for t in tp]}")
    print(f"pr/sort: median {np.median(ratios):.3f}x windows "
          f"{[round(r, 3) for r in ratios]}")


if __name__ == "__main__":
    main()
