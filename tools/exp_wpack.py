#!/usr/bin/env python3
"""Lane-packing experiment (VERDICT r2 next #4 / docs/STATUS.md gap #2).

Premise: the C=64 stride-4 stage (stage1, 304^2) runs Mish on half-idle
VPU lanes and 1x1 convs with K=64 of the MXU's 128 contracting rows.
Packing two image COLUMNS into the 128-lane channel dim ([B, H, W, 64] ->
[B, H, W/2, 128], channel = s*64 + c for x = 2j + s) should double both:
1x1 convs become block-diagonal [128, 128] kernels, the 3x3 becomes a
[3, 3, 128, 128] kernel whose taps route the cross-column neighborhoods
(6 of 12 blocks nonzero), and Mish/BN are elementwise (full lanes).

This microbenchmark times the stage1 op MIX (shapes + dataflow of
CSPDownSample0 at 608-input scale, eval-affine BN) plain vs packed, with
INTERLEAVED paired windows, before any model integration. Both programs
compute the same function: the packed path packs the input, runs
rearranged kernels, unpacks at the end (in the real integration both
boundary transforms fold into the neighboring strided convs, so this
measurement UNDERSTATES the packed win by the pack/unpack copies; use
--fold-boundaries to estimate without them).

Run: python tools/exp_wpack.py [--batch 16] [--size 608] [--iters 20]
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

from yolov4_tpu.models.layers import mish  # noqa: E402


def wpack(x):
    """[B, H, W, C] -> [B, H, W/2, 2C], channel s*C+c holds x=2j+s.

    s-major packing makes this a PURE RESHAPE (W and C are adjacent axes),
    so no transpose/copy is involved even standalone."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def wunpack(x):
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def pack_1x1(w):
    """[ci, co] -> block-diag [2ci, 2co]."""
    ci, co = w.shape
    out = jnp.zeros((2 * ci, 2 * co), w.dtype)
    out = out.at[:ci, :co].set(w)
    out = out.at[ci:, co:].set(w)
    return out


def pack_3x3(w):
    """[3, 3, ci, co] -> [3, 3, 2ci, 2co] packed-x kernel.

    Output sub s=0 at packed col j taps (dx=-1: j-1 sub1), (dx=0: j sub0),
    (dx=1: j sub1); sub s=1 taps (dx=-1: j sub0), (dx=0: j sub1),
    (dx=1: j+1 sub0).
    """
    _, _, ci, co = w.shape
    out = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for dy in range(3):
        # tap u=-1 (index 0): in-sub 1 -> out-sub 0 with W[dx=-1]
        out = out.at[dy, 0, ci:, :co].set(w[dy, 0])
        # tap u=0: four blocks
        out = out.at[dy, 1, :ci, :co].set(w[dy, 1])   # s=0, dx=0
        out = out.at[dy, 1, ci:, :co].set(w[dy, 2])   # s=0, dx=+1
        out = out.at[dy, 1, :ci, co:].set(w[dy, 0])   # s=1, dx=-1
        out = out.at[dy, 1, ci:, co:].set(w[dy, 1])   # s=1, dx=0
        # tap u=+1 (index 2): in-sub 0 -> out-sub 1 with W[dx=+1]
        out = out.at[dy, 2, :ci, co:].set(w[dy, 2])
    return out


def conv(x, w, affine_scale, affine_bias, stride=1):
    """conv + eval-BN affine + mish (what XLA fuses per stage1 layer)."""
    if w.ndim == 2:
        w = w[None, None]
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return mish(y * affine_scale + affine_bias)


def make_weights(rng, dtype):
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.05, s), dtype)
    aff = lambda c: (jnp.asarray(rng.uniform(0.8, 1.2, (c,)), dtype),
                     jnp.asarray(rng.uniform(-0.1, 0.1, (c,)), dtype))
    w = {
        "part1": (mk(64, 64), *aff(64)),
        "p211": (mk(64, 64), *aff(64)),
        "p2120": (mk(64, 32), *aff(32)),
        "p2121": (mk(3, 3, 32, 64), *aff(64)),
        "p22": (mk(64, 64), *aff(64)),
        "trans": (mk(128, 64), *aff(64)),
    }
    return w


def stage_plain(x, w):
    x1 = conv(x, *w["part1"])
    x2a = conv(x, *w["p211"])
    h = conv(x2a, *w["p2120"])
    h = conv(h, *w["p2121"])
    x2 = x2a + h
    x2 = conv(x2, *w["p22"])
    cat = jnp.concatenate([x2, x1], axis=-1)
    return conv(cat, *w["trans"])


def pack_affine(s):
    return jnp.concatenate([s, s])


def pack_weights(w):
    pw = {}
    for k, (kern, s, b) in w.items():
        if k == "trans":
            continue
        pk = pack_1x1(kern) if kern.ndim == 2 else pack_3x3(kern)
        pw[k] = (pk, pack_affine(s), pack_affine(b))
    # transition consumes concat([x2, x1]) where each is PACKED (s-major):
    # packed concat channels = [x2 s0, x2 s1, x1 s0, x1 s1] (64 each);
    # packed out sub s draws x2-part from block (x2, s) and x1-part from
    # (x1, s).
    kern, s, b = w["trans"]
    k2, k1 = kern[:64], kern[64:]
    pk = jnp.zeros((256, 128), kern.dtype)
    pk = pk.at[0:64, 0:64].set(k2)      # x2 s0 -> out s0
    pk = pk.at[64:128, 64:128].set(k2)  # x2 s1 -> out s1
    pk = pk.at[128:192, 0:64].set(k1)   # x1 s0 -> out s0
    pk = pk.at[192:256, 64:128].set(k1)  # x1 s1 -> out s1
    pw["trans"] = (pk, pack_affine(s), pack_affine(b))
    return pw


def stage_packed(x, pw, fold_boundaries):
    if not fold_boundaries:
        x = wpack(x)
    x1 = conv(x, *pw["part1"])
    x2a = conv(x, *pw["p211"])
    h = conv(x2a, *pw["p2120"])
    h = conv(h, *pw["p2121"])
    x2 = x2a + h
    x2 = conv(x2, *pw["p22"])
    cat = jnp.concatenate([x2, x1], axis=-1)
    out = conv(cat, *pw["trans"])
    if not fold_boundaries:
        out = wunpack(out)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=608)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--windows", type=int, default=6)
    p.add_argument("--fold-boundaries", action="store_true",
                   help="feed/keep packed layout (bounds the integrated "
                        "win; skips pack/unpack copies)")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    h = args.size // 2  # stage1 spatial
    rng = np.random.default_rng(0)

    w = make_weights(rng, dtype)
    pw = jax.tree.map(jax.jit(lambda t: t), pack_weights(w))  # materialize
    x = jnp.asarray(rng.normal(0, 1, (args.batch, h, h, 64)), dtype)
    xp = jax.jit(wpack)(x)

    f_plain = jax.jit(lambda x, w: stage_plain(x, w))
    f_packed = jax.jit(lambda x, pw: stage_packed(x, pw,
                                                  args.fold_boundaries))
    xin = xp if args.fold_boundaries else x

    # correctness first
    a = np.asarray(f_plain(x, w), np.float32)
    bp = f_packed(xin, pw)
    b = np.asarray(jax.jit(wunpack)(bp) if args.fold_boundaries else bp,
                   np.float32)
    err = np.max(np.abs(a - b)) / max(1e-6, np.max(np.abs(a)))
    print(f"packed vs plain max rel err: {err:.2e}")
    assert err < (5e-2 if dtype == jnp.bfloat16 else 1e-5), err

    def window(f, *fargs):
        t0 = time.time()
        for _ in range(args.iters):
            out = f(*fargs)
        jax.block_until_ready(out)
        return (time.time() - t0) / args.iters * 1000.0

    window(f_plain, x, w)
    window(f_packed, xin, pw)
    pl, pk, ratios = [], [], []
    for _ in range(args.windows):
        a_ms = window(f_plain, x, w)
        b_ms = window(f_packed, xin, pw)
        pl.append(a_ms)
        pk.append(b_ms)
        ratios.append(b_ms / a_ms)
    print(f"plain  ms: {[round(v, 2) for v in pl]}")
    print(f"packed ms: {[round(v, 2) for v in pk]}")
    print(f"packed/plain: median {np.median(ratios):.3f}x "
          f"(windows {[round(r, 3) for r in ratios]})")


if __name__ == "__main__":
    main()
