"""SPP + FPN + PAN neck (reference yolo/model/yolov4.py:50-224), NHWC.

Includes the reference's SPP pooling quirk: the published model computes
``m3 = max_pool1(x)`` (yolov4.py:70), i.e. the effective pool sizes are
5/9/5 rather than the paper's 5/9/13. ``legacy_pools=True`` (default)
reproduces that for weight/accuracy parity; set False for the paper layout.

Upsampling is nearest-neighbor 2x, matching both the train path
(F.interpolate nearest) and the eval view/expand trick (yolov4.py:77-90),
which are numerically identical for integer upscale factors.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov4_tpu.models.darknet import scale_channels
from yolov4_tpu.models.layers import (ConvBNAct, _chain_active, _link_quant,
                                      _link_quant_concat)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample in NHWC via broadcast (no gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool_same(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Stride-1 max pooling with same padding (torch MaxPool2d(k, 1, k//2)).

    Custom VJP: XLA's default max-pool gradient lowers to
    select_and_scatter, which measured 11.8 ms/step at 608/b8 — 17% of
    the whole train step — for the three tiny 19^2 SPP pools. The
    backward here is size^2 shifted equality-masked adds (microseconds at
    these shapes). Tie semantics differ from select_and_scatter/torch
    only when two window elements are bit-equal (not rare under bf16
    compute): each window's gradient is then SPLIT EQUALLY among its
    maximal positions — a valid subgradient preserving total gradient
    mass — where torch routes all of it to the first. The forward is
    bit-identical."""
    return _maxpool_impl(x, size)


def _maxpool_impl(x, size):
    pad = size // 2
    return nn.max_pool(
        x, window_shape=(size, size), strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
    )


def _maxpool_same_fwd(x, size):
    y = _maxpool_impl(x, size)
    return y, (x, y)


def _maxpool_same_bwd(size, res, g):
    x, y = res
    pad = size // 2
    h, w = x.shape[1], x.shape[2]
    # ties per window: count input positions equal to the window max
    # (x padded with -inf never equals a max)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                 constant_values=-jnp.inf)
    cnt = None
    for dy in range(size):
        for dx in range(size):
            eq = (xp[:, dy:dy + h, dx:dx + w] == y).astype(jnp.float32)
            cnt = eq if cnt is None else cnt + eq
    gn = (g.astype(jnp.float32) / cnt).astype(g.dtype)
    # scatter: dL/dx[q] = sum over windows p containing q of
    # (g[p]/ties[p]) * [x[q] == y[p]]  (y padded with +inf, g with 0)
    yp = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                 constant_values=jnp.inf)
    gp = jnp.pad(gn, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = None
    for dy in range(size):
        for dx in range(size):
            ys = yp[:, dy:dy + h, dx:dx + w]
            gs = gp[:, dy:dy + h, dx:dx + w]
            c = jnp.where(x == ys, gs, jnp.zeros_like(gs))
            acc = c if acc is None else acc + c
    return (acc,)


maxpool_same.defvjp(_maxpool_same_fwd, _maxpool_same_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool_same_exact(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """maxpool_same with torch-exact tie gradients (MODEL.EXACT_POOL_GRAD).

    torch's max_pool2d backward (select_and_scatter / max_pool2d_with_
    indices) routes each window's WHOLE gradient to the FIRST maximal
    position in row-major window order (strict ``>`` comparison in the
    forward index scan). ``maxpool_same``'s default backward splits the
    gradient equally among tied maxima instead — a valid subgradient but
    not reference-matching (docs/PARITY.md). This variant reproduces the
    first-maximal routing exactly for anyone fine-tuning converted
    weights who needs torch-identical training gradients. Forward is
    bit-identical to both torch and maxpool_same.

    Cost: one extra argmin pass over the size^2 shifted equality masks
    (the positional tiebreak the default deliberately avoids); see
    docs/PARITY.md for the measured step delta."""
    return _maxpool_impl(x, size)


def _maxpool_exact_bwd(size, res, g):
    x, y = res
    pad = size // 2
    h, w = x.shape[1], x.shape[2]
    n2 = size * size
    # pass 1: per window, the row-major linear index (dy*size+dx) of the
    # FIRST input position equal to the window max. x padded with -inf
    # never equals a max, and every window contains its own max, so
    # first < n2 for all windows.
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                 constant_values=-jnp.inf)
    first = None
    for dy in range(size):
        for dx in range(size):
            k = dy * size + dx
            idx = jnp.where(xp[:, dy:dy + h, dx:dx + w] == y, k, n2)
            first = idx if first is None else jnp.minimum(first, idx)
    first = first.astype(jnp.int32)
    # pass 2: scatter. Input q is covered by window p = q + pad - (dy,dx)
    # (sliced as fp[dy:dy+h, dx:dx+w]); q's offset inside that window is
    # (size-1-dy, size-1-dx). q receives g[p] iff it is p's first max.
    fp = jnp.pad(first, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                 constant_values=-1)
    gp = jnp.pad(g, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = None
    for dy in range(size):
        for dx in range(size):
            k = (size - 1 - dy) * size + (size - 1 - dx)
            fs = fp[:, dy:dy + h, dx:dx + w]
            gs = gp[:, dy:dy + h, dx:dx + w]
            c = jnp.where(fs == k, gs, jnp.zeros_like(gs))
            acc = c if acc is None else acc + c
    return (acc,)


maxpool_same_exact.defvjp(_maxpool_same_fwd, _maxpool_exact_bwd)


class SPPBlock(nn.Module):
    """Spatial pyramid pooling (reference yolov4.py:50-74)."""

    legacy_pools: bool = True
    dtype: Any = jnp.float32
    width: float = 1.0
    quant: Any = "none"  # int8 serving convs (layers._quant_conv)
    quant_chain: bool = True  # int8_static link chaining (_link_quant)
    exact_pool_grad: bool = False  # torch-exact tie gradients (see above)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        ch = _chain_active(self.quant, self.quant_chain, train)
        w = lambda ch: scale_channels(ch, self.width)
        x = ConvBNAct(w(512), 1, 1, act="leaky_relu", dtype=d, quant=self.quant, name="conv1_0")(x, train)
        x = ConvBNAct(w(1024), 3, 1, act="leaky_relu", dtype=d, quant=self.quant, name="conv1_1")(
            _link_quant(self, "link_0", x, ch), train)
        x = ConvBNAct(w(512), 1, 1, act="leaky_relu", dtype=d, quant=self.quant, name="conv1_2")(
            _link_quant(self, "link_1", x, ch), train)

        pool = maxpool_same_exact if self.exact_pool_grad else maxpool_same
        m1 = pool(x, 5)
        m2 = pool(x, 9)
        # reference quirk: third branch reuses pool size 5 (yolov4.py:70)
        m3 = pool(x, 5) if self.legacy_pools else pool(x, 13)

        x = _link_quant_concat(self, "link_cat", [m3, m2, m1, x], ch)
        return ConvBNAct(w(512), 1, 1, act="leaky_relu", dtype=d, quant=self.quant, name="conv2")(x, train)


class FPNBlock(nn.Module):
    """Top-down feature pyramid (reference yolov4.py:93-149)."""

    dtype: Any = jnp.float32
    width: float = 1.0
    quant: Any = "none"
    quant_chain: bool = True  # int8_static link chaining (_link_quant)

    @nn.compact
    def __call__(self, x3, x4, x5, train: bool = False):
        d = self.dtype
        chn = _chain_active(self.quant, self.quant_chain, train)
        w = lambda ch: scale_channels(ch, self.width)
        f3 = ConvBNAct(w(1024), 3, 1, act="leaky_relu", dtype=d, quant=self.quant, name="module1_0")(x5, train)
        f3 = ConvBNAct(w(512), 1, 1, act="leaky_relu", dtype=d, quant=self.quant, name="module1_1")(
            _link_quant(self, "link_m1", f3, chn), train)

        f2 = ConvBNAct(w(256), 1, 1, dtype=d, quant=self.quant, name="conv3")(f3, train)  # default act: leaky
        f2 = upsample2x_nearest(f2)
        x4 = ConvBNAct(w(256), 1, 1, act="leaky_relu", dtype=d, quant=self.quant, name="conv4")(x4, train)
        f2 = _link_quant_concat(self, "link_cat2", [x4, f2], chn)
        for i, (ch, k) in enumerate([(256, 1), (512, 3), (256, 1), (512, 3), (256, 1)]):
            f2 = ConvBNAct(w(ch), k, 1, act="leaky_relu", dtype=d, quant=self.quant, name=f"module2_{i}")(f2, train)
            if i < 4:
                f2 = _link_quant(self, f"link_m2_{i}", f2, chn)

        # f2 leaves this module in bf16: it feeds both conv10 and a PAN
        # concat, so the bf16 tensor must exist either way — a producer-
        # side link for conv10 would cost the same standalone quantize
        # pass conv10's own consumer-side quantize already pays
        f1 = ConvBNAct(w(128), 1, 1, dtype=d, quant=self.quant, name="conv10")(f2, train)
        f1 = upsample2x_nearest(f1)
        x3 = ConvBNAct(w(128), 1, 1, act="leaky_relu", dtype=d, quant=self.quant, name="conv11")(x3, train)
        f1 = _link_quant_concat(self, "link_cat3", [x3, f1], chn)
        for i, (ch, k) in enumerate([(128, 1), (256, 3), (128, 1), (256, 3), (128, 1)]):
            f1 = ConvBNAct(w(ch), k, 1, act="leaky_relu", dtype=d, quant=self.quant, name=f"module3_{i}")(f1, train)
            if i < 4:
                f1 = _link_quant(self, f"link_m3_{i}", f1, chn)

        return f1, f2, f3


class PANBlock(nn.Module):
    """Bottom-up path aggregation (reference yolov4.py:152-191)."""

    dtype: Any = jnp.float32
    width: float = 1.0
    quant: Any = "none"
    quant_chain: bool = True  # int8_static link chaining (_link_quant)

    @nn.compact
    def __call__(self, f1, f2, f3, train: bool = False):
        d = self.dtype
        chn = _chain_active(self.quant, self.quant_chain, train)
        w = lambda ch: scale_channels(ch, self.width)
        p1 = f1

        p2 = ConvBNAct(w(256), 3, 2, act="leaky_relu", dtype=d, quant=self.quant, name="conv1")(f1, train)
        p2 = _link_quant_concat(self, "link_cat1", [p2, f2], chn)
        for i, (ch, k) in enumerate([(256, 1), (512, 3), (256, 1), (512, 3), (256, 1)]):
            p2 = ConvBNAct(w(ch), k, 1, act="leaky_relu", dtype=d, quant=self.quant, name=f"module1_{i}")(p2, train)
            if i < 4:
                p2 = _link_quant(self, f"link_m1_{i}", p2, chn)

        # p2 stays bf16: it feeds both conv7 and the head
        p3 = ConvBNAct(w(512), 3, 2, act="leaky_relu", dtype=d, quant=self.quant, name="conv7")(p2, train)
        p3 = _link_quant_concat(self, "link_cat2", [p3, f3], chn)
        for i, (ch, k) in enumerate([(512, 1), (1024, 3), (512, 1), (1024, 3), (512, 1)]):
            p3 = ConvBNAct(w(ch), k, 1, act="leaky_relu", dtype=d, quant=self.quant, name=f"module2_{i}")(p3, train)
            if i < 4:
                p3 = _link_quant(self, f"link_m2_{i}", p3, chn)

        return p1, p2, p3


class Neck(nn.Module):
    """SPP + FPN + PAN (reference yolov4.py:194-224)."""

    legacy_pools: bool = True
    dtype: Any = jnp.float32
    width: float = 1.0  # channel multiplier (1.0 = reference; see darknet.py)
    quant: Any = "none"  # int8 serving convs (layers._quant_conv)
    quant_chain: bool = True  # int8_static link chaining (_link_quant)
    exact_pool_grad: bool = False  # torch-exact tie gradients (SPPBlock)

    @nn.compact
    def __call__(self, x3, x4, x5, train: bool = False):
        spp = SPPBlock(legacy_pools=self.legacy_pools, dtype=self.dtype,
                       width=self.width, quant=self.quant,
                       quant_chain=self.quant_chain,
                       exact_pool_grad=self.exact_pool_grad,
                       name="spp")(x5, train)
        f1, f2, f3 = FPNBlock(dtype=self.dtype, width=self.width,
                              quant=self.quant, quant_chain=self.quant_chain,
                              name="fpn")(x3, x4, spp, train)
        return PANBlock(dtype=self.dtype, width=self.width,
                        quant=self.quant, quant_chain=self.quant_chain,
                        name="pan")(f1, f2, f3, train)
