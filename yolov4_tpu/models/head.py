"""Detection heads (reference yolo/model/yolov4.py:227-268), NHWC.

Reproduces the reference's head asymmetry: the stride-8 head's output conv
is 3x3 while the stride-16/32 output convs are 1x1 (yolov4.py:237,243,249).
Output convs carry a bias and no BatchNorm. Anchor decoding lives in
models/decode.py (pure function), not in the module.

``anchor_split``: emit each scale's output as THREE per-anchor 85-channel
maps instead of one 255-channel map — the SAME output-conv parameters
(paths yolo{i}_1/conv/{kernel,bias}, identical tree) sliced per anchor at
trace time, so channels a*85..(a+1)*85 of the fused conv become map a
bit-for-bit. Downstream, each [B, f, f, 85] map flattens to candidate
rows in the reference's anchor-major order WITHOUT the
[B,f,f,3,85]->[B,3,f,f,85] transpose+convert copies the fused layout
needs (~2.5 ms/batch of the 608/b16 eval trace). Checkpoint-compatible.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov4_tpu.models.darknet import scale_channels
from yolov4_tpu.models.layers import ConvBNAct, _ConvKernelBias


class _AnchorSplitOutConv(nn.Module):
    """Biased linear output conv evaluated as n_anchors separate convs of
    ch_per channels each (kernel/bias sliced per anchor). Parameter tree
    identical to the fused ConvBNAct(bias=True, bn=False) output conv."""

    cin: int
    ch_per: int
    n_anchors: int
    ksize: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        kernel, bias = _ConvKernelBias(
            (self.ksize, self.ksize, self.cin,
             self.ch_per * self.n_anchors), name="conv")()
        pad = (self.ksize - 1) // 2
        x = x.astype(self.dtype)
        outs = []
        for a in range(self.n_anchors):
            w = kernel[..., a * self.ch_per:(a + 1) * self.ch_per]
            b = bias[a * self.ch_per:(a + 1) * self.ch_per]
            y = jax.lax.conv_general_dilated(
                x, w.astype(self.dtype), (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y + b.astype(self.dtype))
        return outs


class Head(nn.Module):
    n_classes: int = 80
    n_anchors_per_scale: int = 3
    dtype: Any = jnp.float32
    width: float = 1.0  # scales hidden convs only; output convs stay 3*(5+C)
    anchor_split: bool = False  # per-anchor output maps (see module doc)
    quant: Any = "none"  # int8 serving hidden convs (layers._quant_conv)

    @nn.compact
    def __call__(self, p1, p2, p3, train: bool = False):
        d = self.dtype
        w = lambda ch: scale_channels(ch, self.width)
        n_ch = 4 + 1 + self.n_classes
        out_ch = n_ch * self.n_anchors_per_scale
        split = self.anchor_split and not train

        x1 = ConvBNAct(w(256), 3, 1, act="leaky_relu", dtype=d,
                       quant=self.quant, name="yolo1_0")(p1, train)
        x2 = ConvBNAct(w(512), 3, 1, act="leaky_relu", dtype=d,
                       quant=self.quant, name="yolo2_0")(p2, train)
        x3 = ConvBNAct(w(1024), 3, 1, act="leaky_relu", dtype=d,
                       quant=self.quant, name="yolo3_0")(p3, train)

        if split:
            x1 = _AnchorSplitOutConv(x1.shape[-1], n_ch,
                                     self.n_anchors_per_scale, 3, dtype=d,
                                     name="yolo1_1")(x1)
            x2 = _AnchorSplitOutConv(x2.shape[-1], n_ch,
                                     self.n_anchors_per_scale, 1, dtype=d,
                                     name="yolo2_1")(x2)
            x3 = _AnchorSplitOutConv(x3.shape[-1], n_ch,
                                     self.n_anchors_per_scale, 1, dtype=d,
                                     name="yolo3_1")(x3)
            return x1, x2, x3

        x1 = ConvBNAct(out_ch, 3, 1, bias=True, bn=False, act="linear", dtype=d,
                       name="yolo1_1")(x1, train)
        x2 = ConvBNAct(out_ch, 1, 1, bias=True, bn=False, act="linear", dtype=d,
                       name="yolo2_1")(x2, train)
        x3 = ConvBNAct(out_ch, 1, 1, bias=True, bn=False, act="linear", dtype=d,
                       name="yolo3_1")(x3, train)
        return x1, x2, x3
