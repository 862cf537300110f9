"""Detection heads (reference yolo/model/yolov4.py:227-268), NHWC.

Reproduces the reference's head asymmetry: the stride-8 head's output conv
is 3x3 while the stride-16/32 output convs are 1x1 (yolov4.py:237,243,249).
Output convs carry a bias and no BatchNorm. Anchor decoding lives in
models/decode.py (pure function), not in the module.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yolov4_tpu.models.darknet import scale_channels
from yolov4_tpu.models.layers import ConvBNAct


class Head(nn.Module):
    n_classes: int = 80
    n_anchors_per_scale: int = 3
    dtype: Any = jnp.float32
    width: float = 1.0  # scales hidden convs only; output convs stay 3*(5+C)

    @nn.compact
    def __call__(self, p1, p2, p3, train: bool = False):
        d = self.dtype
        w = lambda ch: scale_channels(ch, self.width)
        out_ch = (4 + 1 + self.n_classes) * self.n_anchors_per_scale

        x1 = ConvBNAct(w(256), 3, 1, act="leaky_relu", dtype=d, name="yolo1_0")(p1, train)
        x1 = ConvBNAct(out_ch, 3, 1, bias=True, bn=False, act="linear", dtype=d,
                       name="yolo1_1")(x1, train)

        x2 = ConvBNAct(w(512), 3, 1, act="leaky_relu", dtype=d, name="yolo2_0")(p2, train)
        x2 = ConvBNAct(out_ch, 1, 1, bias=True, bn=False, act="linear", dtype=d,
                       name="yolo2_1")(x2, train)

        x3 = ConvBNAct(w(1024), 3, 1, act="leaky_relu", dtype=d, name="yolo3_0")(p3, train)
        x3 = ConvBNAct(out_ch, 1, 1, bias=True, bn=False, act="linear", dtype=d,
                       name="yolo3_1")(x3, train)

        return x1, x2, x3
