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

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yolov4_tpu.models.layers import ConvBNAct


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample in NHWC via broadcast (no gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def maxpool_same(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Stride-1 max pooling with same padding (torch MaxPool2d(k, 1, k//2))."""
    pad = size // 2
    return nn.max_pool(
        x, window_shape=(size, size), strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
    )


class SPPBlock(nn.Module):
    """Spatial pyramid pooling (reference yolov4.py:50-74)."""

    legacy_pools: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = ConvBNAct(512, 1, 1, act="leaky_relu", dtype=d, name="conv1_0")(x, train)
        x = ConvBNAct(1024, 3, 1, act="leaky_relu", dtype=d, name="conv1_1")(x, train)
        x = ConvBNAct(512, 1, 1, act="leaky_relu", dtype=d, name="conv1_2")(x, train)

        m1 = maxpool_same(x, 5)
        m2 = maxpool_same(x, 9)
        # reference quirk: third branch reuses pool size 5 (yolov4.py:70)
        m3 = maxpool_same(x, 5) if self.legacy_pools else maxpool_same(x, 13)

        x = jnp.concatenate([m3, m2, m1, x], axis=-1)
        return ConvBNAct(512, 1, 1, act="leaky_relu", dtype=d, name="conv2")(x, train)


class FPNBlock(nn.Module):
    """Top-down feature pyramid (reference yolov4.py:93-149)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x3, x4, x5, train: bool = False):
        d = self.dtype
        f3 = ConvBNAct(1024, 3, 1, act="leaky_relu", dtype=d, name="module1_0")(x5, train)
        f3 = ConvBNAct(512, 1, 1, act="leaky_relu", dtype=d, name="module1_1")(f3, train)

        f2 = ConvBNAct(256, 1, 1, dtype=d, name="conv3")(f3, train)  # default act: leaky
        f2 = upsample2x_nearest(f2)
        x4 = ConvBNAct(256, 1, 1, act="leaky_relu", dtype=d, name="conv4")(x4, train)
        f2 = jnp.concatenate([x4, f2], axis=-1)
        for i, (ch, k) in enumerate([(256, 1), (512, 3), (256, 1), (512, 3), (256, 1)]):
            f2 = ConvBNAct(ch, k, 1, act="leaky_relu", dtype=d, name=f"module2_{i}")(f2, train)

        f1 = ConvBNAct(128, 1, 1, dtype=d, name="conv10")(f2, train)
        f1 = upsample2x_nearest(f1)
        x3 = ConvBNAct(128, 1, 1, act="leaky_relu", dtype=d, name="conv11")(x3, train)
        f1 = jnp.concatenate([x3, f1], axis=-1)
        for i, (ch, k) in enumerate([(128, 1), (256, 3), (128, 1), (256, 3), (128, 1)]):
            f1 = ConvBNAct(ch, k, 1, act="leaky_relu", dtype=d, name=f"module3_{i}")(f1, train)

        return f1, f2, f3


class PANBlock(nn.Module):
    """Bottom-up path aggregation (reference yolov4.py:152-191)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f1, f2, f3, train: bool = False):
        d = self.dtype
        p1 = f1

        p2 = ConvBNAct(256, 3, 2, act="leaky_relu", dtype=d, name="conv1")(f1, train)
        p2 = jnp.concatenate([p2, f2], axis=-1)
        for i, (ch, k) in enumerate([(256, 1), (512, 3), (256, 1), (512, 3), (256, 1)]):
            p2 = ConvBNAct(ch, k, 1, act="leaky_relu", dtype=d, name=f"module1_{i}")(p2, train)

        p3 = ConvBNAct(512, 3, 2, act="leaky_relu", dtype=d, name="conv7")(p2, train)
        p3 = jnp.concatenate([p3, f3], axis=-1)
        for i, (ch, k) in enumerate([(512, 1), (1024, 3), (512, 1), (1024, 3), (512, 1)]):
            p3 = ConvBNAct(ch, k, 1, act="leaky_relu", dtype=d, name=f"module2_{i}")(p3, train)

        return p1, p2, p3


class Neck(nn.Module):
    """SPP + FPN + PAN (reference yolov4.py:194-224)."""

    legacy_pools: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x3, x4, x5, train: bool = False):
        spp = SPPBlock(legacy_pools=self.legacy_pools, dtype=self.dtype, name="spp")(x5, train)
        f1, f2, f3 = FPNBlock(dtype=self.dtype, name="fpn")(x3, x4, spp, train)
        return PANBlock(dtype=self.dtype, name="pan")(f1, f2, f3, train)
