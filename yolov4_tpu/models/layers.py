"""Building-block layers (NHWC, bf16-compute/f32-param).

TPU-native counterparts of the reference's darknet blocks
(darknet/darknet.py:14-138): Mish, ConvBNAct, ResBlock, CSPDownSample0,
CSPDownSample. Layout is NHWC (XLA's preferred TPU conv layout); parameters
are float32 with configurable compute dtype. Submodule names are chosen so
that a torch checkpoint key maps onto the flax param path mechanically
(torch ``stage2.part2.0.conv.weight`` -> flax ``stage2/part2_0/conv``); see
utils/torch_convert.py.

Initialisation matches reference yolov4.py:283-294 / darknet.py:174-185:
conv kernels kaiming-normal (fan_out, relu gain), conv biases zero,
BatchNorm scale ~ N(0, 0.01^2), BatchNorm bias zero.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_normal_(mode="fan_out", nonlinearity="relu"):
# std = sqrt(2 / fan_out), untruncated normal.
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch nn.init.normal_(bn.weight, 0, 0.01)
bn_scale_init = nn.initializers.normal(stddev=0.01)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation: x * tanh(softplus(x)) (reference darknet.py:14-20)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=0.1)


ACTIVATIONS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "relu": jax.nn.relu,
    "leaky_relu": leaky_relu,
    "mish": mish,
    "linear": lambda x: x,
}


class ConvBNAct(nn.Module):
    """Conv2d (same padding) + optional BatchNorm + activation
    (reference darknet.py:23-58)."""

    out_ch: int
    kernel_size: int
    stride: int = 1
    bias: bool = False
    bn: bool = True
    act: str = "leaky_relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.act not in ACTIVATIONS:
            raise ValueError(f"{self.act} does not support.")
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            features=self.out_ch,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.bias,
            kernel_init=conv_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,       # == torch BatchNorm2d momentum 0.1
                epsilon=1e-5,       # torch default
                scale_init=bn_scale_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="norm",
            )(x)
        return ACTIVATIONS[self.act](x)


class ResBlock(nn.Module):
    """num_blocks x [1x1 conv, 3x3 conv] with residual adds
    (reference darknet.py:61-81)."""

    ch: int
    num_blocks: int = 1
    shortcut: bool = True
    act: str = "mish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_blocks):
            h = ConvBNAct(self.ch, 1, 1, act=self.act, dtype=self.dtype,
                          name=f"module_list_{i}_0")(x, train)
            h = ConvBNAct(self.ch, 3, 1, act=self.act, dtype=self.dtype,
                          name=f"module_list_{i}_1")(h, train)
            x = x + h if self.shortcut else h
        return x


class CSPDownSample0(nn.Module):
    """First CSP stage with its non-standard split (reference darknet.py:84-113)."""

    out_ch: int
    kernel_size: int = 3
    stride: int = 2
    act: str = "mish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c, k, s, a, d = self.out_ch, self.kernel_size, self.stride, self.act, self.dtype
        x = ConvBNAct(c, k, s, act=a, dtype=d, name="base")(x, train)

        x1 = ConvBNAct(c, 1, 1, act=a, dtype=d, name="part1")(x, train)

        x2_1_1 = ConvBNAct(c, 1, 1, act=a, dtype=d, name="part2_1_1")(x, train)
        x2_1_2 = ConvBNAct(c // 2, 1, 1, act=a, dtype=d, name="part2_1_2_0")(x2_1_1, train)
        x2_1_2 = ConvBNAct(c, 3, 1, act=a, dtype=d, name="part2_1_2_1")(x2_1_2, train)
        x2 = x2_1_1 + x2_1_2
        x2 = ConvBNAct(c, 1, 1, act=a, dtype=d, name="part2_2")(x2, train)

        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBNAct(c, 1, 1, act=a, dtype=d, name="transition")(x, train)


class CSPDownSample(nn.Module):
    """Generic CSP downsampling stage (reference darknet.py:116-138)."""

    out_ch: int
    kernel_size: int = 3
    stride: int = 2
    num_blocks: int = 1
    shortcut: bool = True
    act: str = "mish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c, a, d = self.out_ch, self.act, self.dtype
        x = ConvBNAct(c, self.kernel_size, self.stride, act=a, dtype=d, name="base")(x, train)

        x1 = ConvBNAct(c // 2, 1, 1, act=a, dtype=d, name="part1")(x, train)

        x2 = ConvBNAct(c // 2, 1, 1, act=a, dtype=d, name="part2_0")(x, train)
        x2 = ResBlock(c // 2, num_blocks=self.num_blocks, shortcut=self.shortcut,
                      act=a, dtype=d, name="part2_1")(x2, train)
        x2 = ConvBNAct(c // 2, 1, 1, act=a, dtype=d, name="part2_2")(x2, train)

        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBNAct(c, 1, 1, act=a, dtype=d, name="transition")(x, train)
