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
    """Mish activation: x * tanh(softplus(x)) (reference darknet.py:14-20).

    Computed via the exact algebraic identity
        tanh(ln(u)) = (u^2 - 1) / (u^2 + 1),  u = 1 + e^x
        =>  mish(x) = x * a / (a + 2),        a = e^x (e^x + 2)
    which needs ONE transcendental (exp) instead of three (exp, log1p,
    tanh). Mish dominates the VPU time of the stride-4/8 backbone stages
    (profiled: the 304^2 conv fusions are activation-bound), so this is a
    straight ~2x cut of that cost with float32 agreement to a few ulp.
    For x > 20, a/(a+2) == 1 to ~1e-17 — clamp to avoid exp overflow and
    return x (mish's exact asymptote).
    """
    e = jnp.exp(jnp.minimum(x, 20.0))
    a = e * (e + 2.0)
    return jnp.where(x > 20.0, x, x * a / (a + 2.0))


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=0.1)


ACTIVATIONS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "relu": jax.nn.relu,
    "leaky_relu": leaky_relu,
    "mish": mish,
    "linear": lambda x: x,
}


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c)


def _s2d_stride1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a 3x3 stride-1 kernel [3,3,Ci,Co] into the equivalent
    3x3 kernel [3,3,4Ci,4Co] over space-to-depth inputs/outputs.

    Output pixel (2a+dy, 2b+dx) taps input row 2a+dy+u = 2(a+A)+r with
    A = floor((dy+u)/2), r = (dy+u) mod 2 — a 3-block window in s2d space.
    """
    _, _, cin, cout = w.shape
    out = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            for u in (-1, 0, 1):
                for v in (-1, 0, 1):
                    ay, ry = (dy + u) // 2, (dy + u) % 2
                    ax, rx = (dx + v) // 2, (dx + v) % 2
                    ci = (ry * 2 + rx) * cin
                    co = (dy * 2 + dx) * cout
                    out = out.at[ay + 1, ax + 1, ci:ci + cin,
                                 co:co + cout].set(w[u + 1, v + 1])
    return out


def _s2d_stride2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a 3x3 stride-2 kernel [3,3,Ci,Co] into the equivalent
    2x2 stride-1 kernel [2,2,4Ci,Co] over a space-to-depth input
    (use with padding ((1,0),(1,0))).

    Output pixel i taps input rows 2i+u = 2(i+A)+r, u in {-1,0,1} ->
    blocks {i-1, i}; the (A=-1, r=0) slot (row 2i-2) is never tapped and
    stays zero.
    """
    _, _, cin, cout = w.shape
    out = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for u in (-1, 0, 1):
        for v in (-1, 0, 1):
            ay, ry = u // 2, u % 2   # floor-div: -1 -> (-1, 1)
            ax, rx = v // 2, v % 2
            ci = (ry * 2 + rx) * cin
            out = out.at[ay + 1, ax + 1, ci:ci + cin, :].set(w[u + 1, v + 1])
    return out


def _wpack_1x1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[1,1,Ci,Co] -> [1,1,2Ci,2Co] block-diagonal kernel over W-packed
    tensors (channel s*C+c holds column x=2j+s; see `wpack` in ConvBNAct).

    Lane packing: C=64 stages leave half the VPU's 128 lanes idle on the
    elementwise ops (Mish/BN) and half the MXU's contracting rows on K=64
    dots; packing two image columns fills both. Measured on chip
    (tools/exp_wpack.py, 608/b16 stage1 mix): 0.478x with boundaries
    folded."""
    ci, co = w.shape[-2], w.shape[-1]
    out = jnp.zeros((1, 1, 2 * ci, 2 * co), w.dtype)
    out = out.at[:, :, :ci, :co].set(w)
    out = out.at[:, :, ci:, co:].set(w)
    return out


def _wpack_3x3_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Ci,Co] -> [3,3,2Ci,2Co] over W-packed tensors.

    Output sub s=0 at packed col j taps (packed j-1, sub1)@dx=-1,
    (j, sub0)@dx=0, (j, sub1)@dx=+1; sub s=1 taps (j, sub0)@dx=-1,
    (j, sub1)@dx=0, (j+1, sub0)@dx=+1. 6 of 12 blocks nonzero."""
    _, _, ci, co = w.shape
    out = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for dy in range(3):
        out = out.at[dy, 0, ci:, :co].set(w[dy, 0])
        out = out.at[dy, 1, :ci, :co].set(w[dy, 1])
        out = out.at[dy, 1, ci:, :co].set(w[dy, 2])
        out = out.at[dy, 1, :ci, co:].set(w[dy, 0])
        out = out.at[dy, 1, ci:, co:].set(w[dy, 1])
        out = out.at[dy, 2, :ci, co:].set(w[dy, 2])
    return out


def _wpack_concat2_1x1_kernel(w: jnp.ndarray, ca: int) -> jnp.ndarray:
    """1x1 kernel [1,1,Ca+Cb,Co] consuming concat([A, B], -1) where A and
    B are each W-PACKED: the concat's channel blocks are
    [A_s0, A_s1, B_s0, B_s1] (not canonically packed), so the packed
    kernel routes (A,s) and (B,s) blocks to output sub s."""
    cab, co = w.shape[-2], w.shape[-1]
    cb = cab - ca
    wa, wb = w.reshape(cab, co)[:ca], w.reshape(cab, co)[ca:]
    out = jnp.zeros((1, 1, 2 * cab, 2 * co), w.dtype)
    out = out.at[0, 0, 0:ca, :co].set(wa)                      # A s0 -> s0
    out = out.at[0, 0, ca:2 * ca, co:].set(wa)                 # A s1 -> s1
    out = out.at[0, 0, 2 * ca:2 * ca + cb, :co].set(wb)        # B s0 -> s0
    out = out.at[0, 0, 2 * ca + cb:, co:].set(wb)              # B s1 -> s1
    return out


def _wpack_entry_s2d_kernel(w2: jnp.ndarray) -> jnp.ndarray:
    """[2,2,Ci,Co] s2d stride-2 kernel (from _s2d_stride2_kernel) ->
    [2,3,Ci,2Co], stride (1,2), pad ((1,0),(1,1)): same conv but the
    output comes out W-PACKED. Packed col j sub0 = orig out x=2j (s2d-W
    taps {2j-1,2j}), sub1 = x=2j+1 (taps {2j,2j+1})."""
    kh, _, ci, co = w2.shape
    out = jnp.zeros((kh, 3, ci, 2 * co), w2.dtype)
    out = out.at[:, 0, :, :co].set(w2[:, 0])
    out = out.at[:, 1, :, :co].set(w2[:, 1])
    out = out.at[:, 1, :, co:].set(w2[:, 0])
    out = out.at[:, 2, :, co:].set(w2[:, 1])
    return out


def _wpack_s2_w2w_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Ci,Co] stride-2 kernel -> [3,3,2Ci,2Co] over W-PACKED input
    producing W-PACKED output, stride (2,2), pad ((1,1),(1,1)): both
    spatial dims halve and the result stays packed (stage-N base conv
    when stage N-1 and stage N both run packed).

    Out packed col j sub0 = orig x'=2j, tapping orig {4j-1,4j,4j+1} =
    packed (2j-1,s1), (2j,s0), (2j,s1); sub1 = orig x'=2j+1, tapping
    {4j+1,4j+2,4j+3} = packed (2j,s1), (2j+1,s0), (2j+1,s1). With the
    3-wide stride-2 window over packed cols {2j-1, 2j, 2j+1}, 6 of 12
    blocks are nonzero."""
    _, _, ci, co = w.shape
    out = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for dy in range(3):
        out = out.at[dy, 0, ci:, :co].set(w[dy, 0])
        out = out.at[dy, 1, :ci, :co].set(w[dy, 1])
        out = out.at[dy, 1, ci:, :co].set(w[dy, 2])
        out = out.at[dy, 1, ci:, co:].set(w[dy, 0])
        out = out.at[dy, 2, :ci, co:].set(w[dy, 1])
        out = out.at[dy, 2, ci:, co:].set(w[dy, 2])
    return out


def _wpack_exit_s2_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Ci,Co] stride-2 kernel -> [3,2,2Ci,Co] over W-PACKED input,
    stride (2,1), pad ((1,1),(1,0)): plain (unpacked) stride-2 output.
    Out col x' taps orig {2x'-1, 2x', 2x'+1} = packed (x'-1,s1), (x',s0),
    (x',s1)."""
    _, _, ci, co = w.shape
    out = jnp.zeros((3, 2, 2 * ci, co), w.dtype)
    for dy in range(3):
        out = out.at[dy, 0, ci:, :].set(w[dy, 0])
        out = out.at[dy, 1, :ci, :].set(w[dy, 1])
        out = out.at[dy, 1, ci:, :].set(w[dy, 2])
    return out


class _ConvKernel(nn.Module):
    """Bare conv kernel parameter, path-compatible with nn.Conv
    (name='conv' -> params 'conv/kernel', same shape and init)."""

    shape: tuple

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", conv_kernel_init, self.shape, jnp.float32)


class _ConvKernelBias(nn.Module):
    """Bare conv kernel + bias parameters, path-compatible with a biased
    nn.Conv (name='conv' -> params 'conv/kernel' + 'conv/bias', same
    shapes and inits). Used by paths that rearrange or slice the weights
    at trace time instead of calling nn.Conv."""

    shape: tuple

    @nn.compact
    def __call__(self) -> tuple:
        kernel = self.param("kernel", conv_kernel_init, self.shape,
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                          jnp.float32)
        return kernel, bias


class _TiledBN(nn.Module):
    """BatchNorm over a space-to-depth-tiled channel axis: the input's
    4*ch channels are (phase, c) views of a full-resolution ch-channel
    map, so per-c statistics reduce over (batch, space, PHASE) — exactly
    the element sets the full-res BatchNorm reduces over. Params and
    batch_stats are [ch], path-compatible with nn.BatchNorm (norm/scale,
    norm/bias, batch_stats norm/{mean,var}), so checkpoints are unaffected.
    Matches flax BatchNorm numerics: f32 stats, biased variance,
    ra = momentum*ra + (1-momentum)*batch."""

    ch: int
    phases: int = 4
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    bn_axis: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param("scale", bn_scale_init, (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.ch, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.ch, jnp.float32))
        if train:
            xr = x.reshape(x.shape[:-1] + (self.phases, self.ch)
                           ).astype(jnp.float32)
            axes = tuple(range(xr.ndim - 1))
            mean = jnp.mean(xr, axis=axes)
            mean2 = jnp.mean(jnp.square(xr), axis=axes)
            if self.bn_axis is not None:  # SyncBN
                mean = jax.lax.pmean(mean, self.bn_axis)
                mean2 = jax.lax.pmean(mean2, self.bn_axis)
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mt = jnp.tile(mean, self.phases).astype(self.dtype)
        st = (jnp.tile(scale, self.phases)
              * jax.lax.rsqrt(jnp.tile(var, self.phases) + self.epsilon)
              ).astype(self.dtype)
        bt = jnp.tile(bias, self.phases).astype(self.dtype)
        return (x.astype(self.dtype) - mt) * st + bt


def _quant_weights_folded(wf):
    """Per-output-channel int8 quantization of an (already BN-folded)
    kernel in its FINAL conv layout — original or wpack/s2d-rearranged
    (rearranged blocks are copies of original-channel taps, so the
    per-channel abs-max scales equal the original ones tiled, and the
    integer conv stays bit-identical to the unpacked one):
    (wq int8 wf.shape, sw f32 [co])."""
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
    return jnp.round(wf / sw).astype(jnp.int8), sw


def _quant_state(mdl, qmode, x, wf):
    """Quant-collection plumbing shared by the int8 conv layers.

    ``wf``: BN-folded f32 kernel in its final conv layout. Returns
    (wq, sw, amax): the int8 kernel + per-out-channel scales — from the
    "quant" collection when it exists (int8_static / calibration), else
    computed on the fly — and the calibrated activation abs-max (None in
    dynamic mode). When the collection is mutable (a calibration pass)
    the running activation abs-max and the pre-quantized weights are
    recorded, so the static serving program never touches the f32
    kernels again."""
    recording = (mdl.is_mutable_collection("quant")
                 and not mdl.is_initializing())
    amax = None
    if qmode == "int8_static" or recording:
        var = mdl.variable("quant", "amax",
                           lambda: jnp.zeros((), jnp.float32))
        vwq = mdl.variable("quant", "wq",
                           lambda: jnp.zeros(wf.shape, jnp.int8))
        vsw = mdl.variable("quant", "sw",
                           lambda: jnp.ones((wf.shape[-1],), jnp.float32))
        if recording:
            var.value = jnp.maximum(
                var.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            vwq.value, vsw.value = _quant_weights_folded(wf)
        elif qmode == "int8_static":
            amax = var.value
        wq, sw = vwq.value, vsw.value
    else:
        wq, sw = _quant_weights_folded(wf)
    return wq, sw, amax


def _quant_conv(x, wq, sw, bn_bias, strides, padding, out_dtype, amax=None):
    """Eval-only int8 conv: BN folded into the pre-quantized kernel
    (``_quant_weights_folded``), activations per-tensor, the conv run
    s8 x s8 -> s32 on the MXU, then dequantized + biased in f32.

    ``amax``: the activation scale source. None computes the abs-max of x
    on the fly (dynamic — always safe, but the global reduction forces the
    input to materialize and costs an extra pass); a scalar array uses
    that CALIBRATED value instead (static — values beyond it clip to
    +-127, the standard post-training-quantization contract).

    v5e int8 MACs run at 2x bf16; measured on chip (tools/exp_int8.py) the
    whole quantize->conv->dequantize chain is 0.24-0.64x the bf16 conv at
    every MXU- or HBM-bound shape in this model (the chained int8 tensors
    also halve HBM bytes). Accumulator safety: |sum| <=
    9*2048*127^2 ~ 3e8 < 2^31 for every conv here.
    """
    if isinstance(x, QTensor):
        # chained input (int8_static link quantization): the producer (or
        # its stage module) already quantized this tensor with the
        # calibrated link scale — same scale value, same arithmetic as the
        # consumer-side quantize would use, so outputs stay BIT-IDENTICAL
        # to the unchained program; the bf16 intermediate and the separate
        # quantize pass just never exist.
        xq, sx = x.q, x.scale
    else:
        xf = x.astype(jnp.float32)
        if amax is None:
            amax = jnp.max(jnp.abs(xf))
        sx = jnp.maximum(amax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw) + bn_bias).astype(out_dtype)


class QTensor:
    """A quantized activation: ``q`` int8, ``scale`` f32 scalar —
    ``q * scale`` approximates the bf16 value. Flows between int8_static
    layers when link chaining is active (``_link_quant``)."""

    __slots__ = ("q", "scale")

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale

    @property
    def shape(self):
        return self.q.shape


def _link_quant(mdl, name, x, active):
    """Parent-side link quantization for int8_static chaining.

    Declares a "quant"-collection running abs-max for a link tensor (a
    quantized conv's input that this module produces or assembles).
    During a calibration pass (mutable "quant") it records the abs-max
    and returns ``x`` unchanged — the calibration program runs UNCHAINED,
    so every downstream recording sees exactly the activations the
    unchained serving program would. At static serving it returns
    ``QTensor(x)`` quantized with the calibrated scale: the consumer conv
    skips its own activation quantize (bit-identical arithmetic — same
    tensor, same recorded scale), XLA fuses the quantize into the
    producing epilogue, and the bf16 intermediate never round-trips HBM.

    For concat links pass the PARTS via ``_link_quant_concat``: quantizing
    each branch with the shared concat scale before an s8 concat is
    elementwise-identical to quantizing the bf16 concat.
    """
    if not active:
        return x
    recording = (mdl.is_mutable_collection("quant")
                 and not mdl.is_initializing())
    var = mdl.variable("quant", name, lambda: jnp.zeros((), jnp.float32))
    if recording:
        var.value = jnp.maximum(
            var.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        return x
    sx = jnp.maximum(var.value, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                 -127, 127).astype(jnp.int8)
    return QTensor(q, sx)


def _link_quant_concat(mdl, name, parts, active):
    """Concat-link chaining: record the scale on the CONCAT during
    calibration, quantize each branch with that shared scale and concat
    in s8 at serving (the concat then moves half the bytes and each
    branch's quantize fuses into its producer's epilogue)."""
    if not active:
        return jnp.concatenate(parts, axis=-1)
    recording = (mdl.is_mutable_collection("quant")
                 and not mdl.is_initializing())
    var = mdl.variable("quant", name, lambda: jnp.zeros((), jnp.float32))
    if recording:
        cat = jnp.concatenate(parts, axis=-1)
        var.value = jnp.maximum(
            var.value, jnp.max(jnp.abs(cat.astype(jnp.float32))))
        return cat
    sx = jnp.maximum(var.value, 1e-12) / 127.0
    qs = [jnp.clip(jnp.round(p.astype(jnp.float32) / sx),
                   -127, 127).astype(jnp.int8) for p in parts]
    return QTensor(jnp.concatenate(qs, axis=-1), sx)


def _qmode(quant):
    """Normalize the MODEL.QUANT value: config booleans map onto the two
    canonical modes ("none"/"int8"); strings pass through. ONE copy of
    this mapping — adding a mode must not depend on per-site .get()
    defaults silently swallowing it."""
    return {False: "none", True: "int8"}.get(quant, quant)


def _chain_active(quant, quant_chain, train):
    """True when int8_static link chaining applies — the one predicate
    every ``_link_quant`` call site gates on (eval-only, static mode,
    MODEL.QUANT_CHAIN enabled)."""
    qmode = _qmode(quant)
    return bool(quant_chain) and qmode == "int8_static" and not train


class ConvBNAct(nn.Module):
    """Conv2d (same padding) + optional BatchNorm + activation
    (reference darknet.py:23-58).

    ``s2d`` selects a mathematically equivalent space-to-depth lowering for
    the early low-channel convs, where cin < 128 leaves most of the MXU's
    contracting rows idle (a 3-channel stem conv uses ~2% of the systolic
    array). Parameters are identical in path, shape, and init — the kernel
    is rearranged on the fly — so checkpoints are unaffected:

      * "stride1": S2D -> 3x3 conv (4Ci -> 4Co) -> D2S. Standalone.
      * "stride2": S2D -> 2x2 stride-1 conv (4Ci -> Co), pad (1,0). For
        3x3 stride-2 downsample convs; output needs no D2S.
      * "stride1_keep": like "stride1" but the OUTPUT STAYS in s2d layout
        (phase-major channels); BatchNorm runs tiled (_TiledBN, exact).
        Profiling showed the standalone modes' D2S/S2D reshuffle copies
        (~380 MB each at 608^2) eating the MXU gain — keeping the layout
        through BN+act into a following "stride2_pre" conv removes them.
      * "stride2_pre": like "stride2" but the input is ALREADY in s2d
        layout (a "stride1_keep" producer's output).

    Odd spatial sizes fall back to the standard conv with the same params
    (standalone modes only; the keep/pre pair requires even dims, which
    the model's multiple-of-32 input contract guarantees).
    """

    out_ch: int
    kernel_size: int
    stride: int = 1
    bias: bool = False
    bn: bool = True
    act: str = "leaky_relu"
    dtype: Any = jnp.float32
    s2d: str = "none"
    # cross-replica BatchNorm stats (SyncBN): the shard_map axis name to
    # pmean batch mean/var over, or None for per-replica stats (the
    # reference's YOLO trainer behavior; its darknet pretrainer applies
    # apex SyncBN, darknet/main_amp.py:147-150)
    bn_axis: Any = None
    # int8 serving quantization (MODEL.QUANT, eval only): "none" | "int8"
    # (dynamic per-tensor activation scales) | "int8_static" (calibrated
    # scales from the "quant" variable collection — record them by
    # applying with mutable=["quant"] on representative data). See
    # _quant_conv. Applies to plain bias-free conv+BN layers; train mode,
    # s2d/wpack-lowered convs, and the biased output convs keep bf16.
    quant: Any = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 input_s2d: bool = False) -> jnp.ndarray:
        """input_s2d: the input already arrives in the space-to-depth wire
        layout [B, H/2, W/2, 4*Ci] (host-packed; native.pack_s2d_u8) —
        only valid for the "stride1_keep" stem mode, where it skips the
        in-program space_to_depth and its relayout copies."""
        if self.act not in ACTIVATIONS:
            raise ValueError(f"{self.act} does not support.")
        assert not input_s2d or self.s2d == "stride1_keep", \
            "input_s2d requires the stride1_keep stem"
        pad = (self.kernel_size - 1) // 2
        qmode = _qmode(self.quant)
        chained = isinstance(x, QTensor)
        if (qmode != "none" and not train and self.s2d == "stride1_keep"
                and not chained and x.dtype == jnp.uint8
                and self.bn and not self.bias):
            # Direct-u8 int8 stem: consume the uint8 wire bytes as SHIFTED
            # s8 activations (x_s8 = x_u8 - 128; the conv's zero padding in
            # image space becomes -128 in the shifted domain), fold the
            # /255 normalization into the dequant scale and the shift into
            # an integer correction (128 * sum(wq) per out channel):
            #   conv(x_u8/255, wq*sw) = (sw/255)*(conv(x_s8, wq) + 128*csum)
            # — an EXACT integer identity, so the whole normalize pass
            # (uint8->f32 convert + div, ~1.7 ms/batch at 608/b16 in the
            # serving trace) vanishes and activation quantization adds NO
            # error at all (uint8 pixels are exact 8-bit values); weight
            # quantization is the only approximation, as in every other
            # int8 layer. BN folds into the original kernel before the s2d
            # rearrangement (rearranged blocks are copies of original-
            # channel taps, so per-packed-channel scales are the original
            # ones tiled — the same property the wpack quant path uses).
            kernel = _ConvKernel((3, 3, 3, self.out_ch), name="conv")()
            s, b = _BNFold(self.out_ch, name="norm")()
            wf = _s2d_stride1_kernel(kernel * s)
            wq, sw, _ = _quant_state(self, qmode, x, wf)  # u8 needs no amax
            csum = jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2))
            if not input_s2d:
                x = space_to_depth(x)
            xs = (x.astype(jnp.int16) - 128).astype(jnp.int8)
            xs = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         constant_values=-128)
            y = jax.lax.conv_general_dilated(
                xs, wq, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            out = ((y + 128 * csum).astype(jnp.float32) * (sw / 255.0)
                   + jnp.tile(b, 4)).astype(self.dtype)
            return ACTIVATIONS[self.act](out)
        if not chained and x.dtype == jnp.uint8:
            # uint8 reached a non-quantized path (e.g. a float-input
            # fallback): normalize here so behavior matches a pre-divided
            # input regardless of who packed the wire
            x = x.astype(jnp.float32) / 255.0
        if (qmode != "none" and not train and self.bn and not self.bias
                and self.s2d in ("stride2", "stride2_pre",
                                 "stride2_pre_wpack", "stride2_wpack",
                                 "stride2_from_wpack", "stride2_w2w")
                and not (self.s2d == "stride2"
                         and (x.shape[1] % 2 or x.shape[2] % 2))):
            # same validity contract as the bf16 s2d lowering below — a
            # misconfiguration must crash here too, not silently declare a
            # wrong-shaped kernel in quantized eval
            assert self.kernel_size == 3, \
                "s2d lowering supports bias-free 3x3 convs"
            assert (self.s2d, self.stride) in (
                ("stride2", 2), ("stride2_pre", 2), ("stride2_pre_wpack", 2),
                ("stride2_wpack", 2), ("stride2_from_wpack", 2),
                ("stride2_w2w", 2))
            # Quantized strided base convs (the s2d/wpack rearranged-kernel
            # forms): BN folds into the ORIGINAL kernel, then the same
            # trace-time rearrangement as the bf16 path runs on the folded
            # kernel. Every rearranged tap is a copy of an original-channel
            # tap, so per-final-out-channel abs-max scales equal the
            # original ones tiled and the zero blocks are exact in integer
            # accumulation — the same property the _WPackConvBN quant path
            # uses (packed int8 == unpacked int8 bitwise).
            cin = (x.shape[-1] // 4
                   if self.s2d in ("stride2_pre", "stride2_pre_wpack")
                   else x.shape[-1] // 2
                   if self.s2d in ("stride2_from_wpack", "stride2_w2w")
                   else x.shape[-1])
            kernel = _ConvKernel((3, 3, cin, self.out_ch), name="conv")()
            s, b = _BNFold(self.out_ch, name="norm")()
            rearrange, strides, padding, tile = {
                "stride2": (_s2d_stride2_kernel, (1, 1),
                            [(1, 0), (1, 0)], 1),
                "stride2_pre": (_s2d_stride2_kernel, (1, 1),
                                [(1, 0), (1, 0)], 1),
                "stride2_pre_wpack": (
                    lambda kk: _wpack_entry_s2d_kernel(
                        _s2d_stride2_kernel(kk)),
                    (1, 2), [(1, 0), (1, 1)], 2),
                "stride2_wpack": (
                    lambda kk: _wpack_entry_s2d_kernel(
                        _s2d_stride2_kernel(kk)),
                    (1, 2), [(1, 0), (1, 1)], 2),
                "stride2_from_wpack": (
                    _wpack_exit_s2_kernel, (2, 1), [(1, 1), (1, 0)], 1),
                "stride2_w2w": (
                    _wpack_s2_w2w_kernel, (2, 2), [(1, 1), (1, 1)], 2),
            }[self.s2d]
            if self.s2d in ("stride2", "stride2_wpack"):
                x = (QTensor(space_to_depth(x.q), x.scale) if chained
                     else space_to_depth(x))
            wf = rearrange(kernel * s)
            wq, sw, amax = _quant_state(self, qmode, x, wf)
            x = _quant_conv(x, wq, sw,
                            b if tile == 1 else jnp.tile(b, tile),
                            strides, padding, self.dtype, amax=amax)
            return ACTIVATIONS[self.act](x)
        if (qmode != "none" and not train and self.s2d == "none"
                and self.bn and not self.bias):
            kshape = (self.kernel_size, self.kernel_size, x.shape[-1],
                      self.out_ch)
            kernel = _ConvKernel(kshape, name="conv")()
            s, b = _BNFold(self.out_ch, name="norm")()
            # calibration/static state in the "quant" collection: the
            # activation scale (running abs-max) and the PRE-QUANTIZED
            # weights. Recorded when the collection is mutable (a
            # calibration pass); consumed instead of the dynamic abs-max /
            # per-call weight requantization in "int8_static" mode — the
            # serving program then never touches the f32 kernels (~256 MB
            # of reads + fold/round work per forward across the model).
            # The variables only exist for static mode / calibration, so
            # plain "int8" variables carry no extra collection.
            wq, sw, amax = _quant_state(self, qmode, x, kernel * s)
            x = _quant_conv(x, wq, sw, b, (self.stride, self.stride),
                            [(pad, pad), (pad, pad)], self.dtype, amax=amax)
            return ACTIVATIONS[self.act](x)
        if isinstance(x, QTensor):
            # A chained producer quantized this input but no int8 branch
            # above accepted it (e.g. the odd-size "stride2" guard, or a
            # config combination that chains into a bf16-only form):
            # dequantize and continue on the float path. q*scale is
            # exactly the value the int8 consumer would have computed
            # with, so accuracy matches the chained program — only the
            # MXU saving is lost for this one conv.
            x = x.q.astype(jnp.float32) * x.scale
        if self.s2d == "none":
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
        else:
            assert self.kernel_size == 3 and not self.bias, \
                "s2d lowering supports bias-free 3x3 convs"
            assert (self.s2d, self.stride) in (
                ("stride1", 1), ("stride2", 2),
                ("stride1_keep", 1), ("stride2_pre", 2),
                ("stride2_pre_wpack", 2), ("stride2_wpack", 2),
                ("stride2_from_wpack", 2), ("stride2_w2w", 2))
            cin = (x.shape[-1] // 4
                   if input_s2d
                   or self.s2d in ("stride2_pre", "stride2_pre_wpack")
                   else x.shape[-1] // 2
                   if self.s2d in ("stride2_from_wpack", "stride2_w2w")
                   else x.shape[-1])
            kernel = _ConvKernel((3, 3, cin, self.out_ch), name="conv")()
            x = x.astype(self.dtype)
            dn = ("NHWC", "HWIO", "NHWC")
            if self.s2d in ("stride1", "stride2") and (
                    x.shape[1] % 2 or x.shape[2] % 2):
                # odd input: standard conv with the same params
                x = jax.lax.conv_general_dilated(
                    x, kernel.astype(self.dtype), (self.stride, self.stride),
                    [(pad, pad), (pad, pad)], dimension_numbers=dn)
            elif self.s2d in ("stride1", "stride1_keep"):
                w = _s2d_stride1_kernel(kernel).astype(self.dtype)
                x = jax.lax.conv_general_dilated(
                    x if input_s2d else space_to_depth(x), w, (1, 1),
                    [(1, 1), (1, 1)], dimension_numbers=dn)
                if self.s2d == "stride1":
                    x = depth_to_space(x)
            elif self.s2d in ("stride2_pre_wpack", "stride2_wpack"):
                # stride-2 downsample emitting W-PACKED output (lane
                # packing; see _wpack_1x1_kernel). Input is the s2d stem
                # layout ("pre") or plain (packed via space_to_depth).
                w = _wpack_entry_s2d_kernel(
                    _s2d_stride2_kernel(kernel)).astype(self.dtype)
                if self.s2d == "stride2_wpack":
                    x = space_to_depth(x)
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 2), [(1, 0), (1, 1)], dimension_numbers=dn)
            elif self.s2d == "stride2_from_wpack":
                # stride-2 downsample CONSUMING W-packed input, plain out
                w = _wpack_exit_s2_kernel(kernel).astype(self.dtype)
                x = jax.lax.conv_general_dilated(
                    x, w, (2, 1), [(1, 1), (1, 0)], dimension_numbers=dn)
            elif self.s2d == "stride2_w2w":
                # stride-2 downsample, W-packed in -> W-packed out (both
                # this stage and the previous one run lane-packed)
                w = _wpack_s2_w2w_kernel(kernel).astype(self.dtype)
                x = jax.lax.conv_general_dilated(
                    x, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn)
            else:
                w = _s2d_stride2_kernel(kernel).astype(self.dtype)
                if self.s2d == "stride2":
                    x = space_to_depth(x)
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 0), (1, 0)], dimension_numbers=dn)
        if self.bn and self.s2d == "stride1_keep":
            x = _TiledBN(self.out_ch, phases=4, dtype=self.dtype,
                         bn_axis=self.bn_axis, name="norm")(x, train)
        elif self.bn and self.s2d in ("stride2_pre_wpack", "stride2_wpack",
                                      "stride2_w2w"):
            x = _TiledBN(self.out_ch, phases=2, dtype=self.dtype,
                         bn_axis=self.bn_axis, name="norm")(x, train)
        elif self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,       # == torch BatchNorm2d momentum 0.1
                epsilon=1e-5,       # torch default
                scale_init=bn_scale_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.bn_axis,
                name="norm",
            )(x)
        return ACTIVATIONS[self.act](x)


class _WPackConvBN(nn.Module):
    """Conv+BN+act over W-PACKED tensors (lane packing; see
    _wpack_1x1_kernel). Parameters are declared in the ORIGINAL shapes and
    paths (conv/kernel [k,k,Ci,Co], norm/* [Co] — identical tree to a
    plain ConvBNAct), and the kernel is rearranged at trace time; BN runs
    tiled over the two column phases (_TiledBN, exact). ``concat_ca``:
    the input is concat([A, B], -1) of two packed tensors and the 1x1
    kernel's first concat_ca input channels belong to A."""

    cin: int
    cout: int
    ksize: int = 1
    act: str = "mish"
    dtype: Any = jnp.float32
    bn_axis: Any = None
    concat_ca: int = 0
    # int8 serving quantization (eval only; "none" | "int8" |
    # "int8_static", see ConvBNAct). BN folds into the ORIGINAL kernel
    # before rearrangement, so per-packed-channel weight scales equal the
    # original per-channel scales tiled, the integer accumulation is
    # exact over the extra zero blocks, and packed int8 outputs are
    # BIT-IDENTICAL to unpacked int8 (pinned by tests/test_quant.py).
    # Measured (tools/exp_int8.py): packed 1x1 int8 chains run 0.24x
    # bf16 at the stage1 shape, packed 3x3 0.46x.
    quant: Any = "none"

    def _rearrange(self, w: jnp.ndarray) -> jnp.ndarray:
        if self.concat_ca:
            return _wpack_concat2_1x1_kernel(w, self.concat_ca)
        if self.ksize == 1:
            return _wpack_1x1_kernel(w)
        return _wpack_3x3_kernel(w)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.ksize - 1) // 2
        qmode = _qmode(self.quant)
        if qmode != "none" and not train:
            kernel = _ConvKernel((self.ksize, self.ksize, self.cin,
                                  self.cout), name="conv")()
            s, b = _BNFold(self.cout, name="norm")()  # _TiledBN path twin
            wp = self._rearrange(kernel * s)          # fold, THEN pack
            wq, sw, amax = _quant_state(self, qmode, x, wp)
            x = _quant_conv(x, wq, sw, jnp.tile(b, 2), (1, 1),
                            [(pad, pad), (pad, pad)], self.dtype, amax=amax)
            return ACTIVATIONS[self.act](x)
        kernel = _ConvKernel((self.ksize, self.ksize, self.cin, self.cout),
                             name="conv")()
        w = self._rearrange(kernel)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = _TiledBN(self.cout, phases=2, dtype=self.dtype,
                     bn_axis=self.bn_axis, name="norm")(x, train)
        return ACTIVATIONS[self.act](x)


class _WPackResBlock(nn.Module):
    """ResBlock over W-PACKED tensors (parameter paths identical to
    ResBlock: module_list_{i}_0 1x1 + module_list_{i}_1 3x3 with residual
    adds — elementwise ops are layout-agnostic)."""

    ch: int
    num_blocks: int = 1
    shortcut: bool = True
    act: str = "mish"
    dtype: Any = jnp.float32
    bn_axis: Any = None
    quant: Any = "none"  # see _WPackConvBN
    quant_chain: bool = True  # int8_static link chaining (_link_quant)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        chain = _chain_active(self.quant, self.quant_chain, train)
        for i in range(self.num_blocks):
            h = _WPackConvBN(self.ch, self.ch, 1, act=self.act,
                             dtype=self.dtype, bn_axis=self.bn_axis,
                             quant=self.quant,
                             name=f"module_list_{i}_0")(x, train)
            h = _WPackConvBN(self.ch, self.ch, 3, act=self.act,
                             dtype=self.dtype, bn_axis=self.bn_axis,
                             quant=self.quant,
                             name=f"module_list_{i}_1")(
                                 _link_quant(self, f"link_{i}", h, chain),
                                 train)
            x = x + h if self.shortcut else h
        return x


class _BNFold(nn.Module):
    """Declares nn.BatchNorm-compatible parameters/statistics (params
    norm/scale + norm/bias, batch_stats norm/mean + norm/var — same
    shapes, inits, and paths) and returns the EVAL-time per-channel
    affine (scale, bias) they fold to. Used by the fused Pallas stage
    path, which needs the folded values rather than a BN application."""

    ch: int

    @nn.compact
    def __call__(self) -> tuple:
        scale = self.param("scale", bn_scale_init, (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,),
                          jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.ch, jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.ch, jnp.float32))
        s = scale * jax.lax.rsqrt(var.value + 1e-5)
        return s, bias - mean.value * s


class FoldedConvBN(nn.Module):
    """Parameter-path twin of a bias-free ConvBNAct: declares the same
    conv/kernel + norm/* tree but returns the BN-FOLDED conv kernel and
    bias instead of applying anything — the fused Pallas CSP stage
    (ops/csp_pallas.py) consumes these. Checkpoints are shared with the
    plain path byte-for-byte."""

    cin: int
    cout: int
    ksize: int = 1

    @nn.compact
    def __call__(self) -> tuple:
        kernel = _ConvKernel((self.ksize, self.ksize, self.cin, self.cout),
                             name="conv")()
        s, b = _BNFold(self.cout, name="norm")()
        return kernel * s, b


class _FoldedResBlock(nn.Module):
    """Folded params of a ResBlock's conv pairs (paths module_list_{i}_0/1,
    matching ResBlock)."""

    ch: int
    num_blocks: int

    @nn.compact
    def __call__(self) -> list:
        out = []
        for i in range(self.num_blocks):
            out.append(FoldedConvBN(self.ch, self.ch, 1,
                                    name=f"module_list_{i}_0")())
            out.append(FoldedConvBN(self.ch, self.ch, 3,
                                    name=f"module_list_{i}_1")())
        return out


class ResBlock(nn.Module):
    """num_blocks x [1x1 conv, 3x3 conv] with residual adds
    (reference darknet.py:61-81)."""

    ch: int
    num_blocks: int = 1
    shortcut: bool = True
    act: str = "mish"
    dtype: Any = jnp.float32
    bn_axis: Any = None
    quant: Any = "none"  # "none" | "int8" | "int8_static" (see ConvBNAct)
    quant_chain: bool = True  # int8_static link chaining (_link_quant)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        chain = _chain_active(self.quant, self.quant_chain, train)
        for i in range(self.num_blocks):
            h = ConvBNAct(self.ch, 1, 1, act=self.act, dtype=self.dtype,
                          bn_axis=self.bn_axis, quant=self.quant,
                          name=f"module_list_{i}_0")(x, train)
            h = ConvBNAct(self.ch, 3, 1, act=self.act, dtype=self.dtype,
                          bn_axis=self.bn_axis, quant=self.quant,
                          name=f"module_list_{i}_1")(
                              _link_quant(self, f"link_{i}", h, chain), train)
            x = x + h if self.shortcut else h
        return x


class CSPDownSample0(nn.Module):
    """First CSP stage with its non-standard split (reference darknet.py:84-113)."""

    out_ch: int
    kernel_size: int = 3
    stride: int = 2
    act: str = "mish"
    dtype: Any = jnp.float32
    s2d_base: str = "none"  # "none" | "stride2" | "stride2_pre"
    bn_axis: Any = None
    # eval-only fused Pallas stage body (ops/csp_pallas.py): one kernel for
    # the whole post-base-conv subgraph, BN folded. Param tree unchanged.
    fused: bool = False
    # lane packing: run the whole stage W-PACKED ([.., W/2, 2C]) — the base
    # conv emits packed layout, every interior conv uses a rearranged
    # kernel, BN is column-phase-tiled (exact), and the OUTPUT STAYS
    # PACKED for the next stage's base conv (s2d="stride2_from_wpack").
    # Mathematically equivalent, checkpoint-compatible. Measured 0.478x
    # the plain stage mix at 608/b16 (tools/exp_wpack.py).
    wpack: bool = False
    # int8 serving quantization of the stage's convs (eval only; "none" |
    # "int8" | "int8_static" — see ConvBNAct/_WPackConvBN). Reaches this
    # stage only with MODEL.QUANT_SPAN "full".
    quant: Any = "none"
    # int8_static link chaining (_link_quant): parent-side quantization of
    # conv inputs this module assembles, bit-identical to the unchained
    # program. MODEL.QUANT_CHAIN=false disables (A/B knob).
    quant_chain: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c, k, s, a, d = self.out_ch, self.kernel_size, self.stride, self.act, self.dtype
        bx = self.bn_axis
        q = self.quant
        chain = _chain_active(q, self.quant_chain, train)
        if self.wpack:
            assert self.s2d_base in ("stride2_pre_wpack", "stride2_wpack")
            x = ConvBNAct(c, k, s, act=a, dtype=d, name="base", bn_axis=bx,
                          s2d=self.s2d_base, quant=q)(x, train)  # -> packed
            x = _link_quant(self, "link_base", x, chain)
            x1 = _WPackConvBN(c, c, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                              name="part1")(x, train)
            x2a = _WPackConvBN(c, c, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                               name="part2_1_1")(x, train)
            h = _WPackConvBN(c, c // 2, 1, act=a, dtype=d, bn_axis=bx,
                             quant=q, name="part2_1_2_0")(x2a, train)
            h = _WPackConvBN(c // 2, c, 3, act=a, dtype=d, bn_axis=bx,
                             quant=q, name="part2_1_2_1")(
                                 _link_quant(self, "link_r0", h, chain),
                                 train)
            x2 = x2a + h
            x2 = _WPackConvBN(c, c, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                              name="part2_2")(
                                  _link_quant(self, "link_p22", x2, chain),
                                  train)
            cat = _link_quant_concat(self, "link_cat", [x2, x1], chain)
            return _WPackConvBN(2 * c, c, 1, act=a, dtype=d, bn_axis=bx,
                                quant=q, concat_ca=c,
                                name="transition")(cat, train)

        x = ConvBNAct(c, k, s, act=a, dtype=d, name="base", bn_axis=bx,
                      s2d=self.s2d_base, quant=q)(x, train)

        from yolov4_tpu.ops.csp_pallas import (fused_csp_stage,
                                               fused_csp_supported)
        quant_on = _qmode(q) != "none"
        if (self.fused and not train and self.act == "mish"
                and not quant_on
                and fused_csp_supported(x.shape, 0, dtype=x.dtype)):
            folded = {
                "part1": FoldedConvBN(c, c, 1, name="part1")(),
                "part2_1_1": FoldedConvBN(c, c, 1, name="part2_1_1")(),
                "part2_1_2_0": FoldedConvBN(c, c // 2, 1,
                                            name="part2_1_2_0")(),
                "part2_1_2_1": FoldedConvBN(c // 2, c, 3,
                                            name="part2_1_2_1")(),
                "part2_2": FoldedConvBN(c, c, 1, name="part2_2")(),
                "transition": FoldedConvBN(2 * c, c, 1, name="transition")(),
            }
            return fused_csp_stage(
                x, folded, num_blocks=0,
                interpret=jax.default_backend() != "tpu")

        x = _link_quant(self, "link_base", x, chain)
        x1 = ConvBNAct(c, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                       name="part1")(x, train)

        x2_1_1 = ConvBNAct(c, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                           name="part2_1_1")(x, train)
        x2_1_2 = ConvBNAct(c // 2, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                           name="part2_1_2_0")(x2_1_1, train)
        x2_1_2 = ConvBNAct(c, 3, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                           name="part2_1_2_1")(
                               _link_quant(self, "link_r0", x2_1_2, chain),
                               train)
        x2 = x2_1_1 + x2_1_2
        x2 = ConvBNAct(c, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                       name="part2_2")(
                           _link_quant(self, "link_p22", x2, chain), train)

        x = _link_quant_concat(self, "link_cat", [x2, x1], chain)
        return ConvBNAct(c, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                         name="transition")(x, train)


class CSPDownSample(nn.Module):
    """Generic CSP downsampling stage (reference darknet.py:116-138)."""

    out_ch: int
    kernel_size: int = 3
    stride: int = 2
    num_blocks: int = 1
    shortcut: bool = True
    act: str = "mish"
    dtype: Any = jnp.float32
    s2d_base: str = "none"  # "none" | "stride2" | "stride2_pre"
    bn_axis: Any = None
    fused: bool = False  # eval-only fused Pallas stage body (see CSPDownSample0)
    # lane packing (see CSPDownSample0.wpack): base conv consumes the
    # previous stage's W-PACKED output and emits packed ("stride2_w2w");
    # the whole stage body runs packed and the OUTPUT STAYS PACKED for
    # the next stage's "stride2_from_wpack" (or another packed stage).
    wpack: bool = False
    # int8 serving quantization of the stage's plain convs (eval only;
    # "none" | "int8" | "int8_static", see ConvBNAct). Takes precedence
    # over `fused`.
    quant: Any = "none"
    # int8_static link chaining (see CSPDownSample0.quant_chain)
    quant_chain: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c, a, d = self.out_ch, self.act, self.dtype
        bx = self.bn_axis
        chain = _chain_active(self.quant, self.quant_chain, train)
        if self.wpack:
            assert self.s2d_base == "stride2_w2w", self.s2d_base
            c2 = c // 2
            q = self.quant
            x = ConvBNAct(c, self.kernel_size, self.stride, act=a, dtype=d,
                          name="base", bn_axis=bx, s2d=self.s2d_base,
                          quant=q)(x, train)
            x = _link_quant(self, "link_base", x, chain)
            x1 = _WPackConvBN(c, c2, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                              name="part1")(x, train)
            x2 = _WPackConvBN(c, c2, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                              name="part2_0")(x, train)
            x2 = _WPackResBlock(c2, num_blocks=self.num_blocks,
                                shortcut=self.shortcut, act=a, dtype=d,
                                bn_axis=bx, quant=q, quant_chain=self.quant_chain,
                                name="part2_1")(x2, train)
            x2 = _WPackConvBN(c2, c2, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                              name="part2_2")(
                                  _link_quant(self, "link_p22", x2, chain),
                                  train)
            cat = _link_quant_concat(self, "link_cat", [x2, x1], chain)
            return _WPackConvBN(c, c, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                                concat_ca=c2, name="transition")(cat, train)

        x = ConvBNAct(c, self.kernel_size, self.stride, act=a, dtype=d, name="base",
                      bn_axis=bx, s2d=self.s2d_base, quant=self.quant)(x, train)

        from yolov4_tpu.ops.csp_pallas import (fused_csp_stage,
                                               fused_csp_supported)
        quant_on = _qmode(self.quant) != "none"
        if (self.fused and not train and self.act == "mish"
                and self.shortcut and not quant_on
                and fused_csp_supported(x.shape, self.num_blocks,
                                        dtype=x.dtype)):
            c2 = c // 2
            folded = {
                "part1": FoldedConvBN(c, c2, 1, name="part1")(),
                "part2_0": FoldedConvBN(c, c2, 1, name="part2_0")(),
                "part2_2": FoldedConvBN(c2, c2, 1, name="part2_2")(),
                "transition": FoldedConvBN(c, c, 1, name="transition")(),
            }
            blocks = _FoldedResBlock(c2, self.num_blocks, name="part2_1")()
            for i in range(self.num_blocks):
                folded[f"block{i}_0"] = blocks[2 * i]
                folded[f"block{i}_1"] = blocks[2 * i + 1]
            return fused_csp_stage(
                x, folded, num_blocks=self.num_blocks,
                interpret=jax.default_backend() != "tpu")

        q = self.quant
        x = _link_quant(self, "link_base", x, chain)
        x1 = ConvBNAct(c // 2, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                       name="part1")(x, train)

        x2 = ConvBNAct(c // 2, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                       name="part2_0")(x, train)
        x2 = ResBlock(c // 2, num_blocks=self.num_blocks, shortcut=self.shortcut,
                      act=a, dtype=d, bn_axis=bx, quant=q,
                      quant_chain=self.quant_chain, name="part2_1")(x2, train)
        x2 = ConvBNAct(c // 2, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                       name="part2_2")(
                           _link_quant(self, "link_p22", x2, chain), train)

        x = _link_quant_concat(self, "link_cat", [x2, x1], chain)
        return ConvBNAct(c, 1, 1, act=a, dtype=d, bn_axis=bx, quant=q,
                         name="transition")(x, train)
