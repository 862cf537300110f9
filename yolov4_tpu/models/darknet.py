"""CSPDarknet53 backbone + ImageNet classifier head.

Rebuild of reference darknet/darknet.py:141-193 (classification) and
yolo/model/yolov4.py:26-47 (detection backbone returning three pyramid
levels). NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yolov4_tpu.models.layers import ConvBNAct, CSPDownSample, CSPDownSample0


def scale_channels(ch: int, width: float) -> int:
    """Width-multiplier channel scaling: nearest multiple of 8, floor 8
    (keeps every internal c//2 split even and TPU lanes reasonably fed)."""
    if width == 1.0:
        return ch
    return max(8, int(round(ch * width / 8)) * 8)


def scale_blocks(n: int, depth: float) -> int:
    """Depth-multiplier residual-block scaling, floor 1."""
    if depth == 1.0:
        return n
    return max(1, int(round(n * depth)))


class Backbone(nn.Module):
    """CSPDarknet53 trunk. ``return_pyramid=True`` yields (x3, x4, x5) at
    strides 8/16/32 for detection (reference yolov4.py:38-47); otherwise the
    final stride-32 feature map (reference darknet.py:153-161).

    ``width``/``depth`` multipliers scale channel counts / residual-block
    counts (1.0 = the reference architecture; smaller values give ablation/
    smoke-scale variants with the identical layer topology and param tree
    structure — used e.g. by the multi-chip dryrun so sharding validation
    doesn't pay full-scale weights on virtual CPU devices)."""

    return_pyramid: bool = True
    dtype: Any = jnp.float32
    width: float = 1.0
    depth: float = 1.0
    # space-to-depth lowering for the low-channel stem/stage1 convs
    # (cin 3/32 -> 12/128 on the MXU's contracting rows); numerically
    # equivalent, checkpoint-compatible (see layers.ConvBNAct). Values:
    #   False/"none":  plain convs
    #   True/"fused":  stem keeps the s2d layout through BN+mish into
    #                  stage1's base conv (no reshuffle copies — profiled
    #                  as the unfused modes' cost); stage2+ plain (their
    #                  reshuffles outweigh the cin-64 MXU gain)
    #   "unfused":     standalone stride1/stride2 modes everywhere (kept
    #                  for tests/ablation)
    s2d: Any = True
    # SyncBN: shard_map axis to pmean batch statistics over (or None for
    # per-replica stats). The reference applies SyncBN only in its darknet
    # pretrainer (darknet/main_amp.py:147-150).
    bn_axis: Any = None
    # Fused Pallas CSP stage bodies at EVAL time (ops/csp_pallas.py) for the
    # memory-bound stride-4/8/16 stages (stage1-3; stage4/5 weights exceed
    # VMEM). False | True | "auto" (= on when running on TPU). Exactly
    # equivalent math (BN running stats folded), checkpoint-compatible.
    pallas_csp: Any = False
    # lane packing for the low-channel stages (C=64 interiors leave half
    # the VPU's 128 lanes idle on Mish/BN and half the MXU's contracting
    # rows on K=64 dots): two image columns per 128-lane vector,
    # block-structured kernels, boundaries folded into the strided base
    # convs. Mathematically equivalent, checkpoint-compatible
    # (layers._wpack_* / _WPackConvBN). Values:
    #   False;  "stage1" (stage1 only);  "stage12" (stage1+stage2, whose
    #   CSP interior also runs at C=64);  True/"auto" (on-TPU default
    #   span). Measured 0.478x the plain stage1 op mix at 608/b16
    #   (tools/exp_wpack.py).
    wpack: Any = False
    # int8 serving quantization (MODEL.QUANT "int8" / "int8_static"):
    # eval-time convs run s8xs8->s32 (layers._quant_conv). quant_span
    # "late" quantizes stages 3-5 only; "full" extends into the
    # stage1/stage2 interiors (incl. their lane-packed forms — the
    # round-3 act-bound probe killed the "Mish-VPU-bound" exclusion, and
    # the shape probe measured packed 1x1/3x3 int8 chains at 0.24x/0.46x
    # bf16, tools/exp_int8.py). With "full", the strided base/boundary
    # convs quantize through their rearranged-kernel forms too
    # (layers.ConvBNAct strided-quant branch — BN folds into the ORIGINAL
    # kernel before the trace-time rearrangement); only the stem stays
    # bf16 unless quant_stem additionally opts it in.
    quant: Any = "none"
    quant_span: str = "late"
    # int8_static link chaining (layers._link_quant): bit-identical to the
    # unchained program; MODEL.QUANT_CHAIN=false disables (A/B knob)
    quant_chain: bool = True
    # direct-u8 int8 stem (MODEL.QUANT_STEM, default OFF — measured
    # negative): consuming the uint8 wire as shifted s8 deletes the
    # normalize pass (~1.7 ms/batch at 608/b16) but the integer stem plus
    # its shift/pad passes cost it back (stem scope 1.38 -> 1.79 ms/iter
    # in the serve trace; net ~neutral), while stem WEIGHT quantization
    # cost -1.5 AP on the overfit smoke (raw-pixel first convs are
    # quantization-sensitive). Kept as an opt-in with exact-activation
    # math for hardware where the trade differs.
    quant_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 input_s2d: bool = False):
        """input_s2d: x arrives in the space-to-depth wire layout
        [B, H/2, W/2, 12] (host-packed, native.pack_s2d_u8) instead of
        NHWC [B, H, W, 3]; requires the fused s2d stem. Skips the
        in-program 3-channel relayout copies (~1.3-2.5 ms/batch)."""
        d, bx = self.dtype, self.bn_axis
        fused = self.pallas_csp
        if fused == "auto":
            import jax
            fused = jax.default_backend() == "tpu"
        fused = bool(fused) and not train
        mode = {False: "none", True: "fused"}.get(self.s2d, self.s2d)
        in_h, in_w = x.shape[1], x.shape[2]
        if input_s2d:
            assert mode == "fused", "input_s2d requires the fused s2d stem"
            in_h, in_w = in_h * 2, in_w * 2
        even = in_h % 2 == 0 and in_w % 2 == 0
        if mode == "fused" and not even:
            mode = "none"  # keep/pre pair needs even dims
        stem_s2d = {"none": "none", "fused": "stride1_keep",
                    "unfused": "stride1"}[mode]
        base1_s2d = {"none": "none", "fused": "stride2_pre",
                     "unfused": "stride2"}[mode]
        base2_s2d = "stride2" if mode == "unfused" else "none"
        wpack = self.wpack
        if wpack == "auto":
            import jax
            wpack = "stage12" if jax.default_backend() == "tpu" else False
        elif wpack is True:
            wpack = "stage12"
        # packed stage1 needs even stage-1 dims (input multiple of 4;
        # the packed stage2 needs multiple of 8 — the model's
        # multiple-of-32 contract covers both; guard anyway)
        if wpack and not (in_h % 4 == 0 and in_w % 4 == 0):
            wpack = False
        wpack2 = wpack == "stage12" and in_h % 8 == 0 and in_w % 8 == 0
        if wpack:
            base1_s2d = ("stride2_pre_wpack" if base1_s2d == "stride2_pre"
                         else "stride2_wpack")
            base2_s2d = "stride2_w2w" if wpack2 else "stride2_from_wpack"
        base3_s2d = "stride2_from_wpack" if wpack2 else "none"
        w = lambda ch: scale_channels(ch, self.width)
        nb = lambda n: scale_blocks(n, self.depth)
        q12 = self.quant if self.quant_span == "full" else "none"
        # MODEL.QUANT_STEM additionally quantizes the stem — only for
        # uint8 inputs, where the direct-u8 lowering (layers.ConvBNAct)
        # makes activation quantization EXACT and deletes the u8->f32
        # normalize pass. A float input keeps the bf16 stem.
        stem_q = (q12 if self.quant_stem and stem_s2d == "stride1_keep"
                  else "none")
        if x.dtype == jnp.uint8 and (train or stem_q == "none"):
            x = x.astype(jnp.float32) / 255.0
        x = ConvBNAct(w(32), 3, 1, act="mish", dtype=d, name="stem", bn_axis=bx,
                      s2d=stem_s2d, quant=stem_q)(x, train,
                                                  input_s2d=input_s2d)
        qc = self.quant_chain
        # cross-stage links (int8_static chaining): each stage's output
        # feeds exactly ONE consumer — the next stage's (quantized) base
        # conv — for stage1/2; stage3+ outputs also feed the neck, so they
        # stay bf16. The stem->stage1 link needs the quantized base form.
        from yolov4_tpu.models.layers import _chain_active, _link_quant
        chain12 = _chain_active(q12, qc, train)
        chain3 = _chain_active(self.quant, qc, train)
        x = _link_quant(self, "link_stem", x, chain12)
        x = CSPDownSample0(w(64), 3, 2, act="mish", dtype=d, name="stage1",
                           bn_axis=bx, s2d_base=base1_s2d,
                           fused=fused and not wpack,
                           wpack=wpack, quant=q12, quant_chain=qc)(x, train)
        x = _link_quant(self, "link_s12", x, chain12)
        x = CSPDownSample(w(128), 3, 2, num_blocks=nb(2), act="mish", dtype=d,
                          name="stage2", bn_axis=bx, s2d_base=base2_s2d,
                          fused=fused and not wpack2,
                          wpack=wpack2, quant=q12, quant_chain=qc)(x, train)
        x = _link_quant(self, "link_s23", x, chain3)
        x3 = CSPDownSample(w(256), 3, 2, num_blocks=nb(8), act="mish", dtype=d,
                           bn_axis=bx, name="stage3", s2d_base=base3_s2d,
                           fused=fused, quant=self.quant,
                           quant_chain=qc)(x, train)
        x4 = CSPDownSample(w(512), 3, 2, num_blocks=nb(8), act="mish", dtype=d,
                           bn_axis=bx, quant=self.quant, quant_chain=qc,
                           name="stage4")(x3, train)
        x5 = CSPDownSample(w(1024), 3, 2, num_blocks=nb(4), act="mish", dtype=d,
                           bn_axis=bx, quant=self.quant, quant_chain=qc,
                           name="stage5")(x4, train)

        if self.return_pyramid:
            return x3, x4, x5
        return x5


class CSPDarknet53(nn.Module):
    """ImageNet classifier: backbone + global average pool + linear
    (reference darknet.py:164-193).

    The backbone's TPU lowerings (fused s2d stem, lane packing) apply to
    the pretrainer exactly as to the detector — same modules, same
    checkpoint-compatible trace-time kernel rearrangements — so the
    backbone weights this app produces train at the optimized step cost
    and load unchanged into YOLOv4 (BACKBONE_PRETRAINED)."""

    num_classes: int = 1000
    dtype: Any = jnp.float32
    bn_axis: Any = None  # SyncBN axis (see Backbone)
    width: float = 1.0   # smoke/ablation scaling (see Backbone)
    depth: float = 1.0
    s2d: Any = True
    wpack: Any = "auto"  # lane packing (on-TPU default; see Backbone)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 input_s2d: bool = False) -> jnp.ndarray:
        x = Backbone(return_pyramid=False, dtype=self.dtype,
                     bn_axis=self.bn_axis, width=self.width,
                     depth=self.depth, s2d=self.s2d, wpack=self.wpack,
                     name="backbone")(x, train, input_s2d=input_s2d)
        x = jnp.mean(x, axis=(1, 2))  # NHWC global average pool
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.lecun_normal(),
            name="classifier",
        )(x)
        return x
