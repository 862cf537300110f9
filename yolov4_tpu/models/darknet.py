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


class Backbone(nn.Module):
    """CSPDarknet53 trunk. ``return_pyramid=True`` yields (x3, x4, x5) at
    strides 8/16/32 for detection (reference yolov4.py:38-47); otherwise the
    final stride-32 feature map (reference darknet.py:153-161)."""

    return_pyramid: bool = True
    dtype: Any = jnp.float32
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        d, bx = self.dtype, self.bn_axis
        fused = self.pallas_csp
        if fused == "auto":
            import jax
            fused = jax.default_backend() == "tpu"
        fused = bool(fused) and not train
        mode = {False: "none", True: "fused"}.get(self.s2d, self.s2d)
        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if mode == "fused" and not even:
            mode = "none"  # keep/pre pair needs even dims
        stem_s2d = {"none": "none", "fused": "stride1_keep",
                    "unfused": "stride1"}[mode]
        base1_s2d = {"none": "none", "fused": "stride2_pre",
                     "unfused": "stride2"}[mode]
        base2_s2d = "stride2" if mode == "unfused" else "none"
        x = ConvBNAct(32, 3, 1, act="mish", dtype=d, name="stem", bn_axis=bx,
                      s2d=stem_s2d)(x, train)

        x = CSPDownSample0(64, 3, 2, act="mish", dtype=d, name="stage1",
                           bn_axis=bx, s2d_base=base1_s2d,
                           fused=fused)(x, train)
        x = CSPDownSample(128, 3, 2, num_blocks=2, act="mish", dtype=d,
                          name="stage2", bn_axis=bx, s2d_base=base2_s2d,
                          fused=fused)(x, train)
        x3 = CSPDownSample(256, 3, 2, num_blocks=8, act="mish", dtype=d,
                           bn_axis=bx, name="stage3", fused=fused)(x, train)
        x4 = CSPDownSample(512, 3, 2, num_blocks=8, act="mish", dtype=d,
                           bn_axis=bx, name="stage4")(x3, train)
        x5 = CSPDownSample(1024, 3, 2, num_blocks=4, act="mish", dtype=d,
                           bn_axis=bx, name="stage5")(x4, train)

        if self.return_pyramid:
            return x3, x4, x5
        return x5


class CSPDarknet53(nn.Module):
    """ImageNet classifier: backbone + global average pool + linear
    (reference darknet.py:164-193)."""

    num_classes: int = 1000
    dtype: Any = jnp.float32
    bn_axis: Any = None  # SyncBN axis (see Backbone)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Backbone(return_pyramid=False, dtype=self.dtype,
                     bn_axis=self.bn_axis, name="backbone")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # NHWC global average pool
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.lecun_normal(),
            name="classifier",
        )(x)
        return x
