"""YOLOv4 detector (reference yolo/model/yolov4.py:271-324), TPU-native.

The model consumes NHWC float images in [0, 1] and returns:
  * training: list of 3 per-scale dicts {layer_no, output, pred} feeding
    the loss (see models/decode.py),
  * inference: [B, N, 5+C] decoded predictions in input pixels, N =
    sum over scales of 3*f^2 (e.g. 22743 at 608x608).

Construction/apply are functional: ``build_model(cfg)`` returns the module;
``init_variables`` produces {params, batch_stats} pytrees (conv kaiming
fan-out init, BN scale ~N(0,0.01), matching reference yolov4.py:283-294).
Pretrained backbone loading is handled by utils/torch_convert.py +
utils/checkpoint.py rather than inside the module.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov4_tpu.models.darknet import Backbone
from yolov4_tpu.models.decode import decode_all
from yolov4_tpu.models.head import Head
from yolov4_tpu.models.neck import Neck

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class YOLOv4(nn.Module):
    n_classes: int = 80
    anchors: Sequence[Sequence[float]] = (
        (12, 16), (19, 36), (40, 28),
        (36, 75), (76, 55), (72, 146),
        (142, 110), (192, 243), (459, 401),
    )
    anchor_mask: Sequence[Sequence[int]] = ((0, 1, 2), (3, 4, 5), (6, 7, 8))
    legacy_spp_pools: bool = True
    # torch-exact max-pool tie gradients (MODEL.EXACT_POOL_GRAD): route
    # each SPP window's whole gradient to the FIRST maximal position
    # (torch select_and_scatter semantics) instead of the default
    # equal-split subgradient. Forward identical; opt-in for
    # reference-matching fine-tuning (see models/neck.maxpool_same_exact,
    # docs/PARITY.md).
    exact_pool_grad: bool = False
    dtype: Any = jnp.float32
    s2d: Any = True  # space-to-depth stem lowering (see darknet.Backbone)
    pallas_csp: Any = False  # fused eval CSP stages (see darknet.Backbone)
    wpack: Any = False  # stage1 lane packing (see darknet.Backbone)
    # per-anchor output-conv split at EVAL: the head emits three 85-channel
    # maps per scale (same params, kernel sliced at trace time) so decode
    # flattens straight into the reference's anchor-major candidate order
    # with no transpose copies (see models/head.py). False | True |
    # "auto" (on TPU only). Train path is unchanged either way.
    split_head: Any = False
    # int8 serving quantization ("none" | "int8" | "int8_static"):
    # eval-time convs in
    # backbone stages 3-5, neck, and head hidden layers run s8xs8->s32 on
    # the MXU with BN folded and dynamic per-tensor activation scales
    # (layers._quant_conv; measured 0.50-0.64x bf16 per conv on v5e).
    # NOT reference-exact — opt-in serving mode; train path unchanged.
    # quant_span "late" quantizes backbone stages 3-5 + neck + head
    # hidden convs; "full" extends into the stage1/stage2 interiors
    # (incl. their lane-packed forms — packed int8 is bit-identical to
    # unpacked int8; see darknet.Backbone.quant_span).
    quant: str = "none"
    quant_span: str = "late"
    # int8_static link chaining (layers._link_quant; bit-identical,
    # MODEL.QUANT_CHAIN=false disables for A/B)
    quant_chain: bool = True
    # direct-u8 int8 stem (default OFF — measured negative; see
    # darknet.Backbone.quant_stem)
    quant_stem: bool = False
    # width/depth multipliers (1.0 = the reference architecture exactly;
    # see darknet.scale_channels/scale_blocks). Smaller values build
    # topology-identical reduced variants, e.g. for smoke-scale sharding
    # validation on virtual devices.
    width: float = 1.0
    depth: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 decode: bool = True, input_s2d: bool = False):
        """x: [B, H, W, 3] NHWC, H == W, multiple of 32 — or, with
        input_s2d, the space-to-depth wire layout [B, H/2, W/2, 12]
        (host-packed via native.pack_s2d_u8; requires the s2d stem).

        decode=False returns the three raw NHWC head maps (for custom
        postprocessing or export)."""
        if x.dtype != jnp.uint8:
            x = x.astype(self.dtype)
        # uint8 stays uint8 into the Backbone: the quantized stem consumes
        # the wire bytes directly (exact shifted-s8 lowering) and the
        # non-quant paths normalize at the stem (darknet.Backbone)
        from yolov4_tpu.models.layers import _qmode
        quant = _qmode(self.quant)
        x3, x4, x5 = Backbone(return_pyramid=True, dtype=self.dtype,
                              s2d=self.s2d, pallas_csp=self.pallas_csp,
                              wpack=self.wpack, quant=quant,
                              quant_span=self.quant_span,
                              quant_chain=self.quant_chain,
                              quant_stem=self.quant_stem,
                              width=self.width, depth=self.depth,
                              name="backbone")(x, train,
                                               input_s2d=input_s2d)
        p1, p2, p3 = Neck(legacy_pools=self.legacy_spp_pools, dtype=self.dtype,
                          width=self.width, quant=quant,
                          quant_chain=self.quant_chain,
                          exact_pool_grad=self.exact_pool_grad,
                          name="neck")(x3, x4, x5, train)
        split = self.split_head
        if split == "auto":
            split = jax.default_backend() == "tpu"
        raws = Head(n_classes=self.n_classes, dtype=self.dtype,
                    width=self.width, anchor_split=bool(split),
                    quant=quant, name="head")(p1, p2, p3, train)
        if not decode:
            return raws
        return decode_all(list(raws), self.anchors, self.anchor_mask, training=train)


def build_model(cfg: Dict) -> YOLOv4:
    """Construct the detector from a config dict (reference model/build.py:19)."""
    model_cfg = cfg["MODEL"]
    assert model_cfg["TYPE"] == "YOLOv4", model_cfg["TYPE"]
    dtype = _DTYPES[model_cfg.get("COMPUTE_DTYPE", "bfloat16")]
    return YOLOv4(
        n_classes=model_cfg["N_CLASSES"],
        anchors=tuple(tuple(a) for a in model_cfg["ANCHORS"]),
        anchor_mask=tuple(tuple(m) for m in model_cfg["ANCHOR_MASK"]),
        legacy_spp_pools=model_cfg.get("SPP_LEGACY_POOLS", True),
        exact_pool_grad=bool(model_cfg.get("EXACT_POOL_GRAD", False)),
        dtype=dtype,
        s2d=model_cfg.get("S2D_STEM", True),
        pallas_csp=model_cfg.get("PALLAS_CSP", False),
        wpack=model_cfg.get("WPACK", False),
        split_head=model_cfg.get("SPLIT_HEAD", False),
        quant=model_cfg.get("QUANT", "none"),
        quant_span=model_cfg.get("QUANT_SPAN", "late"),
        quant_chain=bool(model_cfg.get("QUANT_CHAIN", True)),
        quant_stem=bool(model_cfg.get("QUANT_STEM", False)),
        width=float(model_cfg.get("WIDTH", 1.0)),
        depth=float(model_cfg.get("DEPTH", 1.0)),
    )


def init_variables(model: nn.Module, rng: jax.Array, img_size: int,
                   batch_size: int = 1) -> Dict[str, Any]:
    """Initialise {params, batch_stats} with a dummy NHWC batch.

    Jitted: eager init would dispatch thousands of tiny ops to the device
    one by one (minutes over a remote tunnel); one compiled program takes
    seconds."""
    dummy = jnp.zeros((batch_size, img_size, img_size, 3), jnp.float32)
    init_fn = jax.jit(lambda r, d: model.init({"params": r}, d, train=False))
    return init_fn(rng, dummy)


def calibrate_variables(model: nn.Module, variables: Dict[str, Any],
                        images: jnp.ndarray) -> Dict[str, Any]:
    """Record int8_static calibration state on raw model variables.

    Runs one eval forward with the "quant" collection mutable so every
    quantized conv stores its activation abs-max scale and pre-quantized
    weights (layers.ConvBNAct); returns ``variables`` merged with the
    recorded collection — ready for a QUANT="int8_static" apply. This is
    the raw-pytree counterpart of ``Predictor.calibrate`` (which adds
    wire packing and the multi-host cross-process max), shared by the
    measurement tools so the calibration idiom lives in one place.

    ``images``: representative NHWC float batch in [0, 1].
    """
    _, upd = jax.jit(lambda v, x: model.apply(
        v, x, train=False, mutable=["quant"]))(variables, images)
    return {**variables, **upd}
