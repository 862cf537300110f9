"""Config system.

YAML config files with the same section/key layout as the reference
(``config/*.cfg`` — YAML despite the extension; see reference
main_amp.py:66-69 and config/yolov4_Tianxiaomo.cfg). A config is a plain
nested dict wrapped with defaulting, validation and dotted access.

Sections: DATA / AUGMENTATION / MODEL / CRITERION / OPTIMIZER /
LR_SCHEDULER / TRAIN / TEST.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import yaml

# Defaults mirror config/yolov4_Tianxiaomo.cfg in the reference repo.
DEFAULTS: Dict[str, Dict[str, Any]] = {
    "DATA": {
        "MAX_NUM_LABELS": 60,
        "BATCH_SIZE": 4,
        "WORKERS": 4,
    },
    "AUGMENTATION": {
        "RANDOM_RESIZE": True,  # parsed for compat; multi-scale resize is a no-op
        "JITTER": 0.3,
        "RANDOM_HORIZONTAL_FLIP": True,
        "COLOR_DITHERING": True,
        "HUE": 0.1,
        "SATURATION": 1.5,
        "EXPOSURE": 1.5,
        "IS_MOSAIC": True,
        "MIN_OFFSET": 0.2,
    },
    "MODEL": {
        "TYPE": "YOLOv4",
        "BACKBONE": "cspdarknet53",
        "BACKBONE_PRETRAINED": None,
        "ANCHORS": [
            [12, 16], [19, 36], [40, 28],
            [36, 75], [76, 55], [72, 146],
            [142, 110], [192, 243], [459, 401],
        ],
        "ANCHOR_MASK": [[0, 1, 2], [3, 4, 5], [6, 7, 8]],
        "N_CLASSES": 80,
        # TPU-specific knobs (absent from the reference config; defaulted so
        # reference config files load unchanged).
        "SPP_LEGACY_POOLS": True,  # reproduce reference SPP 5/9/5 pooling quirk
        # torch-exact SPP max-pool tie GRADIENTS (first-maximal routing,
        # matching torch select_and_scatter) instead of the default
        # equal-split subgradient. Forward identical either way; opt in
        # when fine-tuning converted weights must match reference
        # training bit-for-bit on tied windows (docs/PARITY.md).
        "EXACT_POOL_GRAD": False,
        "COMPUTE_DTYPE": "bfloat16",
        # fused Pallas CSP stage bodies at eval (stage1-3): False | True |
        # "auto" (on TPU only). Equivalent math, checkpoint-compatible.
        "PALLAS_CSP": False,
        # lane packing (two image columns per 128-lane vector) for the
        # C=64 stages: False | "stage1" | "stage12" | True | "auto"
        # (= "stage12" on TPU). Equivalent math, checkpoint-compatible.
        # Measured on chip at 608: full-model eval forward 0.860x
        # (bit-identical), train step 0.833x (58 -> 47.5 ms device) for
        # stage1; stage12 adds train 0.966x — default on for TPU.
        "WPACK": "auto",
        # per-anchor output-conv split at EVAL (three 85-channel maps per
        # scale, same params kernel-sliced at trace time): decode
        # flattens straight into the reference's anchor-major candidate
        # order with no transpose copies. False | True | "auto" (on TPU
        # only). Measured 0.958x full fwd+decode at 608/b16,
        # bit-identical outputs (tools/exp_split_head.py).
        "SPLIT_HEAD": "auto",
        # int8 serving quantization: "none" (default) | "int8" (dynamic
        # per-tensor activation scales) | "int8_static" (calibrated scales
        # — Predictor.calibrate() or automatic on the first batch).
        # Eval-time convs in backbone stages 3-5 + neck + head hidden
        # layers run s8xs8->s32 on the MXU (BN folded, per-out-channel
        # weight scales — layers._quant_conv). NOT reference-exact
        # (quantization error); opt-in. Train path and checkpoints
        # unchanged. Measured 0.50-0.64x bf16 per conv (tools/exp_int8.py).
        "QUANT": "none",
        # quantization span: "late" (stages 3-5 + neck + head) | "full"
        # (also the stage1/stage2 interiors, incl. their lane-packed
        # forms — packed int8 is bit-identical to unpacked int8; the
        # packed 1x1/3x3 int8 chains measured 0.24x/0.46x bf16 on chip).
        "QUANT_SPAN": "full",
        # int8_static link chaining (layers._link_quant): quantized conv
        # inputs assembled by their parent module (resblock interiors,
        # CSP splits/adds/concats) are quantized at the PRODUCER with the
        # calibrated link scale — bit-identical outputs, but the bf16
        # intermediates and separate quantize passes never exist. False
        # only for A/B measurement.
        "QUANT_CHAIN": True,
        # direct-u8 int8 stem: EXACT shifted-s8 activation math that
        # deletes the u8->f32 normalize pass — measured ~perf-neutral on
        # v5e (the integer stem costs back what the normalize saved) and
        # -1.5 AP on the overfit smoke from stem WEIGHT quantization, so
        # default OFF (docs/PERF.md).
        "QUANT_STEM": False,
    },
    "CRITERION": {
        "TYPE": "YOLOLoss",
        "IGNORE_THRESH": 0.7,
        # box-regression term: "mse" = the reference's exact weighted-BCE
        # (xy) + MSE(wh)/2 (yololoss.py:417-432, parity-pinned); opt-in
        # "iou"/"giou"/"diou"/"ciou" regress 1 - IoUv on the decoded
        # boxes with the same tgt_scale^2 small-box weight (the YOLOv4
        # paper's CIoU loss — the reference code never implements it).
        "BOX_LOSS": "mse",
    },
    "OPTIMIZER": {
        "TYPE": "ADAM",
        "LR": 3e-4,
        "NO_BIAS": True,
        "NO_NORM": True,
        "MOMENTUM": 0.9,
        "DECAY": 5e-4,
    },
    "LR_SCHEDULER": {
        "TYPE": "MultiStepLR",
        "MILESTONES": [50, 70, 80],
        "GAMMA": 0.1,
        "IS_WARMUP": True,
        "WARMUP_EPOCH": 5,
        "MULTIPLIER": 1.0,
        "MINIMAL_LR": 1e-6,
    },
    "TRAIN": {
        "IMGSIZE": 608,
        "START_EPOCH": 0,
        "MAX_EPOCHS": 90,
        "ACCUMULATION_STEPS": 1,
        "OUTPUT_DIR": "./outputs/yolov4",
        # host->device dtype for train images: bfloat16 halves transfer
        # bytes vs float32 with negligible effect (compute is bf16 anyway);
        # uint8 quarters them but quantizes augmented pixels.
        "TRANSFER_DTYPE": "bfloat16",
        # image wire layout: "s2d" packs the space-to-depth stem's input
        # order on the host (kills 2.56 ms/step of device relayout copies
        # at 608/b8, costs one host repack per batch); "nhwc" opts out.
        # Auto-falls-back to nhwc with device augmentation or a non-s2d
        # stem.
        "TRANSFER_LAYOUT": "s2d",
        # preemption-safe mid-epoch checkpointing: every N steps the full
        # state rolls into checkpoint.ckpt (atomic) tagged with the batch
        # index, and resume re-enters the SAME epoch at the next batch
        # with an identical remaining trajectory (tests/test_train_step).
        # 0 = end-of-epoch saves only (the reference's cadence). Each save
        # fetches the state to host — pick a cadence that amortizes it.
        "CHECKPOINT_EVERY_STEPS": 0,
        # opt-in parameter EMA (0 = off, the reference's behavior): the
        # train step maintains ema = d*ema + (1-d)*params after every
        # optimizer update; eval/best-checkpoint selection then score the
        # EMA weights (checkpoints carry both trees).
        "EMA_DECAY": 0.0,
        # opt-in multi-scale bucket training (the reference's dead
        # RANDOM_RESIZE path, engine/build.py:105-107): a list of input
        # sizes, e.g. [320, 416, 512, 608] — each size is its own
        # compiled static-shape bucket; the loader re-targets its
        # transform every MULTISCALE_EVERY batches on a deterministic
        # per-(epoch, segment) draw. [] = fixed TRAIN.IMGSIZE.
        "MULTISCALE": [],
        "MULTISCALE_EVERY": 10,
    },
    "TEST": {
        "IMGSIZE": 608,
        "CONFTHRE": 0.005,
        "NMSTHRE": 0.4,
        # TPU-specific: fixed-shape postprocessing sizes (see ops/postprocess.py)
        "BATCH_SIZE": 8,
        "PRE_NMS_TOPK": 2048,
        "MAX_DETS": 100,
        # pycocotools truncates detections per (image, category) at 100;
        # rows ranked deeper within their class can never affect scoring,
        # so the fixed-size MAX_DETS output drops them first (exact no-op
        # when MAX_DETS <= CAT_CAP; see ops/postprocess.py). 0 disables.
        "CAT_CAP": 100,
        # opt-in: approx_max_k candidate selection (recall ~0.95) instead of
        # exact sorts; trades reference-exact postprocess for ~2-3 ms/batch
        "APPROX_TOPK": False,
        # opt-in letterbox eval geometry (aspect-preserving resize +
        # centered gray padding — the reference's DEAD resize_and_pad,
        # transform.py:19-70; its live eval stretch-resizes). Affects
        # val/detect/serve preprocessing + box unmapping symmetrically.
        "LETTERBOX": False,
        # eval image wire layout: True packs the space-to-depth stem's
        # input order on the host (skips ~1.3 ms/batch of device relayout;
        # detections identical); False = planar NCHW upload + transpose.
        "S2D_WIRE": True,
    },
}


def _deep_update(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    for key, value in override.items():
        if (
            key in base
            and isinstance(base[key], dict)
            and isinstance(value, dict)
        ):
            _deep_update(base[key], value)
        else:
            base[key] = value
    return base


class Config(dict):
    """Nested dict with defaults. ``cfg['TRAIN']['IMGSIZE']`` style access,
    exactly like the reference's raw-YAML usage."""

    @classmethod
    def from_file(cls, path: str) -> "Config":
        with open(path, "r") as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Optional[Dict[str, Any]] = None) -> "Config":
        merged = copy.deepcopy(DEFAULTS)
        if raw:
            _deep_update(merged, raw)
        cfg = cls(merged)
        cfg.validate()
        return cfg

    def validate(self) -> None:
        model = self["MODEL"]
        anchors = model["ANCHORS"]
        masks = model["ANCHOR_MASK"]
        if len(anchors) == 0 or any(len(a) != 2 for a in anchors):
            raise ValueError(f"MODEL.ANCHORS must be a list of [w, h]: {anchors}")
        flat = [i for mask in masks for i in mask]
        if sorted(flat) != list(range(len(anchors))):
            raise ValueError(
                f"MODEL.ANCHOR_MASK must partition range({len(anchors)}): {masks}"
            )
        if len(masks) != 3:
            raise ValueError("exactly 3 detection scales are supported")
        n_classes = model["N_CLASSES"]
        if n_classes < 1:
            raise ValueError(f"MODEL.N_CLASSES must be >= 1, got {n_classes}")
        for key in ("TRAIN", "TEST"):
            size = self[key]["IMGSIZE"]
            if size % 32 != 0:
                raise ValueError(f"{key}.IMGSIZE must be a multiple of 32: {size}")
        if self["TRAIN"]["ACCUMULATION_STEPS"] < 1:
            raise ValueError("TRAIN.ACCUMULATION_STEPS must be >= 1")
        if model.get("QUANT", "none") not in ("none", "int8", "int8_static"):
            raise ValueError("MODEL.QUANT must be 'none', 'int8', or "
                             f"'int8_static': {model['QUANT']}")
        if model.get("QUANT_SPAN", "late") not in ("late", "full"):
            raise ValueError("MODEL.QUANT_SPAN must be 'late' or 'full': "
                             f"{model['QUANT_SPAN']}")
        box_loss = self["CRITERION"].get("BOX_LOSS", "mse")
        if box_loss not in ("mse", "iou", "giou", "diou", "ciou"):
            raise ValueError("CRITERION.BOX_LOSS must be one of "
                             f"mse/iou/giou/diou/ciou: {box_loss}")
        ema = float(self["TRAIN"].get("EMA_DECAY", 0.0))
        if not 0.0 <= ema < 1.0:
            raise ValueError(f"TRAIN.EMA_DECAY must be in [0, 1): {ema}")
        ms = self["TRAIN"].get("MULTISCALE", []) or []
        if any(int(s) % 32 for s in ms):
            raise ValueError(
                f"TRAIN.MULTISCALE sizes must be multiples of 32: {ms}")
        if ms and int(self["TRAIN"].get("MULTISCALE_EVERY", 10)) < 1:
            raise ValueError("TRAIN.MULTISCALE_EVERY must be >= 1")


def load_config(path: Optional[str] = None) -> Config:
    if path is None:
        return Config.from_dict({})
    return Config.from_file(path)
