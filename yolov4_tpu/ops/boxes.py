"""Box geometry library (pure jnp, fully batched, static shapes).

Semantics match the reference implementations so that loss/postprocess
numerics are reproducible:
  * pairwise IoU: reference yolo/model/yololoss.py:16-91 (``bboxes_iou``),
    including the strict ``tl < br`` intersection-validity product,
  * tlwh->xyxy / xyxy->cxcywh: reference yolo/data/transform.py:332-356,
  * resized-image -> source-image unmapping: reference
    yolo/util/utils.py:281-340 (``yolobox2xywh``, ``yolobox2yxyx``).

Formats:
  * ``xyxy``   — x1, y1, x2, y2 corner boxes
  * ``tlwh``   — top-left x, y, width, height (COCO annotation format)
  * ``cxcywh`` — center x, y, width, height (YOLO format)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def tlwh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] tlwh -> xyxy."""
    x1y1 = boxes[..., :2]
    x2y2 = boxes[..., :2] + boxes[..., 2:4]
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def xyxy_to_tlwh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] xyxy -> tlwh."""
    x1y1 = boxes[..., :2]
    wh = boxes[..., 2:4] - boxes[..., :2]
    return jnp.concatenate([x1y1, wh], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] xyxy -> cxcywh (reference transform.py:345 ``xyxy2yolobox``)."""
    center = (boxes[..., :2] + boxes[..., 2:4]) / 2
    wh = boxes[..., 2:4] - boxes[..., :2]
    return jnp.concatenate([center, wh], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] cxcywh -> xyxy (reference utils.py:117-126 corner transform)."""
    half = boxes[..., 2:4] / 2
    x1y1 = boxes[..., :2] - half
    x2y2 = boxes[..., :2] + half
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def _iou_pairwise_impl(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, fmt: str,
                       eps: float) -> jnp.ndarray:
    """Shared body of :func:`iou_pairwise` / :func:`iou_pairwise_safe` —
    they differ only in the final denominator guard (``eps`` 0 disables
    it, keeping the reference's exact divide-by-zero semantics)."""
    if fmt == "xyxy":
        a_tl, a_br = boxes_a[..., :2], boxes_a[..., 2:4]
        b_tl, b_br = boxes_b[..., :2], boxes_b[..., 2:4]
        area_a = jnp.prod(a_br - a_tl, axis=-1)
        area_b = jnp.prod(b_br - b_tl, axis=-1)
    elif fmt == "cxcywh":
        a_tl = boxes_a[..., :2] - boxes_a[..., 2:4] / 2
        a_br = boxes_a[..., :2] + boxes_a[..., 2:4] / 2
        b_tl = boxes_b[..., :2] - boxes_b[..., 2:4] / 2
        b_br = boxes_b[..., :2] + boxes_b[..., 2:4] / 2
        area_a = jnp.prod(boxes_a[..., 2:4], axis=-1)
        area_b = jnp.prod(boxes_b[..., 2:4], axis=-1)
    else:
        raise ValueError(f"unknown box format: {fmt}")

    tl = jnp.maximum(a_tl[..., :, None, :], b_tl[..., None, :, :])  # [..., N, K, 2]
    br = jnp.minimum(a_br[..., :, None, :], b_br[..., None, :, :])
    valid = jnp.prod((tl < br).astype(boxes_a.dtype), axis=-1)
    inter = jnp.prod(br - tl, axis=-1) * valid
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    if eps:
        union = jnp.maximum(union, eps)
    return inter / union


def iou_pairwise(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, fmt: str = "xyxy") -> jnp.ndarray:
    """Pairwise IoU between two box sets.

    Args:
      boxes_a: [..., N, 4]
      boxes_b: [..., K, 4]
      fmt: 'xyxy' or 'cxcywh' (matching reference bboxes_iou xyxy=True/False).

    Returns:
      [..., N, K] IoU matrix. An intersection only counts when top-left is
      strictly less than bottom-right in BOTH axes (reference
      yololoss.py:77, ``en = (tl < br).prod``). Degenerate unions divide by
      zero exactly as in the reference (callers mask invalid rows).
    """
    return _iou_pairwise_impl(boxes_a, boxes_b, fmt, 0.0)


def iou_pairwise_safe(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, fmt: str = "xyxy",
                      eps: float = 1e-9) -> jnp.ndarray:
    """Like :func:`iou_pairwise` but with a guarded denominator (no NaN for
    degenerate/padded boxes). Use anywhere the caller does not mask."""
    return _iou_pairwise_impl(boxes_a, boxes_b, fmt, eps)


def iou_variant_elementwise(pred: jnp.ndarray, gt: jnp.ndarray,
                            kind: str = "iou",
                            eps: float = 1e-9) -> jnp.ndarray:
    """Elementwise IoU / GIoU / DIoU / CIoU between matched box pairs.

    pred, gt: [..., 4] cxcywh, SAME shape (one pred per gt — the
    regression-loss pairing, not the pairwise matrix). Returns [...].

    This backs the opt-in CRITERION.BOX_LOSS variants (the YOLOv4 paper's
    CIoU regression loss — the reference CODE trains BCE+MSE only,
    yolo/model/yololoss.py:417-432, so none of this is parity-pinned).
    Every denominator is eps-guarded: padded/masked cells carry zero
    boxes, and the loss multiplies by the target mask AFTER this runs —
    a NaN here would poison the masked gradient (NaN * 0 = NaN).

    Formulas (Zheng et al., AAAI 2020 "Distance-IoU Loss"):
      giou = iou - (C - U) / C            C = enclosing-box area
      diou = iou - rho^2 / c^2            rho = center distance,
                                          c = enclosing-box diagonal
      ciou = diou - alpha * v             v = (4/pi^2) * dAtan(w/h)^2,
                                          alpha = v / ((1 - iou) + v),
                                          alpha treated as a constant in
                                          the gradient (the paper's rule)
    """
    if kind not in ("iou", "giou", "diou", "ciou"):
        raise ValueError(f"unknown IoU variant: {kind!r}")
    import jax

    p_tl = pred[..., :2] - pred[..., 2:4] / 2
    p_br = pred[..., :2] + pred[..., 2:4] / 2
    g_tl = gt[..., :2] - gt[..., 2:4] / 2
    g_br = gt[..., :2] + gt[..., 2:4] / 2

    tl = jnp.maximum(p_tl, g_tl)
    br = jnp.minimum(p_br, g_br)
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_p = pred[..., 2] * pred[..., 3]
    area_g = gt[..., 2] * gt[..., 3]
    union = area_p + area_g - inter
    iou = inter / jnp.maximum(union, eps)
    if kind == "iou":
        return iou

    c_tl = jnp.minimum(p_tl, g_tl)
    c_br = jnp.maximum(p_br, g_br)
    c_wh = jnp.maximum(c_br - c_tl, 0.0)
    if kind == "giou":
        c_area = c_wh[..., 0] * c_wh[..., 1]
        return iou - (c_area - union) / jnp.maximum(c_area, eps)

    rho2 = (jnp.square(pred[..., 0] - gt[..., 0])
            + jnp.square(pred[..., 1] - gt[..., 1]))
    c2 = jnp.square(c_wh[..., 0]) + jnp.square(c_wh[..., 1])
    diou = iou - rho2 / jnp.maximum(c2, eps)
    if kind == "diou":
        return diou

    # aspect-ratio term; atan args guarded so zero-height padded boxes
    # stay finite (atan(0/eps)=0)
    v = (4.0 / jnp.pi ** 2) * jnp.square(
        jnp.arctan(gt[..., 2] / jnp.maximum(gt[..., 3], eps))
        - jnp.arctan(pred[..., 2] / jnp.maximum(pred[..., 3], eps)))
    alpha = jax.lax.stop_gradient(v / jnp.maximum((1.0 - iou) + v, eps))
    return diou - alpha * v


def unmap_to_source_tlwh(boxes_xyxy, src_hw, dst_hw,
                         offset_xy=(0.0, 0.0)) -> np.ndarray:
    """xyxy boxes in the (stretch-)resized image -> COCO tlwh in the source
    image (reference utils.py:281-309 ``yolobox2xywh``).

    Pure NUMPY on purpose: every caller (evaluator, detect CLI, serving
    batcher) runs this host-side on fetched detections — a jnp version
    dispatches a tiny op to the accelerator per call, which on a tunneled
    TPU costs a full round trip per image/request.

    Args:
      boxes_xyxy: [..., 4]
      src_hw: (src_h, src_w) broadcastable scalars or [..., 1] arrays
      dst_hw: (dst_h, dst_w) — the CONTENT dims (scaled image without
        padding; = the full canvas for stretch-resize)
      offset_xy: (off_x, off_y) letterbox padding offsets, subtracted
        before scaling (0, 0 for stretch-resize)
    """
    boxes_xyxy = np.asarray(boxes_xyxy)
    src_h, src_w = src_hw
    dst_h, dst_w = dst_hw
    off_x, off_y = offset_xy
    x1 = (boxes_xyxy[..., 0] - off_x) / dst_w * src_w
    y1 = (boxes_xyxy[..., 1] - off_y) / dst_h * src_h
    w = (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) / dst_w * src_w
    h = (boxes_xyxy[..., 3] - boxes_xyxy[..., 1]) / dst_h * src_h
    return np.stack([x1, y1, w, h], axis=-1)


def unmap_to_source_xyxy(boxes_xyxy, src_hw, dst_hw,
                         offset_xy=(0.0, 0.0)) -> np.ndarray:
    """xyxy boxes in the resized image -> xyxy in the source image
    (reference utils.py:312-340 ``yolobox2yxyx``, reordered to xyxy).
    Pure numpy — see :func:`unmap_to_source_tlwh` (incl. the offset_xy
    letterbox contract)."""
    boxes_xyxy = np.asarray(boxes_xyxy)
    src_h, src_w = src_hw
    dst_h, dst_w = dst_hw
    off_x, off_y = offset_xy
    x1 = (boxes_xyxy[..., 0] - off_x) * src_w / dst_w
    y1 = (boxes_xyxy[..., 1] - off_y) * src_h / dst_h
    x2 = (boxes_xyxy[..., 2] - off_x) * src_w / dst_w
    y2 = (boxes_xyxy[..., 3] - off_y) * src_h / dst_h
    return np.stack([x1, y1, x2, y2], axis=-1)
