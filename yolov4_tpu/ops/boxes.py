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


def unmap_to_source_tlwh(boxes_xyxy, src_hw, dst_hw) -> np.ndarray:
    """xyxy boxes in the (stretch-)resized image -> COCO tlwh in the source
    image (reference utils.py:281-309 ``yolobox2xywh``).

    Pure NUMPY on purpose: every caller (evaluator, detect CLI, serving
    batcher) runs this host-side on fetched detections — a jnp version
    dispatches a tiny op to the accelerator per call, which on a tunneled
    TPU costs a full round trip per image/request.

    Args:
      boxes_xyxy: [..., 4]
      src_hw: (src_h, src_w) broadcastable scalars or [..., 1] arrays
      dst_hw: (dst_h, dst_w)
    """
    boxes_xyxy = np.asarray(boxes_xyxy)
    src_h, src_w = src_hw
    dst_h, dst_w = dst_hw
    x1 = boxes_xyxy[..., 0] / dst_w * src_w
    y1 = boxes_xyxy[..., 1] / dst_h * src_h
    w = (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) / dst_w * src_w
    h = (boxes_xyxy[..., 3] - boxes_xyxy[..., 1]) / dst_h * src_h
    return np.stack([x1, y1, w, h], axis=-1)


def unmap_to_source_xyxy(boxes_xyxy, src_hw, dst_hw) -> np.ndarray:
    """xyxy boxes in the resized image -> xyxy in the source image
    (reference utils.py:312-340 ``yolobox2yxyx``, reordered to xyxy).
    Pure numpy — see :func:`unmap_to_source_tlwh`."""
    boxes_xyxy = np.asarray(boxes_xyxy)
    src_h, src_w = src_hw
    dst_h, dst_w = dst_hw
    x1 = boxes_xyxy[..., 0] * src_w / dst_w
    y1 = boxes_xyxy[..., 1] * src_h / dst_h
    x2 = boxes_xyxy[..., 2] * src_w / dst_w
    y2 = boxes_xyxy[..., 3] * src_h / dst_h
    return np.stack([x1, y1, x2, y2], axis=-1)
