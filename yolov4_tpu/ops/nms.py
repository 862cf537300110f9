"""On-device greedy NMS with static shapes.

TPU-native replacement for the reference's CPU numpy NMS
(yolo/util/utils.py:32-89): candidates are padded/sorted to a fixed K, the
KxK IoU matrix is computed once on the VPU, and the inherently sequential
greedy pass runs as a `lax.fori_loop` over rows of the precomputed matrix —
no host round-trips, fully batched, jit/vmap friendly.

Semantics match the reference exactly for the boxes that fit in the top-K
budget: a candidate is suppressed iff a HIGHER-scored KEPT candidate
overlaps it with IoU >= thresh (suppressed boxes do not suppress others).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov4_tpu.ops.boxes import iou_pairwise_safe


def greedy_nms_mask(boxes_xyxy: jnp.ndarray, valid: jnp.ndarray,
                    iou_thresh: float) -> jnp.ndarray:
    """Greedy suppression over score-sorted candidates.

    Args:
      boxes_xyxy: [B, K, 4], sorted by descending score along K.
      valid: [B, K] bool — below-threshold / padding slots.
      iou_thresh: suppression threshold (suppress at IoU >= thresh,
        reference utils.py:77).

    Returns:
      keep: [B, K] bool.
    """
    k = boxes_xyxy.shape[-2]
    iou = iou_pairwise_safe(boxes_xyxy, boxes_xyxy, fmt="xyxy")  # [B, K, K]
    suppress_pair = iou >= iou_thresh

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep):
        row_active = keep[:, i] & valid[:, i]                      # [B]
        suppressed = suppress_pair[:, i, :] & (col > i) & row_active[:, None]
        return keep & ~suppressed

    keep = jax.lax.fori_loop(0, k, body, jnp.ones_like(valid))
    return keep & valid
