"""On-device greedy NMS with static shapes.

TPU-native replacement for the reference's CPU numpy NMS
(yolo/util/utils.py:32-89): candidates are padded/sorted to a fixed K, the
KxK IoU matrix is computed once on the VPU, and greedy suppression is
solved as a FIXPOINT of its defining recurrence rather than K sequential
steps:

    keep[i] = valid[i]  and  no j < i with keep[j] and IoU[j, i] >= t

The greedy result is the unique solution, and Jacobi iteration from
keep = valid converges to it in (suppression-chain depth + 1) rounds —
single digits on real detections, vs K = 2048 `fori_loop` steps whose
per-step loop overhead (~4-5 us) dominated round 1's ~9 ms NMS time.
Each round is one masked any-reduction over the precomputed pair mask
(memory-bound: ~K*K bytes of HBM traffic), and a `while_loop` exits as
soon as nothing changes, so worst-case inputs still terminate exactly.

Semantics match the reference exactly for the boxes that fit in the top-K
budget: a candidate is suppressed iff a HIGHER-scored KEPT candidate
overlaps it with IoU >= thresh (suppressed boxes do not suppress others).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov4_tpu.ops.boxes import iou_pairwise_safe


def _jacobi_fixpoint(pair: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Solve keep[i] = base[i] & no j<i with keep[j] & pair[j,i] by Jacobi
    iteration from keep=base; converges to the (unique, greedy) solution in
    suppression-chain-depth rounds, and the while_loop exits at the
    fixpoint so worst-case inputs still terminate exactly."""

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        hit = jnp.any(pair & keep[:, :, None], axis=1)
        new_keep = base & ~hit
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(cond, body, (base, jnp.array(True)))
    return keep


def greedy_nms_mask(boxes_xyxy: jnp.ndarray, valid: jnp.ndarray,
                    iou_thresh: float, block: int = 256) -> jnp.ndarray:
    """Greedy suppression over score-sorted candidates.

    Block-sequential exact greedy: score-ordered blocks of ``block`` rows
    are finalized in turn — suppression from already-final earlier blocks
    is ONE vectorized masked any-reduction, and only the tiny
    [B, block, block] within-block recurrence iterates (Jacobi, see
    above). Total HBM traffic ~1.5 passes over the pair mask, vs K
    sequential row steps (round 1) or chain-depth full-matrix sweeps.

    Args:
      boxes_xyxy: [B, K, 4], sorted by descending score along K.
      valid: [B, K] bool — below-threshold / padding slots.
      iou_thresh: suppression threshold (suppress at IoU >= thresh,
        reference utils.py:77).
      block: rows finalized per step (multiple of 128 for lane tiling).

    Returns:
      keep: [B, K] bool.
    """
    k = boxes_xyxy.shape[-2]
    iou = iou_pairwise_safe(boxes_xyxy, boxes_xyxy, fmt="xyxy")  # [B, K, K]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 2)
    # pair[b, j, i]: j would suppress i if j is kept (strictly upper-tri);
    # fused with the IoU computation by XLA, so only the bool mask hits HBM
    pair = (iou >= iou_thresh) & (row < col) & valid[:, :, None]

    if k <= block:
        return _jacobi_fixpoint(pair, valid)

    parts = []
    for r0 in range(0, k, block):
        t = min(block, k - r0)
        base = valid[:, r0:r0 + t]
        if r0:
            # suppression by kept boxes in already-final earlier blocks
            keep_prev = jnp.concatenate(parts, axis=1)  # [B, r0]
            ext = jnp.any(pair[:, :r0, r0:r0 + t] & keep_prev[:, :, None],
                          axis=1)
            base = base & ~ext
        parts.append(_jacobi_fixpoint(pair[:, r0:r0 + t, r0:r0 + t], base))
    return jnp.concatenate(parts, axis=1)
