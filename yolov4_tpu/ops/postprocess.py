"""On-device detection postprocessing (conf filter + class-wise NMS).

TPU rebuild of the reference's postprocess (yolo/util/utils.py:92-223),
which runs per-image python loops and CPU numpy NMS. Here the whole batch is
one XLA program with static shapes:

  1. multi-label expansion: every (box, class) pair with
     obj * cls_prob >= conf_thre is a candidate — identical to the
     reference's two-stage filter (utils.py:145,170), since
     obj*cls >= t implies obj*max_cls >= t;
  2. top-K selection over the N*C score matrix (K = pre_nms_topk); the
     reference keeps every candidate, so K caps extremely low thresholds —
     choose K large enough for the eval protocol;
  3. class-wise greedy NMS as a single joint pass: boxes are offset by
     class_idx * offset so different classes never overlap, making one
     greedy run equivalent to the reference's per-class loops
     (utils.py:194-220);
  4. fixed-size output: top max_dets survivors per image, with a validity
     mask instead of ragged per-image lists.

Output rows are [x1, y1, x2, y2, obj_conf, cls_conf, cls_idx] in input-image
pixels — the reference's detection row layout (utils.py:171-184).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from yolov4_tpu.ops.boxes import cxcywh_to_xyxy
from yolov4_tpu.ops.nms import greedy_nms_mask


def _exact_top_k(x: jnp.ndarray, k: int):
    """Exact top-k via the TPU PartialReduce op instead of a full sort.

    ``lax.approx_max_k`` with ``recall_target=1.0`` is EXACT — XLA plans
    the partial-reduce output size so no member of the true top-k can be
    dropped — and measured 0.82x ``lax.top_k``'s variadic sort at the
    serving shape ([16, 163840] -> 2048 on v5e; tools/exp_topk.py, incl.
    adversarial cases: all winners clustered in one span, strided combs,
    all-equal ties, descending ramps — bit-identical selected values).
    Non-TPU backends lower it to the exact sort fallback. Among EXACTLY
    tied scores the selected index order may differ from lax.top_k's;
    detection scores are f32 products where ties only arise from
    degenerate duplicates.
    """
    return jax.lax.approx_max_k(x, k, recall_target=1.0)


def _rank_in_class(cls_idx: jnp.ndarray, scores: jnp.ndarray,
                   keep: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Within-class descending-score rank of each kept row.

    cls_idx/scores/keep: [B, K]; scores in [0, 1]. Returns [B, K] int32 —
    rank r means r kept same-class rows score at least as high (ties broken
    by candidate order, matching pycocotools' stable mergesort). Non-kept
    rows get rank K (beyond any cap).
    """
    k = cls_idx.shape[-1]
    scores = jnp.clip(scores, 0.0, 1.0)  # keep the composite key per-class
    # composite key groups rows by class (ascending) with descending score
    # inside each class; suppressed rows sort to the tail as class C+1
    skey = jnp.where(keep,
                     cls_idx.astype(jnp.float32) * 2.0 + (1.0 - scores),
                     jnp.float32(2 * num_classes + 3))
    perm = jnp.argsort(skey, axis=-1)                    # stable
    sorted_key = jnp.take_along_axis(skey, perm, axis=-1)
    sorted_cls = jnp.floor(sorted_key * 0.5).astype(jnp.int32)
    # first index of each class run = searchsorted of the run values in
    # themselves; rank within the run = position - run start
    first = jax.vmap(
        lambda a: jnp.searchsorted(a, a, side="left"))(sorted_cls)
    ranks_sorted = jnp.arange(k, dtype=jnp.int32)[None, :] - first.astype(jnp.int32)
    inv = jnp.argsort(perm, axis=-1)
    rank = jnp.take_along_axis(ranks_sorted, inv, axis=-1)
    return jnp.where(keep, rank, jnp.int32(k))


@partial(jax.jit, static_argnames=("num_classes", "pre_nms_topk", "max_dets",
                                   "nms_engine", "topk_approx", "cat_cap",
                                   "return_relevant_count"))
def postprocess(predictions: jnp.ndarray, num_classes: int,
                conf_thre: float, nms_thre: float,
                pre_nms_topk: int = 2048,
                max_dets: int = 100,
                nms_engine: str = "auto",
                topk_approx: bool = False,
                cat_cap: int = 100,
                return_relevant_count: bool = False) -> Tuple[jnp.ndarray, ...]:
    """predictions: [B, N, 5+C] decoded model output (cxcywh + obj + cls).

    ``topk_approx`` swaps the two large candidate-selection sorts for TPU
    ``lax.approx_max_k`` (PartialReduce, recall_target 0.95) — an OPT-IN
    speed/exactness trade (the default keeps the reference's exact
    semantics, pinned by the parity tests). Results stay score-sorted
    (aggregate_to_topk performs an exact final top-k over the partial
    winners), so NMS greedy order is unaffected; only the tail of the
    candidate set may differ.

    ``cat_cap`` mirrors pycocotools' per-(image, category) maxDets
    truncation (COCOeval.evaluateImg keeps the top 100 detections of each
    category per image; the reference feeds it UNLIMITED rows,
    engine/build.py:176-188): a kept row whose within-class score rank is
    >= cat_cap can never influence that scoring, so the final top-max_dets
    selection drops such rows first. For max_dets <= cat_cap this is
    provably a no-op (a row in the per-image top-max_dets has class rank
    < max_dets <= cat_cap), so the gating is skipped entirely and the
    compiled program is unchanged; for max_dets > cat_cap it makes the
    fixed-size output emulate the reference's unlimited rows exactly
    whenever <= max_dets relevant rows exist per image. Set cat_cap=0 to
    disable (plain per-image top-max_dets).

    Returns:
      detections: [B, max_dets, 7] = x1,y1,x2,y2,obj,cls_conf,cls_idx
        (score-sorted; invalid rows are zeros)
      valid: [B, max_dets] bool
      relevant_count: [B] int32, only when ``return_relevant_count`` —
        number of post-NMS rows that can matter to a cat_cap-style scorer
        (kept rows with class rank < cat_cap, or all kept rows when
        cat_cap=0). relevant_count > max_dets on some image means the
        fixed-size output dropped protocol-relevant rows there.
    """
    predictions = predictions.astype(jnp.float32)
    b, n, _ = predictions.shape
    obj = predictions[..., 4]                                   # [B, N]
    cls_prob = predictions[..., 5:5 + num_classes]              # [B, N, C]

    # Two-stage top-K: a flat top_k over all N*C (box, class) pairs costs
    # ~6x more than the whole NMS (37 ms vs 5 ms at N=22743, C=80, K=2048);
    # instead pick the top K boxes by their best pair score (a pair's score
    # is bounded by its box's best), then top-K pairs among those boxes.
    # Exact whenever <= K boxes carry any above-threshold pair.
    top_k = (jax.lax.approx_max_k if topk_approx else _exact_top_k)
    k_box = min(pre_nms_topk, n)
    best_per_box = obj * jnp.max(cls_prob, axis=-1)             # [B, N]
    _, box_sel = top_k(best_per_box, k_box)                     # [B, Kb]
    box_sel = box_sel.astype(jnp.int32)
    # ONE row gather from the decoded output: the 85-wide rows carry box,
    # obj, and classes together, so neither a separate [B,N,C] class-prob
    # buffer nor an [B,N,4] xyxy buffer ever materializes (each is a
    # ~120 MB tensor at 608/b16 whose gather/layout copies dominated the
    # postprocess trace); box conversion runs on the 2048-row selection.
    sel_rows = jnp.take_along_axis(
        predictions, box_sel[..., None], axis=1)                # [B, Kb, 85]
    sel_boxes_kb = cxcywh_to_xyxy(sel_rows[..., :4])            # [B, Kb, 4]
    sel_obj_boxes = sel_rows[..., 4]                            # [B, Kb]
    sel_cls_boxes = sel_rows[..., 5:5 + num_classes]            # [B, Kb, C]

    pair_scores = sel_obj_boxes[..., None] * sel_cls_boxes      # [B, Kb, C]
    flat = pair_scores.reshape(b, k_box * num_classes)
    flat = jnp.where(flat >= conf_thre, flat, -1.0)
    k = min(pre_nms_topk, k_box * num_classes)
    top_scores, top_idx = top_k(flat, k)                        # [B, K] desc
    top_idx = top_idx.astype(jnp.int32)
    valid = top_scores >= conf_thre

    box_local = top_idx // num_classes                          # [B, K] in Kb
    cls_idx = top_idx % num_classes

    # second-stage gathers index the Kb-row selection, not the N-row field
    sel_boxes = jnp.take_along_axis(
        sel_boxes_kb, box_local[..., None], axis=1)             # [B, K, 4]
    sel_obj = jnp.take_along_axis(sel_obj_boxes, box_local, axis=1)
    sel_cls_conf = top_scores / jnp.maximum(sel_obj, 1e-16)

    # class-offset trick: disjoint coordinate islands per class. The span
    # must cover the full coordinate RANGE: decoded boxes are unclipped
    # (centers near an edge with large wh go negative), and max(|coords|)+1
    # lets a negative-coordinate box hang into the previous class's island
    # (measured IoU up to 0.25 — cross-class suppression at nms_thre<0.25).
    span = 2.0 * jnp.max(jnp.abs(sel_boxes)) + 1.0
    offset_boxes = sel_boxes + (cls_idx.astype(jnp.float32) * span)[..., None]
    # "auto": the Pallas kernel (on-the-fly VMEM IoU tiles, ~2x the XLA
    # path on chip, bit-identical results) on TPU when the candidate
    # count tiles cleanly; the XLA block-sequential path elsewhere
    use_pallas = (nms_engine == "pallas"
                  or (nms_engine == "auto"
                      and jax.default_backend() == "tpu"
                      and offset_boxes.shape[-2] % 512 == 0))
    if use_pallas:
        from yolov4_tpu.ops.nms_pallas import greedy_nms_mask_pallas
        keep = greedy_nms_mask_pallas(offset_boxes, valid, nms_thre,
                                      block=512)
    else:
        keep = greedy_nms_mask(offset_boxes, valid, nms_thre)   # [B, K]

    kept_scores = jnp.where(keep, top_scores, -1.0)
    relevant = keep  # greedy_nms_mask guarantees keep implies valid
    if cat_cap and (max_dets > cat_cap or return_relevant_count):
        rank = _rank_in_class(cls_idx, top_scores, relevant, num_classes)
        relevant = relevant & (rank < cat_cap)
        if max_dets > cat_cap:
            kept_scores = jnp.where(relevant, kept_scores, -1.0)
    d = min(max_dets, k)
    final_scores, order = jax.lax.top_k(kept_scores, d)         # [B, D]
    final_valid = final_scores > 0.0

    def take(x):
        return jnp.take_along_axis(x, order, axis=1)

    det = jnp.concatenate([
        jnp.take_along_axis(sel_boxes, order[..., None], axis=1),
        take(sel_obj)[..., None],
        take(sel_cls_conf)[..., None],
        take(cls_idx.astype(jnp.float32))[..., None],
    ], axis=-1)
    det = jnp.where(final_valid[..., None], det, 0.0)
    if return_relevant_count:
        return det, final_valid, jnp.sum(relevant, axis=-1, dtype=jnp.int32)
    return det, final_valid
