"""COCO validation loop (reference yolo/engine/build.py:111-190).

Batched on-device inference (the reference evaluates at batch=1 through CPU
NMS — SURVEY discrepancy #10); host work is limited to unmapping boxes to
source-image coordinates and feeding the first-party COCO evaluator.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from yolov4_tpu.eval.cocoeval import COCOEvaluator
from yolov4_tpu.ops.boxes import unmap_to_source_tlwh
from yolov4_tpu.utils.logging import get_logger
from yolov4_tpu.utils.metrics import AverageMeter

logger = get_logger(__name__)


def detections_to_coco(det: np.ndarray, valid: np.ndarray, img_info: np.ndarray,
                       class_ids: List[int]) -> List[Dict]:
    """One image's fixed-shape detections -> COCO result rows.

    det rows are x1,y1,x2,y2,obj,cls_conf,cls in model-input pixels; boxes
    unmap through the stretch-resize to source tlwh via the shared
    ops/boxes helper (reference engine/build.py:146-164,
    utils.py:281-309)."""
    src_h, src_w, dst_h, dst_w = (float(v) for v in img_info[:4])
    # letterbox geometry: img_info carries 6 geometry fields + img_id +
    # index (offsets 0 in stretch mode); older 4+2 layouts have none
    off = ((float(img_info[4]), float(img_info[5]))
           if len(img_info) >= 8 else (0.0, 0.0))
    img_id = int(img_info[-2])
    d = det[valid]
    if not d.shape[0]:
        return []
    bboxes = np.asarray(unmap_to_source_tlwh(
        d[:, :4], (src_h, src_w), (dst_h, dst_w), offset_xy=off), np.float64)
    return [{
        "image_id": img_id,
        "category_id": class_ids[int(r[6])],
        "bbox": [float(v) for v in bboxes[i]],
        "score": float(r[4] * r[5]),
    } for i, r in enumerate(d)]


def _dedup_wrap_padding(per_process: List[Tuple[List[Dict], List[int]]],
                        ) -> Tuple[List[Dict], List[int]]:
    """Drop wrap-padded duplicate images from gathered per-process results.

    The loader pads the global index list to a multiple of process_count
    by WRAPPING (data/pipeline.py _local_indices), so when the dataset
    size is not divisible by the process count the same image is
    evaluated on more than one process. Scoring it twice would count its
    ground truths twice and the duplicate detections as extra false
    positives, silently skewing AP. The copies are byte-identical (same
    index, same deterministic eval transform), so keep the first
    process's copy of each image id and drop the rest."""
    rows_out: List[Dict] = []
    ids_out: List[int] = []
    seen: set = set()
    for p_rows, p_ids in per_process:
        dup = {i for i in p_ids if i in seen}
        ids_out.extend(i for i in p_ids if i not in seen)
        rows_out.extend(r for r in p_rows if r["image_id"] not in dup)
        seen.update(p_ids)
    return rows_out, ids_out


def _gather_rows(rows: List[Dict], ids: List[int]) -> Tuple[List[Dict], List[int]]:
    """Allgather per-process detection rows + image ids to every process
    (multi-host validation: each process evaluated its loader shard).
    Rows are packed to fixed-width float64 records and padded to the max
    per-process count (allgather needs equal shapes). Wrap-padded
    duplicate images are dropped (_dedup_wrap_padding)."""
    from jax.experimental import multihost_utils

    packed = np.zeros((len(rows), 7), np.float64)
    for i, r in enumerate(rows):
        packed[i] = [r["image_id"], r["category_id"], *r["bbox"], r["score"]]
    id_arr = np.asarray(ids, np.float64)

    counts = multihost_utils.process_allgather(
        np.array([len(rows), len(ids)], np.int64))
    max_rows, max_ids = int(counts[:, 0].max()), int(counts[:, 1].max())
    packed = np.pad(packed, ((0, max_rows - len(rows)), (0, 0)))
    id_arr = np.pad(id_arr, (0, max_ids - len(ids)))
    all_rows = multihost_utils.process_allgather(packed)     # [P, max, 7]
    all_ids = multihost_utils.process_allgather(id_arr)      # [P, max]

    per_process = []
    for p in range(all_rows.shape[0]):
        p_rows = [{"image_id": int(r[0]), "category_id": int(r[1]),
                   "bbox": [float(v) for v in r[2:6]],
                   "score": float(r[6])}
                  for r in all_rows[p, :int(counts[p, 0])]]
        p_ids = [int(v) for v in all_ids[p, :int(counts[p, 1])]]
        per_process.append((p_rows, p_ids))
    return _dedup_wrap_padding(per_process)


def validate(val_loader, predictor, conf_threshold: Optional[float] = None,
             nms_threshold: Optional[float] = None,
             verbose: bool = True) -> Tuple[float, float]:
    """Run COCO eval; returns (AP[.50:.95], AP50) like the reference.

    Threshold overrides are CALL-SCOPED (restored on exit): an AP sweep
    at conf 0.001 must not leave a reused predictor flooding later
    detection/serving calls with low-confidence rows. The thresholds are
    traced jit arguments, so swapping them costs no recompile."""
    saved = (predictor.conf_thre, predictor.nms_thre)
    if conf_threshold is not None:
        predictor.conf_thre = conf_threshold
    if nms_threshold is not None:
        predictor.nms_thre = nms_threshold
    try:
        return _validate(val_loader, predictor, verbose)
    finally:
        predictor.conf_thre, predictor.nms_thre = saved


def _validate(val_loader, predictor,
              verbose: bool = True) -> Tuple[float, float]:

    dataset = val_loader.dataset
    batch_time = AverageMeter()
    rows: List[Dict] = []
    ids: List[int] = []

    fetch = getattr(predictor, "fetch_local", np.asarray)
    # when the predictor counts scoring-relevant rows (max_dets deeper than
    # the per-(image,category) cap), prove the fixed-size output lossless:
    # any image with relevant_count > max_dets lost protocol rows
    overflow = {"images": 0, "max_relevant": 0, "counted": False}

    def consume(pending):
        det_fut, valid_fut, nrel_fut, infos, mask = pending
        det = fetch(det_fut)
        valid = fetch(valid_fut)
        if nrel_fut is not None:
            nrel = fetch(nrel_fut)[: len(mask)][np.asarray(mask, bool)]
            overflow["counted"] = True
            if nrel.size:
                overflow["images"] += int(
                    (nrel > det.shape[1]).sum())
                overflow["max_relevant"] = max(overflow["max_relevant"],
                                               int(nrel.max()))
        for i in range(len(mask)):
            if not mask[i]:
                continue
            ids.append(int(infos[i][-2]))
            rows.extend(detections_to_coco(det[i], valid[i], infos[i],
                                           dataset.class_ids))

    # pipelined: keep a few batches in flight so host unmapping + transfers
    # overlap device execution (transfer latency dominates via the tunnel)
    from collections import deque
    end = time.time()
    n_batches = len(val_loader)
    inflight: deque = deque()
    for bi, (imgs, target) in enumerate(val_loader):
        out = predictor.dispatch(imgs)
        inflight.append((out[0], out[1], out[2] if len(out) > 2 else None,
                         target["img_info"], target["batch_mask"]))
        if len(inflight) > 3:
            consume(inflight.popleft())
        batch_time.update(time.time() - end)
        end = time.time()
        if verbose and (bi + 1) % 50 == 0:
            ips = imgs.shape[0] / max(batch_time.avg, 1e-9)
            logger.info(f"eval [{bi + 1}/{n_batches}] "
                        f"{batch_time.val:.3f}s/batch ({ips:.1f} img/s)")
    while inflight:
        consume(inflight.popleft())

    if verbose:
        logger.info(f"eval done: {len(ids)} images, {len(rows)} detections, "
                    f"avg {batch_time.avg:.3f}s/batch")
    if overflow["counted"]:
        if overflow["images"]:
            logger.warning(
                f"max_dets overflow on {overflow['images']} images (up to "
                f"{overflow['max_relevant']} scoring-relevant rows vs "
                f"max_dets {predictor.max_dets}): the fixed-size output "
                f"dropped rows pycocotools' per-(image,category) cap would "
                f"have scored — raise TEST.MAX_DETS")
        elif verbose:
            logger.info(
                f"max_dets lossless: <= {overflow['max_relevant']} "
                f"scoring-relevant rows/image (cap {predictor.max_dets})")

    multi_process = jax.process_count() > 1
    if multi_process:
        # lockstep before the allgather's first gloo context creation
        # (its ~30 s rendezvous; see parallel.mesh.coordinator_lockstep)
        from yolov4_tpu.parallel.mesh import coordinator_lockstep
        coordinator_lockstep("gather_rows")
        rows, ids = _gather_rows(rows, ids)
        # explicit barrier: the reference's synchronize() was only a CUDA
        # sync (utils.py:27-29); without one, non-primary processes run
        # ahead into the next epoch's first collective while rank 0 scores
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("validate_done")

    if not rows or (multi_process and jax.process_index() != 0):
        stats01 = np.zeros(2)
    else:
        evaluator = COCOEvaluator(dataset.coco, img_ids=ids,
                                  cat_ids=dataset.class_ids)
        evaluator.add_detections(rows)
        stats = evaluator.evaluate(verbose=verbose)
        stats01 = np.array([float(stats[0]), float(stats[1])])
    if multi_process:
        from jax.experimental import multihost_utils
        stats01 = multihost_utils.broadcast_one_to_all(stats01)
    return float(stats01[0]), float(stats01[1])
