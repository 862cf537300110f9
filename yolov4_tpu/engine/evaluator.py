"""COCO validation loop (reference yolo/engine/build.py:111-190).

Batched on-device inference (the reference evaluates at batch=1 through CPU
NMS — SURVEY discrepancy #10); host work is limited to unmapping boxes to
source-image coordinates and feeding the first-party COCO evaluator.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from yolov4_tpu.eval.cocoeval import COCOEvaluator
from yolov4_tpu.utils.logging import get_logger
from yolov4_tpu.utils.metrics import AverageMeter

logger = get_logger(__name__)


def detections_to_coco(det: np.ndarray, valid: np.ndarray, img_info: np.ndarray,
                       class_ids: List[int]) -> List[Dict]:
    """One image's fixed-shape detections -> COCO result rows.

    det rows are x1,y1,x2,y2,obj,cls_conf,cls in model-input pixels; boxes
    unmap through the stretch-resize to source tlwh (reference
    engine/build.py:146-164, utils.py:281-309)."""
    src_h, src_w, dst_h, dst_w = img_info[:4]
    img_id = int(img_info[-2])
    rows = []
    for r in det[valid]:
        x1, y1, x2, y2 = r[:4]
        bbox = [float(x1 / dst_w * src_w), float(y1 / dst_h * src_h),
                float((x2 - x1) / dst_w * src_w), float((y2 - y1) / dst_h * src_h)]
        rows.append({
            "image_id": img_id,
            "category_id": class_ids[int(r[6])],
            "bbox": bbox,
            "score": float(r[4] * r[5]),
        })
    return rows


def validate(val_loader, predictor, conf_threshold: Optional[float] = None,
             nms_threshold: Optional[float] = None,
             verbose: bool = True) -> Tuple[float, float]:
    """Run COCO eval; returns (AP[.50:.95], AP50) like the reference."""
    if conf_threshold is not None:
        predictor.conf_thre = conf_threshold
    if nms_threshold is not None:
        predictor.nms_thre = nms_threshold

    dataset = val_loader.dataset
    batch_time = AverageMeter()
    rows: List[Dict] = []
    ids: List[int] = []

    def consume(pending):
        det_fut, valid_fut, infos, mask = pending
        det, valid = np.asarray(det_fut), np.asarray(valid_fut)
        for i in range(len(mask)):
            if not mask[i]:
                continue
            ids.append(int(infos[i][-2]))
            rows.extend(detections_to_coco(det[i], valid[i], infos[i],
                                           dataset.class_ids))

    # pipelined: dispatch batch i, then consume batch i-1 while i runs
    end = time.time()
    n_batches = len(val_loader)
    pending = None
    for bi, (imgs, target) in enumerate(val_loader):
        det_fut, valid_fut = predictor.dispatch(imgs)
        if pending is not None:
            consume(pending)
        pending = (det_fut, valid_fut, target["img_info"], target["batch_mask"])
        batch_time.update(time.time() - end)
        end = time.time()
        if verbose and (bi + 1) % 50 == 0:
            ips = imgs.shape[0] / max(batch_time.avg, 1e-9)
            logger.info(f"eval [{bi + 1}/{n_batches}] "
                        f"{batch_time.val:.3f}s/batch ({ips:.1f} img/s)")
    if pending is not None:
        consume(pending)

    if verbose:
        logger.info(f"eval done: {len(ids)} images, {len(rows)} detections, "
                    f"avg {batch_time.avg:.3f}s/batch")

    if not rows:
        return 0.0, 0.0
    evaluator = COCOEvaluator(dataset.coco, img_ids=ids,
                              cat_ids=dataset.class_ids)
    evaluator.add_detections(rows)
    stats = evaluator.evaluate(verbose=verbose)
    return float(stats[0]), float(stats[1])
