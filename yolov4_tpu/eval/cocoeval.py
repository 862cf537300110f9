"""COCO detection mAP evaluation (first-party COCOeval).

pycocotools is not available in this image, so the full COCOeval bbox
protocol is implemented here and produces the standard 12-number summary
(AP/AP50/AP75/AP-s/m/l, AR@1/10/100, AR-s/m/l) with the same matching
rules as pycocotools.cocoeval.COCOeval:

  * IoU thresholds 0.50:0.05:0.95, 101-point recall interpolation,
  * greedy per-detection matching in score order against the best
    still-available gt (crowd gts match many detections; IoU vs crowd is
    intersection over detection area),
  * gt ignore = iscrowd or area outside the range; ignored gts sort last
    and matches to them don't count as TP or FP,
  * unmatched detections outside the area range are ignored,
  * stable mergesort score ordering for determinism.

The reference ran pycocotools via a temp JSON round-trip
(engine/build.py:176-188); here detections are accumulated in memory.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
AREA_ORDER = ("all", "small", "medium", "large")


def _iou_tlwh(dts: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """pycocotools maskUtils.iou for tlwh boxes: crowd gts use union=dt area."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    dx1, dy1 = dts[:, 0], dts[:, 1]
    dx2, dy2 = dts[:, 0] + dts[:, 2], dts[:, 1] + dts[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]

    iw = np.minimum(dx2[:, None], gx2[None, :]) - np.maximum(dx1[:, None], gx1[None, :])
    ih = np.minimum(dy2[:, None], gy2[None, :]) - np.maximum(dy1[:, None], gy1[None, :])
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    area_d = (dts[:, 2] * dts[:, 3])[:, None]
    area_g = (gts[:, 2] * gts[:, 3])[None, :]
    union = np.where(iscrowd[None, :].astype(bool), area_d,
                     area_d + area_g - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


class COCOEvaluator:
    """Accumulate detections, then score against a COCOIndex ground truth.

    Detections: dicts {image_id, category_id, bbox (tlwh), score} — the COCO
    results-JSON row format the reference emits (engine/build.py:159-164).
    """

    def __init__(self, coco_index, img_ids: Optional[Sequence[int]] = None,
                 cat_ids: Optional[Sequence[int]] = None):
        self.coco = coco_index
        self.img_ids = list(img_ids) if img_ids is not None else coco_index.get_img_ids()
        self.cat_ids = sorted(cat_ids) if cat_ids is not None else sorted(
            coco_index.get_cat_ids())
        self._dts: Dict[tuple, List[Dict]] = defaultdict(list)
        self.stats: Optional[np.ndarray] = None

    def add_detection(self, image_id: int, category_id: int,
                      bbox_tlwh: Sequence[float], score: float) -> None:
        self._dts[(int(image_id), int(category_id))].append(
            {"bbox": np.asarray(bbox_tlwh, np.float64), "score": float(score)})

    def add_detections(self, rows: Sequence[Dict]) -> None:
        for row in rows:
            self.add_detection(row["image_id"], row["category_id"],
                               row["bbox"], row["score"])

    # ------------------------------------------------------------------
    def _gts_for(self, img_id: int, cat_id: int) -> List[Dict]:
        out = []
        for ann in self.coco.load_anns(img_id):
            if ann["category_id"] != cat_id:
                continue
            out.append({
                "bbox": np.asarray(ann["bbox"], np.float64),
                "area": float(ann.get("area",
                                      ann["bbox"][2] * ann["bbox"][3])),
                "iscrowd": int(ann.get("iscrowd", 0)),
                "ignore": int(ann.get("ignore", 0)) or int(ann.get("iscrowd", 0)),
            })
        return out

    def _evaluate_img(self, gts: List[Dict], dts: List[Dict], area_rng,
                      max_det: int):
        """pycocotools evaluateImg equivalent. Returns per-image match data."""
        if len(gts) == 0 and len(dts) == 0:
            return None
        t_count = len(IOU_THRS)

        g_ignore = np.array(
            [g["ignore"] or g["area"] < area_rng[0] or g["area"] > area_rng[1]
             for g in gts], np.float64)
        g_order = np.argsort(g_ignore, kind="mergesort")
        gts = [gts[i] for i in g_order]
        g_ignore = g_ignore[g_order]
        iscrowd = np.array([g["iscrowd"] for g in gts], np.int32)

        d_scores = np.array([d["score"] for d in dts], np.float64)
        d_order = np.argsort(-d_scores, kind="mergesort")[:max_det]
        dts = [dts[i] for i in d_order]

        ious = _iou_tlwh(
            np.array([d["bbox"] for d in dts]).reshape(len(dts), 4),
            np.array([g["bbox"] for g in gts]).reshape(len(gts), 4),
            iscrowd)

        n_d, n_g = len(dts), len(gts)
        gtm = np.zeros((t_count, n_g), np.int64) - 1
        dtm = np.zeros((t_count, n_d), np.int64) - 1
        dt_ig = np.zeros((t_count, n_d), np.float64)
        for ti, t in enumerate(IOU_THRS):
            for di in range(n_d):
                best_iou = min(t, 1 - 1e-10)
                best_g = -1
                for gi in range(n_g):
                    if gtm[ti, gi] >= 0 and not iscrowd[gi]:
                        continue
                    if best_g > -1 and g_ignore[best_g] == 0 and g_ignore[gi] == 1:
                        break  # gts sorted: rest are all ignored
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    best_g = gi
                if best_g == -1:
                    continue
                dt_ig[ti, di] = g_ignore[best_g]
                dtm[ti, di] = best_g
                gtm[ti, best_g] = di

        # ignore unmatched detections outside the area range
        d_area = np.array([d["bbox"][2] * d["bbox"][3] for d in dts], np.float64)
        outside = (d_area < area_rng[0]) | (d_area > area_rng[1])
        dt_ig = np.logical_or(dt_ig, (dtm == -1) & outside[None, :])

        return {
            "dt_scores": np.array([d["score"] for d in dts], np.float64),
            "dt_matched": dtm >= 0,
            "dt_ignore": dt_ig,
            "n_gt": int(np.count_nonzero(g_ignore == 0)),
        }

    def evaluate(self, verbose: bool = True) -> np.ndarray:
        """Run the full protocol; returns the 12-entry stats vector."""
        t_count, r_count = len(IOU_THRS), len(REC_THRS)
        k_count, a_count, m_count = len(self.cat_ids), len(AREA_ORDER), len(MAX_DETS)
        precision = -np.ones((t_count, r_count, k_count, a_count, m_count))
        recall = -np.ones((t_count, k_count, a_count, m_count))

        max_det_cap = max(MAX_DETS)
        for ki, cat_id in enumerate(self.cat_ids):
            per_img = []
            for img_id in self.img_ids:
                gts = self._gts_for(img_id, cat_id)
                dts = self._dts.get((img_id, cat_id), [])
                per_img.append((gts, dts))
            if all(len(g) == 0 and len(d) == 0 for g, d in per_img):
                continue
            for ai, a_lbl in enumerate(AREA_ORDER):
                a_rng = AREA_RNG[a_lbl]
                evals = [self._evaluate_img(g, d, a_rng, max_det_cap)
                         for g, d in per_img]
                for mi, max_det in enumerate(MAX_DETS):
                    self._accumulate(evals, max_det, precision, recall,
                                     ki, ai, mi)

        self._precision = precision
        self._recall = recall
        self.stats = self._summarize(verbose)
        return self.stats

    @staticmethod
    def _accumulate(evals, max_det, precision, recall, ki, ai, mi):
        scores, matched, ignored, n_gt = [], [], [], 0
        for e in evals:
            if e is None:
                continue
            scores.append(e["dt_scores"][:max_det])
            matched.append(e["dt_matched"][:, :max_det])
            ignored.append(e["dt_ignore"][:, :max_det])
            n_gt += e["n_gt"]
        if n_gt == 0:
            return
        scores = np.concatenate(scores) if scores else np.zeros(0)
        order = np.argsort(-scores, kind="mergesort")
        matched = (np.concatenate(matched, axis=1) if matched
                   else np.zeros((len(IOU_THRS), 0), bool))[:, order]
        ignored = (np.concatenate(ignored, axis=1) if ignored
                   else np.zeros((len(IOU_THRS), 0), bool))[:, order]

        tps = matched & ~ignored.astype(bool)
        fps = ~matched & ~ignored.astype(bool)
        tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
        fp_sum = np.cumsum(fps, axis=1).astype(np.float64)

        for ti in range(len(IOU_THRS)):
            tp, fp = tp_sum[ti], fp_sum[ti]
            rc = tp / n_gt
            pr = tp / np.maximum(tp + fp, np.spacing(1))
            recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0

            # monotone-decreasing interpolation of precision
            pr = pr.tolist()
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds = np.searchsorted(rc, REC_THRS, side="left")
            q = np.zeros(len(REC_THRS))
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            precision[ti, :, ki, ai, mi] = q

    # ------------------------------------------------------------------
    def _summary_value(self, ap: bool, iou: Optional[float], area: str,
                       max_det: int) -> float:
        ai = AREA_ORDER.index(area)
        mi = MAX_DETS.index(max_det)
        if ap:
            s = self._precision
            s = s[:, :, :, ai, mi] if iou is None else \
                s[np.where(np.isclose(IOU_THRS, iou))[0], :, :, ai, mi]
        else:
            s = self._recall
            s = s[:, :, ai, mi] if iou is None else \
                s[np.where(np.isclose(IOU_THRS, iou))[0], :, ai, mi]
        valid = s[s > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    def _summarize(self, verbose: bool) -> np.ndarray:
        rows = [
            (True, None, "all", 100), (True, 0.5, "all", 100),
            (True, 0.75, "all", 100), (True, None, "small", 100),
            (True, None, "medium", 100), (True, None, "large", 100),
            (False, None, "all", 1), (False, None, "all", 10),
            (False, None, "all", 100), (False, None, "small", 100),
            (False, None, "medium", 100), (False, None, "large", 100),
        ]
        stats = np.array([self._summary_value(*r) for r in rows])
        if verbose:
            for (ap, iou, area, md), v in zip(rows, stats):
                kind = "Average Precision" if ap else "Average Recall"
                metric = "(AP)" if ap else "(AR)"
                iou_s = "0.50:0.95" if iou is None else f"{iou:0.2f}"
                print(f" {kind:<18} {metric} @[ IoU={iou_s:<9} | "
                      f"area={area:>6s} | maxDets={md:>3d} ] = {v:0.3f}")
        return stats
