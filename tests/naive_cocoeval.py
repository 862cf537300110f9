"""Naive, line-faithful re-port of the pycocotools COCOeval bbox algorithm.

This is a differential-testing ORACLE, not production code: every loop is
kept in the exact shape of pycocotools.cocoeval.COCOeval (computeIoU /
evaluateImg / accumulate / summarize, bbox iouType), written independently
from the published algorithm description so that
yolov4_tpu.eval.cocoeval.COCOEvaluator (restructured + vectorized + native
matching) can be fuzzed against it (tests/test_cocoeval_diff.py).

One deliberate deviation, shared with the fast implementation: the gt
ignore flag is `ann.ignore OR ann.iscrowd` (pycocotools derives it from
iscrowd for bbox eval; COCO detection ground truth carries no `ignore`
field, so the two rules coincide on real data).
"""

from collections import defaultdict

import numpy as np


def _bb_iou(d, g, crowd):
    """maskUtils.iou for a single tlwh pair; crowd uses union = dt area."""
    dx1, dy1, dw, dh = d
    gx1, gy1, gw, gh = g
    iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
    ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
    if iw <= 0 or ih <= 0:
        inter = 0.0
    else:
        inter = iw * ih
    da = dw * dh
    ga = gw * gh
    union = da if crowd else da + ga - inter
    if union <= 0:
        return 0.0
    return inter / union


class NaiveCOCOeval:
    """pycocotools-shaped evaluator over in-memory gt/dt annotation lists.

    gts rows: {image_id, category_id, bbox tlwh, [iscrowd], [area], [ignore]}
    dts rows: {image_id, category_id, bbox tlwh, score}
    """

    def __init__(self, gts, dts, img_ids, cat_ids):
        self.iouThrs = np.linspace(0.5, 0.95, 10)
        self.recThrs = np.linspace(0.0, 1.00, 101)
        self.maxDets = [1, 10, 100]
        self.areaRng = [[0.0, 1e10], [0.0, 32 ** 2],
                        [32 ** 2, 96 ** 2], [96 ** 2, 1e10]]
        self.areaRngLbl = ["all", "small", "medium", "large"]
        self.imgIds = list(img_ids)
        self.catIds = sorted(cat_ids)
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for i, g in enumerate(gts):
            g = dict(g)
            g["id"] = i + 1  # pycocotools ann ids are positive
            if "area" not in g:
                g["area"] = g["bbox"][2] * g["bbox"][3]
            g["iscrowd"] = int(g.get("iscrowd", 0))
            g["ignore"] = 1 if (g.get("ignore", 0) or g["iscrowd"]) else 0
            self._gts[g["image_id"], g["category_id"]].append(g)
        for i, d in enumerate(dts):
            d = dict(d)
            d["id"] = i + 1
            d["area"] = d["bbox"][2] * d["bbox"][3]
            self._dts[d["image_id"], d["category_id"]].append(d)

    # -- computeIoU ----------------------------------------------------
    def computeIoU(self, imgId, catId):
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > self.maxDets[-1]:
            dt = dt[0:self.maxDets[-1]]
        ious = np.zeros((len(dt), len(gt)))
        for di, d in enumerate(dt):
            for gi, g in enumerate(gt):
                ious[di, gi] = _bb_iou(d["bbox"], g["bbox"], g["iscrowd"])
        return ious

    # -- evaluateImg ----------------------------------------------------
    def evaluateImg(self, imgId, catId, aRng, maxDet):
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g["ignore"] or (g["area"] < aRng[0] or g["area"] > aRng[1]):
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        ious = (self.ious[imgId, catId][:, gtind]
                if len(self.ious[imgId, catId]) > 0
                else self.ious[imgId, catId])

        T = len(self.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if not len(ious) == 0:
            for tind, t in enumerate(self.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < aRng[0] or d["area"] > aRng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    # -- evaluate / accumulate -------------------------------------------
    def evaluate(self):
        self.ious = {(imgId, catId): self.computeIoU(imgId, catId)
                     for imgId in self.imgIds for catId in self.catIds}
        self.evalImgs = {}
        for k, catId in enumerate(self.catIds):
            for a, aRng in enumerate(self.areaRng):
                for i, imgId in enumerate(self.imgIds):
                    self.evalImgs[k, a, i] = self.evaluateImg(
                        imgId, catId, aRng, self.maxDets[-1])

    def accumulate(self):
        T = len(self.iouThrs)
        R = len(self.recThrs)
        K = len(self.catIds)
        A = len(self.areaRng)
        M = len(self.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k in range(K):
            for a in range(A):
                for m, maxDet in enumerate(self.maxDets):
                    E = [self.evalImgs[k, a, i]
                         for i in range(len(self.imgIds))]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm),
                                         np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        tp = np.array(tp)
                        fp = np.array(fp)
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, self.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        self.precision = precision
        self.recall = recall

    # -- summarize -------------------------------------------------------
    def _summarize_one(self, ap, iouThr, areaLbl, maxDet):
        a = self.areaRngLbl.index(areaLbl)
        m = self.maxDets.index(maxDet)
        if ap:
            s = self.precision
            if iouThr is not None:
                s = s[np.where(np.isclose(self.iouThrs, iouThr))[0]]
            s = s[:, :, :, a, m]
        else:
            s = self.recall
            if iouThr is not None:
                s = s[np.where(np.isclose(self.iouThrs, iouThr))[0]]
            s = s[:, :, a, m]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    def summarize(self):
        rows = [
            (True, None, "all", 100), (True, 0.5, "all", 100),
            (True, 0.75, "all", 100), (True, None, "small", 100),
            (True, None, "medium", 100), (True, None, "large", 100),
            (False, None, "all", 1), (False, None, "all", 10),
            (False, None, "all", 100), (False, None, "small", 100),
            (False, None, "medium", 100), (False, None, "large", 100),
        ]
        self.stats = np.array([self._summarize_one(*r) for r in rows])
        return self.stats

    def run(self):
        self.evaluate()
        self.accumulate()
        return self.summarize()
