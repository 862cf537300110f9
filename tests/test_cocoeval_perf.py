"""COCOeval host-time perf gate: full val2017-scale synthetic evaluation.

The reference's per-epoch scoring cost was pycocotools' C IoU kernel plus
its Python match loop (yolo/engine/build.py:176-188); the first-party
evaluator must not become the per-epoch validation bottleneck. Gate:
5000 images x 80 categories x 100 detections/image (500k detection rows,
val2017's maxDet-capped shape) in under 60 s of host time.
"""

import time

import numpy as np
import pytest

from yolov4_tpu.eval.cocoeval import COCOEvaluator


class _Idx:
    def __init__(self, anns, img_ids, cat_ids):
        self._by = {}
        for a in anns:
            self._by.setdefault(a["image_id"], []).append(a)
        self._img_ids = img_ids
        self._cat_ids = cat_ids

    def get_img_ids(self):
        return self._img_ids

    def get_cat_ids(self):
        return self._cat_ids

    def load_anns(self, img_id):
        return self._by.get(img_id, [])


def test_val2017_scale_under_60s():
    rng = np.random.default_rng(0)
    n_img, n_cat = 5000, 80
    img_ids = list(range(1, n_img + 1))
    cat_ids = list(range(1, n_cat + 1))

    anns = []
    gts_by_img = {}
    for img in img_ids:
        mine = []
        for _ in range(7):  # ~35k gts, like val2017
            a = {"image_id": img,
                 "category_id": int(rng.integers(1, n_cat + 1)),
                 "bbox": [float(rng.uniform(0, 500)),
                          float(rng.uniform(0, 500)),
                          float(rng.uniform(1, 120)),
                          float(rng.uniform(1, 120))],
                 "iscrowd": int(rng.random() < 0.02)}
            anns.append(a)
            mine.append(a)
        gts_by_img[img] = mine

    dts = []
    for img in img_ids:
        mine = gts_by_img[img]
        for k in range(100):
            if k % 2 == 0:  # half perturb a real gt -> dense TP matching
                src = mine[k % len(mine)]
                bb = [src["bbox"][0] + float(rng.uniform(-4, 4)),
                      src["bbox"][1] + float(rng.uniform(-4, 4)),
                      max(1.0, src["bbox"][2] * float(rng.uniform(0.9, 1.1))),
                      max(1.0, src["bbox"][3] * float(rng.uniform(0.9, 1.1)))]
                cat = src["category_id"]
            else:
                bb = [float(rng.uniform(0, 500)), float(rng.uniform(0, 500)),
                      float(rng.uniform(1, 120)), float(rng.uniform(1, 120))]
                cat = int(rng.integers(1, n_cat + 1))
            dts.append({"image_id": img, "category_id": cat, "bbox": bb,
                        "score": float(rng.random())})

    ev = COCOEvaluator(_Idx(anns, img_ids, cat_ids))
    t0 = time.time()
    ev.add_detections(dts)
    stats = ev.evaluate(verbose=False)
    elapsed = time.time() - t0

    assert stats.shape == (12,)
    assert 0.0 < stats[0] < 1.0  # sane AP on the mixed TP/noise set
    assert 0.5 < stats[8] <= 1.0  # AR@100: half the dets track gts
    assert elapsed < 60.0, f"5k-image eval took {elapsed:.1f}s (budget 60s)"
