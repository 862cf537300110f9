"""First-party COCOeval tests with hand-computed AP values."""

import numpy as np
import pytest

from yolov4_tpu.eval.cocoeval import COCOEvaluator


class FakeIndex:
    """Minimal COCOIndex-compatible ground-truth container."""

    def __init__(self, anns, img_ids, cat_ids=(1,)):
        self._anns = anns
        self._img_ids = list(img_ids)
        self._cat_ids = list(cat_ids)

    def get_img_ids(self):
        return self._img_ids

    def get_cat_ids(self):
        return self._cat_ids

    def load_anns(self, img_id):
        return [a for a in self._anns if a["image_id"] == img_id]


def _gt(img, cat, bbox, iscrowd=0, area=None):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "iscrowd": iscrowd,
            "area": area if area is not None else bbox[2] * bbox[3]}


def test_perfect_detection_ap1():
    gts = [_gt(1, 1, [10, 10, 50, 50]), _gt(1, 1, [200, 200, 80, 40])]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    for g in gts:
        ev.add_detection(1, 1, g["bbox"], 0.9)
    stats = ev.evaluate(verbose=False)
    assert stats[0] == pytest.approx(1.0)   # AP
    assert stats[1] == pytest.approx(1.0)   # AP50
    assert stats[8] == pytest.approx(1.0)   # AR@100
    assert stats[3] == -1.0                 # AP-small: no small gts


def test_iou_exactly_half_matches_only_t50():
    # det (0,0,10,5) vs gt (0,0,10,10): IoU = 50/100 = 0.5 exactly
    gts = [_gt(1, 1, [0, 0, 10, 10])]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [0, 0, 10, 5], 0.9)
    stats = ev.evaluate(verbose=False)
    assert stats[1] == pytest.approx(1.0)          # AP50 = 1
    assert stats[0] == pytest.approx(0.1)          # only 1 of 10 thresholds
    assert stats[2] == pytest.approx(0.0)          # AP75 = 0


def test_duplicate_detection_does_not_reduce_ap():
    gts = [_gt(1, 1, [0, 0, 50, 50])]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.8)  # duplicate -> FP at same recall
    stats = ev.evaluate(verbose=False)
    assert stats[0] == pytest.approx(1.0)


def test_missed_gt_halves_recall():
    gts = [_gt(1, 1, [0, 0, 50, 50]), _gt(1, 1, [200, 0, 50, 50])]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)
    stats = ev.evaluate(verbose=False)
    # precision 1.0 up to recall 0.5: 51 of 101 recall points
    assert stats[0] == pytest.approx(51 / 101)
    assert stats[8] == pytest.approx(0.5)  # AR@100


def test_crowd_gt_ignored():
    gts = [_gt(1, 1, [0, 0, 50, 50], iscrowd=1)]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)
    stats = ev.evaluate(verbose=False)
    assert stats[0] == -1.0  # no countable gts anywhere


def test_crowd_absorbs_fp():
    """A det matching a crowd gt is ignored (not an FP) — the non-crowd gt
    still gives AP 1."""
    gts = [_gt(1, 1, [0, 0, 50, 50]), _gt(1, 1, [200, 0, 100, 100], iscrowd=1)]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)
    ev.add_detection(1, 1, [210, 10, 80, 80], 0.8)  # inside crowd region
    stats = ev.evaluate(verbose=False)
    assert stats[0] == pytest.approx(1.0)


def test_lower_scored_fp_after_full_recall_is_free():
    """An FP ranked below the point of full recall doesn't change AP
    (precision already sampled at all recall points)."""
    gts = [_gt(1, 1, [0, 0, 50, 50])]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)
    ev.add_detection(1, 1, [300, 300, 50, 50], 0.1)  # far away FP
    stats = ev.evaluate(verbose=False)
    assert stats[0] == pytest.approx(1.0)


def test_higher_scored_fp_hurts():
    gts = [_gt(1, 1, [0, 0, 50, 50])]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [300, 300, 50, 50], 0.95)  # FP outranks the TP
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)
    stats = ev.evaluate(verbose=False)
    # rc=[0, .5->1], pr=[0, 1/2]; interpolated precision 0.5 at all recalls
    assert stats[0] == pytest.approx(0.5)


def test_area_ranges():
    # small gt: 20x20 = 400 < 32^2; large gt: 200x200 = 40000 > 96^2
    gts = [_gt(1, 1, [0, 0, 20, 20]), _gt(1, 1, [300, 300, 200, 200])]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [0, 0, 20, 20], 0.9)     # small matched
    stats = ev.evaluate(verbose=False)
    assert stats[3] == pytest.approx(1.0)   # AP small
    assert stats[5] == pytest.approx(0.0)   # AP large: missed
    assert stats[4] == -1.0                 # AP medium: no gts


def test_maxdets_1_vs_100():
    gts = [_gt(1, 1, [0, 0, 50, 50]), _gt(1, 1, [200, 0, 50, 50])]
    ev = COCOEvaluator(FakeIndex(gts, [1]))
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)
    ev.add_detection(1, 1, [200, 0, 50, 50], 0.8)
    stats = ev.evaluate(verbose=False)
    assert stats[6] == pytest.approx(0.5)   # AR@1: only top det counts
    assert stats[8] == pytest.approx(1.0)   # AR@100


def test_multiclass_mean():
    gts = [_gt(1, 1, [0, 0, 50, 50]), _gt(1, 2, [200, 0, 50, 50])]
    ev = COCOEvaluator(FakeIndex(gts, [1], cat_ids=(1, 2)))
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)    # class 1 perfect
    # class 2: nothing detected -> AP 0
    stats = ev.evaluate(verbose=False)
    assert stats[0] == pytest.approx(0.5)


def test_score_ordering_across_images():
    """Global score sort across images: a high-scored FP in one image
    outranks a TP in another."""
    gts = [_gt(1, 1, [0, 0, 50, 50]), _gt(2, 1, [0, 0, 50, 50])]
    ev = COCOEvaluator(FakeIndex(gts, [1, 2]))
    ev.add_detection(1, 1, [0, 0, 50, 50], 0.9)     # TP img1
    ev.add_detection(2, 1, [300, 300, 50, 50], 0.95)  # FP img2, top ranked
    ev.add_detection(2, 1, [0, 0, 50, 50], 0.5)     # TP img2
    stats = ev.evaluate(verbose=False)
    # ranked: FP(0.95), TP(0.9), TP(0.5) -> pr=[0, 1/2, 2/3] rc=[0, .5, 1]
    # interp precision: max future = [2/3 until r<=0.5 ... ]
    # pr monotone from end: [2/3, 2/3, 2/3]; at all recall points -> 2/3
    assert stats[0] == pytest.approx(2 / 3)
