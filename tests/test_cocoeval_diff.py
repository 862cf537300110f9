"""Differential fuzzing of the fast first-party COCOeval against a naive
line-faithful port of the pycocotools algorithm (tests/naive_cocoeval.py).

1000+ randomized scenarios stressing every divergence-prone corner:
score ties (quantized scores, stable-sort order), crowd gts, explicit
ignore flags, area-range boundary values (exactly 32^2 / 96^2), degenerate
zero-size boxes, duplicate detections, empty images, categories with gts
but no dts (and vice versa), maxDet truncation, and cross-image global
ranking. Both implementations must agree to 1e-9 on all 12 stats,
including the -1 'no data' sentinels.
"""

import numpy as np
import pytest

from yolov4_tpu.eval import cocoeval
from yolov4_tpu.eval.cocoeval import COCOEvaluator

from naive_cocoeval import NaiveCOCOeval


class FakeIndex:
    def __init__(self, anns, img_ids, cat_ids):
        self._by_img = {}
        for a in anns:
            self._by_img.setdefault(a["image_id"], []).append(a)
        self._img_ids = list(img_ids)
        self._cat_ids = list(cat_ids)

    def get_img_ids(self):
        return self._img_ids

    def get_cat_ids(self):
        return self._cat_ids

    def load_anns(self, img_id):
        return self._by_img.get(img_id, [])


# sizes chosen to straddle the small/medium (32^2) and medium/large (96^2)
# area boundaries exactly, plus degenerate zeros
_SIZES = [0.0, 4.0, 10.0, 30.0, 32.0, 33.0, 95.0, 96.0, 97.0, 200.0]
_AREAS = [100.0, 1024.0, 1025.0, 9216.0, 9217.0, 1e5]


def _random_case(rng):
    n_img = int(rng.integers(1, 5))
    n_cat = int(rng.integers(1, 4))
    img_ids = list(range(1, n_img + 1))
    cat_ids = [int(c) for c in
               rng.choice([1, 2, 3, 7, 11], size=n_cat, replace=False)]
    gts, dts = [], []
    for img in img_ids:
        for cat in cat_ids:
            for _ in range(int(rng.integers(0, 5))):
                g = {"image_id": img, "category_id": cat,
                     "bbox": [float(rng.integers(0, 8) * 25),
                              float(rng.integers(0, 8) * 25),
                              float(rng.choice(_SIZES)),
                              float(rng.choice(_SIZES))]}
                if rng.random() < 0.2:
                    g["iscrowd"] = 1
                if rng.random() < 0.15:
                    g["ignore"] = 1
                if rng.random() < 0.2:
                    # area field diverging from bbox w*h (segmentation areas do)
                    g["area"] = float(rng.choice(_AREAS))
                gts.append(g)
            for _ in range(int(rng.integers(0, 7))):
                if gts and rng.random() < 0.6:
                    src = gts[int(rng.integers(0, len(gts)))]["bbox"]
                    if rng.random() < 0.5:
                        bb = list(src)  # exact duplicate of a gt box
                    else:
                        bb = [src[0] + float(rng.integers(-5, 6)),
                              src[1] + float(rng.integers(-5, 6)),
                              max(0.0, src[2] + float(rng.integers(-8, 9))),
                              max(0.0, src[3] + float(rng.integers(-8, 9)))]
                else:
                    bb = [float(rng.integers(0, 8) * 25),
                          float(rng.integers(0, 8) * 25),
                          float(rng.choice(_SIZES)),
                          float(rng.choice(_SIZES))]
                # quantized scores force ties -> stable-sort order matters
                dts.append({"image_id": img, "category_id": cat, "bbox": bb,
                            "score": float(rng.integers(1, 10)) / 10.0})
    return gts, dts, img_ids, cat_ids


def _run_both(gts, dts, img_ids, cat_ids):
    fast = COCOEvaluator(FakeIndex(gts, img_ids, cat_ids),
                         img_ids=img_ids, cat_ids=cat_ids)
    fast.add_detections(dts)
    fast_stats = fast.evaluate(verbose=False)
    naive_stats = NaiveCOCOeval(gts, dts, img_ids, cat_ids).run()
    return fast_stats, naive_stats


def _check_seeds(seeds):
    for seed in seeds:
        rng = np.random.default_rng(seed)
        gts, dts, img_ids, cat_ids = _random_case(rng)
        fast_stats, naive_stats = _run_both(gts, dts, img_ids, cat_ids)
        np.testing.assert_allclose(
            fast_stats, naive_stats, rtol=0, atol=1e-9,
            err_msg=f"stats diverged at seed {seed}")


@pytest.mark.parametrize("block", range(5))
def test_fuzz_200_cases_each(block):
    _check_seeds(range(block * 200, (block + 1) * 200))


def test_fuzz_numpy_fallback_path(monkeypatch):
    """Same fuzz through the pure-numpy matcher (native kernel disabled)."""
    monkeypatch.setattr(cocoeval, "_match_batch", cocoeval._match_batch_numpy)
    _check_seeds(range(10_000, 10_150))


def test_native_and_numpy_matchers_agree():
    """The two matcher backends must be bit-identical, not just stats-close."""
    if not cocoeval.native.available():
        pytest.skip("native toolchain unavailable")
    for seed in range(200):
        rng = np.random.default_rng(20_000 + seed)
        n_d, n_g = int(rng.integers(0, 12)), int(rng.integers(0, 9))
        ious = np.round(rng.random((n_d, n_g)), 2).astype(np.float64)
        g_ig = rng.integers(0, 2, n_g).astype(np.uint8)
        crowd = (rng.random(n_g) < 0.3).astype(np.uint8)
        d_out = rng.integers(0, 2, n_d).astype(np.uint8)
        nd = np.array([n_d], np.int64)
        ng = np.array([n_g], np.int64)
        nat = cocoeval.native.coco_match_batch(
            ious.reshape(-1), g_ig, crowd, d_out, nd, ng, cocoeval.IOU_THRS)
        ref = cocoeval._match_batch_numpy(
            ious.reshape(-1), g_ig, crowd, d_out, nd, ng)
        np.testing.assert_array_equal(nat[0], ref[0], err_msg=f"seed {seed}")
        np.testing.assert_array_equal(nat[1], ref[1], err_msg=f"seed {seed}")


def test_edge_no_detections():
    gts = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50]}]
    fast_stats, naive_stats = _run_both(gts, [], [1], [1])
    np.testing.assert_allclose(fast_stats, naive_stats, atol=1e-9)
    assert fast_stats[0] == 0.0  # gts exist, nothing found -> AP 0, not -1


def test_edge_no_gts():
    dts = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50],
            "score": 0.9}]
    fast_stats, naive_stats = _run_both([], dts, [1], [1])
    np.testing.assert_allclose(fast_stats, naive_stats, atol=1e-9)
    assert fast_stats[0] == -1.0  # no countable gts anywhere


def test_edge_all_scores_tied():
    rng = np.random.default_rng(7)
    gts, dts = [], []
    for img in (1, 2, 3):
        for k in range(4):
            gts.append({"image_id": img, "category_id": 1,
                        "bbox": [k * 60.0, 0.0, 50.0, 50.0]})
            dts.append({"image_id": img, "category_id": 1,
                        "bbox": [k * 60.0 + float(rng.integers(0, 12)), 0.0,
                                 50.0, 50.0], "score": 0.5})
    fast_stats, naive_stats = _run_both(gts, dts, [1, 2, 3], [1])
    np.testing.assert_allclose(fast_stats, naive_stats, atol=1e-9)


def test_edge_more_than_100_dets_truncated():
    """maxDet cap: 120 dets in one (img, cat); only top-100 by score count."""
    gts = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50]}]
    dts = [{"image_id": 1, "category_id": 1,
            "bbox": [200.0 + i, 200.0, 20.0, 20.0],
            "score": 1.0 - i * 0.005} for i in range(119)]
    dts.append({"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50],
                "score": 0.01})  # the only TP, ranked last -> truncated away
    fast_stats, naive_stats = _run_both(gts, dts, [1], [1])
    np.testing.assert_allclose(fast_stats, naive_stats, atol=1e-9)
    assert fast_stats[0] == 0.0
