"""Published-protocol rehearsal for the eval pipeline.

The reference's headline 0.359 AP was measured at conf-thre 0.0001 /
NMS-thre 0.4 / 608x608 (reference val.py:36-38, README.md:122) — a regime
where virtually every box carries some above-threshold (box, class) pair,
so the on-device pipeline's pre_nms_topk candidate cap is actually
exercised. These tests pin down what that cap costs:

  * dense-candidate parity vs the reference CPU postprocess
    (yolo/util/utils.py:92-223) at exactly the published thresholds: the
    top-scoring survivors must agree row-for-row (greedy NMS has a prefix
    property — survivors among the top-K score-ranked candidates are
    unaffected by candidates ranked below K);
  * an AP ablation of pre_nms_topk 2048 vs 8192 through the full
    postprocess -> COCO-rows -> COCOEvaluator path on a deterministic
    synthetic mini-dataset with a dense sub-threshold noise floor
    (the measured delta is asserted tiny and recorded in docs/PERF.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import reference_available
from yolov4_tpu.eval.cocoeval import COCOEvaluator
from yolov4_tpu.ops.postprocess import postprocess

CONF_PUBLISHED = 0.0001
NMS_PUBLISHED = 0.4


def _dense_predictions(rng, n_img, n_boxes, n_classes, gts=None, img_size=608.0):
    """Trained-model-shaped eval output: a few strong peaks (near gts when
    given) over a dense noise floor where obj*cls clears 1e-4 for most
    (box, class) pairs — the published-protocol candidate regime."""
    preds = np.zeros((n_img, n_boxes, 5 + n_classes), np.float32)
    preds[..., 0:2] = rng.uniform(20, img_size - 20, (n_img, n_boxes, 2))
    preds[..., 2:4] = rng.uniform(8, 150, (n_img, n_boxes, 2))
    # noise floor: obj in [2e-3, 3e-2], cls ~ U(0.005, 0.03) -> most pairs
    # land above 1e-4 (tens of thousands of candidates per image)
    preds[..., 4] = rng.uniform(2e-3, 3e-2, (n_img, n_boxes))
    preds[..., 5:] = rng.uniform(0.005, 0.03, (n_img, n_boxes, n_classes))
    if gts is not None:
        for i, img_gts in enumerate(gts):
            for j, (cx, cy, w, h, cls) in enumerate(img_gts):
                for p in range(6):  # several competing peaks per gt
                    b = (j * 6 + p) % n_boxes
                    jit = rng.uniform(-4, 4, 2)
                    scale = rng.uniform(0.92, 1.08, 2)
                    preds[i, b, 0:2] = [cx + jit[0], cy + jit[1]]
                    preds[i, b, 2:4] = [w * scale[0], h * scale[1]]
                    preds[i, b, 4] = rng.uniform(0.55, 0.95)
                    preds[i, b, 5 + int(cls)] = rng.uniform(0.6, 0.98)
    return preds


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_dense_parity_at_published_thresholds(rng):
    """Top-100 survivors match the reference CPU pipeline exactly at
    conf 0.0001 / NMS 0.4 with ~10^5 above-threshold candidate pairs."""
    import sys
    sys.path.insert(0, "/root/reference")
    np.int = int
    np.alltrue = np.all
    import torch
    from yolo.util.utils import postprocess as ref_postprocess

    n_classes, n_boxes = 80, 2500
    preds = _dense_predictions(rng, 1, n_boxes, n_classes,
                               gts=[[(100, 100, 60, 60, 3),
                                     (400, 300, 120, 90, 17),
                                     (250, 500, 40, 80, 0)]])
    n_pairs = int((preds[0, :, 4:5] * preds[0, :, 5:] >= CONF_PUBLISHED).sum())
    assert n_pairs > 50_000, f"not a dense case: {n_pairs} candidate pairs"

    ref_out = ref_postprocess(torch.from_numpy(preds.copy()), n_classes,
                              conf_thre=CONF_PUBLISHED, nms_thre=NMS_PUBLISHED)
    want = ref_out[0].numpy()
    # reference emits every survivor; rank them by score like COCO scoring does
    want = want[np.argsort(-(want[:, 4] * want[:, 5]), kind="mergesort")]

    det, valid = postprocess(jnp.asarray(preds), n_classes,
                             conf_thre=CONF_PUBLISHED, nms_thre=NMS_PUBLISHED,
                             pre_nms_topk=2048, max_dets=100)
    got = np.asarray(det)[0][np.asarray(valid)[0]]

    assert got.shape[0] == 100
    assert want.shape[0] >= 100
    np.testing.assert_allclose(got, want[:100], rtol=1e-4, atol=1e-4)


def _ap_for_topk(preds, gt_rows, img_ids, pre_nms_topk, max_dets):
    det, valid = postprocess(jnp.asarray(preds), 80,
                             conf_thre=CONF_PUBLISHED, nms_thre=NMS_PUBLISHED,
                             pre_nms_topk=pre_nms_topk, max_dets=max_dets)
    det, valid = np.asarray(det), np.asarray(valid)
    rows = []
    for i, img_id in enumerate(img_ids):
        for r in det[i][valid[i]]:
            rows.append({"image_id": img_id, "category_id": int(r[6]) + 1,
                         "bbox": [float(r[0]), float(r[1]),
                                  float(r[2] - r[0]), float(r[3] - r[1])],
                         "score": float(r[4] * r[5])})

    class _Idx:
        def get_img_ids(self):
            return list(img_ids)

        def get_cat_ids(self):
            return list(range(1, 81))

        def load_anns(self, img_id):
            return [g for g in gt_rows if g["image_id"] == img_id]

    ev = COCOEvaluator(_Idx())
    ev.add_detections(rows)
    return float(ev.evaluate(verbose=False)[0])


def test_pre_nms_topk_ap_ablation():
    """AP at pre_nms_topk=2048 vs 8192 on a dense synthetic mini-dataset.

    With max_dets=100 the outputs must be IDENTICAL (greedy-NMS prefix
    property: >=100 survivors exist inside the top-2048 candidates); with
    max_dets=1024 the tails differ and the AP delta is measured — asserted
    well under one AP point at the published thresholds."""
    rng = np.random.default_rng(42)
    n_img, n_boxes = 8, 2500
    img_ids = list(range(1, n_img + 1))
    gt_rows, gts_per_img = [], []
    for img_id in img_ids:
        img_gts = []
        for _ in range(10):
            w, h = rng.uniform(20, 150, 2)
            cx, cy = rng.uniform(80, 520, 2)
            cls = int(rng.integers(0, 80))
            img_gts.append((cx, cy, w, h, cls))
            gt_rows.append({"image_id": img_id, "category_id": cls + 1,
                            "bbox": [cx - w / 2, cy - h / 2, w, h]})
        gts_per_img.append(img_gts)
    preds = _dense_predictions(rng, n_img, n_boxes, 80, gts=gts_per_img)

    ap_2048 = _ap_for_topk(preds, gt_rows, img_ids, 2048, 100)
    ap_8192 = _ap_for_topk(preds, gt_rows, img_ids, 8192, 100)
    assert ap_2048 == pytest.approx(ap_8192, abs=1e-9), \
        f"max_dets=100: K=2048 AP {ap_2048} != K=8192 AP {ap_8192}"

    ap_2048_deep = _ap_for_topk(preds, gt_rows, img_ids, 2048, 1024)
    ap_8192_deep = _ap_for_topk(preds, gt_rows, img_ids, 8192, 1024)
    delta = abs(ap_8192_deep - ap_2048_deep)
    assert delta < 0.005, \
        f"deep-tail AP delta {delta:.5f} (K=2048 {ap_2048_deep:.5f} " \
        f"vs K=8192 {ap_8192_deep:.5f})"
    print(f"\n[pre_nms_topk ablation] max_dets=100: {ap_2048:.5f} == "
          f"{ap_8192:.5f}; max_dets=1024: K2048={ap_2048_deep:.5f} "
          f"K8192={ap_8192_deep:.5f} delta={delta:.5f}")


def _zipf_class_profile(rng, n_img, n_classes):
    """Per-image class-popularity weights: trained detectors concentrate
    their dense low-conf output on a handful of classes per image (the
    classes present plus their confusables), not uniformly over 80."""
    ranks = np.argsort(rng.random((n_img, n_classes)), axis=1)
    return 1.0 / (1.0 + ranks.astype(np.float64)) ** 1.2


def test_cat_cap_selection_semantics():
    """pycocotools caps detections per (image, CATEGORY) at 100 while the
    reference emits unlimited rows (engine/build.py:176-188); our device
    output is a fixed max_dets rows per IMAGE. This test pins the cat_cap
    emulation of that protocol on a trained-model-shaped distribution
    (Zipf class concentration: a few classes dominate each image's dense
    tail, so some classes exceed 100 post-NMS rows):

      1. rows with within-class rank >= cat_cap can never affect scoring
         -> dropping them first makes max_dets=1024 EXACTLY equal to
         unlimited detections whenever relevant_count <= 1024 (asserted
         via the on-device relevant_count output);
      2. for max_dets <= cat_cap the gating is a provable no-op
         (bit-identical outputs);
      3. the AP deltas of plain per-image caps 100/300 vs unlimited are
         measured and printed (the quantified protocol risk).
    """
    rng = np.random.default_rng(7)
    n_img, n_boxes, n_classes = 6, 2500, 80
    img_ids = list(range(1, n_img + 1))
    gt_rows, strong_gts, hard_gts = [], [], []
    for img_id in img_ids:
        img_strong, img_hard = [], []
        for j in range(12):
            w, h = rng.uniform(20, 150, 2)
            cx, cy = rng.uniform(80, 520, 2)
            cls = int(rng.integers(0, 8))  # concentrated classes
            # 4 of 12 objects per image are HARD: their only detections are
            # weak (scores inside the dense noise floor's range) — the rows
            # a per-image cap drops first, i.e. the real recall risk
            (img_hard if j % 3 == 2 else img_strong).append((cx, cy, w, h, cls))
            gt_rows.append({"image_id": img_id, "category_id": cls + 1,
                            "bbox": [cx - w / 2, cy - h / 2, w, h]})
        strong_gts.append(img_strong)
        hard_gts.append(img_hard)
    preds = _dense_predictions(rng, n_img, n_boxes, n_classes, gts=strong_gts)
    # concentrate the noise floor's class mass (trained-model shape)
    preds[..., 5:] *= _zipf_class_profile(rng, n_img, n_classes)[:, None, :]
    # weak detections for the hard objects: pair score ~2e-4..7e-4 ranks
    # below hundreds of noise-floor rows per image, but their class rank
    # stays small (rare classes under the Zipf profile)
    for i, img_gts in enumerate(hard_gts):
        for j, (cx, cy, w, h, cls) in enumerate(img_gts):
            for p in range(2):
                b = n_boxes - 1 - (j * 2 + p)  # reserved tail slots
                jit = rng.uniform(-3, 3, 2)
                scale = rng.uniform(0.94, 1.06, 2)
                preds[i, b, 0:2] = [cx + jit[0], cy + jit[1]]
                preds[i, b, 2:4] = [w * scale[0], h * scale[1]]
                preds[i, b, 4] = 0.02
                preds[i, b, 5:] = 1e-4  # other classes: below threshold
                preds[i, b, 5 + int(cls)] = rng.uniform(0.011, 0.034)

    def run(max_dets, cat_cap, want_count=False):
        out = postprocess(
            jnp.asarray(preds), n_classes, conf_thre=CONF_PUBLISHED,
            nms_thre=NMS_PUBLISHED, pre_nms_topk=2048, max_dets=max_dets,
            cat_cap=cat_cap, return_relevant_count=want_count)
        return tuple(np.asarray(o) for o in out)

    def ap_of(det, valid):
        rows = []
        for i, img_id in enumerate(img_ids):
            for r in det[i][valid[i]]:
                rows.append({"image_id": img_id, "category_id": int(r[6]) + 1,
                             "bbox": [float(r[0]), float(r[1]),
                                      float(r[2] - r[0]), float(r[3] - r[1])],
                             "score": float(r[4] * r[5])})

        class _Idx:
            def get_img_ids(self):
                return list(img_ids)

            def get_cat_ids(self):
                return list(range(1, n_classes + 1))

            def load_anns(self, img_id):
                return [g for g in gt_rows if g["image_id"] == img_id]

        ev = COCOEvaluator(_Idx())
        ev.add_detections(rows)
        return float(ev.evaluate(verbose=False)[0])

    # the distribution actually exercises the cap: some (img, class) has
    # far more than 100 kept rows (measured on the UNGATED output)
    det_u, valid_u = run(2048, 0)
    per_class_max = 0
    for i in range(n_img):
        cls = det_u[i][valid_u[i]][:, 6].astype(int)
        if cls.size:
            per_class_max = max(per_class_max, int(np.bincount(cls).max()))
    kept_total = int(valid_u.sum(1).max())
    assert per_class_max > 150, f"cap never bites: max {per_class_max}/class"
    assert kept_total > 600, f"not dense: {kept_total} kept rows"
    _, _, nrel = run(2048, 100, want_count=True)

    # (2) no-op below the cap: bit-identical with and without gating
    det_a, valid_a = run(100, 100)
    det_b, valid_b = run(100, 0)
    np.testing.assert_array_equal(det_a, det_b)
    np.testing.assert_array_equal(valid_a, valid_b)

    # (1) cat-aware 1024 == unlimited, PROVEN by the relevant-row count
    assert int(nrel.max()) <= 1024, f"relevant rows {nrel.max()} > 1024"
    ap_unlimited = ap_of(det_u, valid_u)
    det_c, valid_c, nrel_c = run(1024, 100, want_count=True)
    np.testing.assert_array_equal(nrel_c, nrel)
    ap_cat1024 = ap_of(det_c, valid_c)
    assert ap_cat1024 == pytest.approx(ap_unlimited, abs=1e-12), \
        f"cat_cap emulation broke: {ap_cat1024} vs unlimited {ap_unlimited}"

    # (3) quantify the plain per-image caps against unlimited
    ap_100 = ap_of(*run(100, 0))
    ap_300 = ap_of(*run(300, 0))
    ap_1024_plain = ap_of(*run(1024, 0))
    print(f"\n[cat_cap ablation] unlimited={ap_unlimited:.5f} "
          f"cat1024={ap_cat1024:.5f} plain1024={ap_1024_plain:.5f} "
          f"plain300={ap_300:.5f} (d={ap_unlimited - ap_300:+.5f}) "
          f"plain100={ap_100:.5f} (d={ap_unlimited - ap_100:+.5f}) "
          f"max_relevant={int(nrel.max())} max_per_class={per_class_max}")


def test_predictor_honors_protocol_config():
    """TEST.PRE_NMS_TOPK / TEST.MAX_DETS config keys reach the Predictor."""
    from yolov4_tpu.config import load_config
    cfg = load_config("configs/yolov4_Tianxiaomo.cfg")
    cfg["TEST"]["PRE_NMS_TOPK"] = 4096
    cfg["TEST"]["MAX_DETS"] = 300
    from yolov4_tpu.engine.predictor import Predictor
    pred = Predictor(cfg, batch_size=1)
    assert pred.pre_nms_topk == 4096
    assert pred.max_dets == 300
