"""Postprocess / NMS tests: analytic cases + parity vs reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import reference_available
from yolov4_tpu.ops.nms import greedy_nms_mask
from yolov4_tpu.ops.postprocess import postprocess


def _pred_row(cx, cy, w, h, obj, cls_idx, cls_p, num_classes=80):
    row = np.zeros(5 + num_classes, np.float32)
    row[:4] = [cx, cy, w, h]
    row[4] = obj
    row[5 + cls_idx] = cls_p
    return row


def test_nms_keeps_best_and_nonoverlapping():
    preds = np.stack([
        _pred_row(100, 100, 50, 50, 0.9, 3, 0.9),   # A: best
        _pred_row(105, 105, 50, 50, 0.8, 3, 0.8),   # B: overlaps A, same cls -> dropped
        _pred_row(300, 300, 50, 50, 0.7, 3, 0.9),   # C: far away -> kept
        _pred_row(105, 105, 50, 50, 0.8, 7, 0.8),   # D: overlaps A, DIFFERENT cls -> kept
        _pred_row(100, 100, 50, 50, 0.1, 3, 0.1),   # E: below threshold
    ])[None]
    det, valid = postprocess(jnp.asarray(preds), 80, conf_thre=0.3, nms_thre=0.4,
                             pre_nms_topk=64, max_dets=10)
    det, valid = np.asarray(det), np.asarray(valid)
    assert valid[0].sum() == 3
    kept = det[0][valid[0]]
    # score-sorted: A (0.81), C/D (0.63/0.64)
    np.testing.assert_allclose(kept[0, 4] * kept[0, 5], 0.81, rtol=1e-5)
    assert set(kept[:, 6].astype(int)) == {3, 7}
    # boxes are xyxy corners
    np.testing.assert_allclose(kept[0, :4], [75, 75, 125, 125], rtol=1e-5)


def test_negative_coords_never_suppress_across_classes():
    """Decoded boxes are unclipped (edge centers with large wh go
    negative); the class-offset span must cover the full coordinate
    RANGE or a negative-coordinate box hangs into the previous class's
    island (offset IoU up to 0.25 with a max|coord|-sized span) and
    gets cross-class-suppressed at nms_thre < 0.25."""
    preds = np.stack([
        # class 0, bottom-right corner (defines the coordinate maximum)
        _pred_row(675.5, 675.5, 49, 49, 0.9, 0, 0.9),
        # class 1, hanging off the top-left: x1 = y1 = -50
        _pred_row(0, 0, 100, 100, 0.8, 1, 0.8),
    ])[None]
    det, valid = postprocess(jnp.asarray(preds), 80, conf_thre=0.3,
                             nms_thre=0.2, pre_nms_topk=64, max_dets=10)
    d = np.asarray(det)[0][np.asarray(valid)[0]]
    assert d.shape[0] == 2, d  # different classes: BOTH survive
    assert sorted(int(r[6]) for r in d) == [0, 1]


def test_suppressed_box_does_not_suppress():
    """Greedy chain: A kills B; C overlaps only B, so C survives."""
    preds = np.stack([
        _pred_row(100, 100, 40, 40, 0.9, 0, 0.9),   # A
        _pred_row(120, 100, 40, 40, 0.8, 0, 0.8),   # B: IoU(A,B)=0.33
        _pred_row(140, 100, 40, 40, 0.7, 0, 0.7),   # C: IoU(B,C)=0.33, IoU(A,C)=0
    ])[None]
    det, valid = postprocess(jnp.asarray(preds), 80, conf_thre=0.1, nms_thre=0.3,
                             pre_nms_topk=16, max_dets=8)
    det, valid = np.asarray(det), np.asarray(valid)
    kept_cx = (det[0][valid[0]][:, 0] + det[0][valid[0]][:, 2]) / 2
    assert sorted(kept_cx.tolist()) == [100, 140]


def test_multilabel_expansion():
    """One box above threshold for two classes yields two detections."""
    row = np.zeros(85, np.float32)
    row[:4] = [50, 50, 20, 20]
    row[4] = 0.9
    row[5 + 2] = 0.8
    row[5 + 9] = 0.7
    det, valid = postprocess(jnp.asarray(row[None, None]), 80, conf_thre=0.5,
                             nms_thre=0.4, pre_nms_topk=16, max_dets=8)
    det, valid = np.asarray(det), np.asarray(valid)
    assert valid[0].sum() == 2
    assert set(det[0][valid[0]][:, 6].astype(int)) == {2, 9}


def test_max_dets_cap(rng):
    preds = np.zeros((1, 200, 85), np.float32)
    preds[0, :, 0] = np.arange(200) * 100.0  # disjoint boxes
    preds[0, :, 1] = 50
    preds[0, :, 2:4] = 10
    preds[0, :, 4] = 0.9
    preds[0, :, 5] = rng.uniform(0.5, 1.0, 200)
    det, valid = postprocess(jnp.asarray(preds), 80, conf_thre=0.1, nms_thre=0.4,
                             pre_nms_topk=512, max_dets=50)
    valid = np.asarray(valid)
    assert valid[0].sum() == 50
    scores = np.asarray(det)[0, :, 4] * np.asarray(det)[0, :, 5]
    assert (np.diff(scores[valid[0]]) <= 1e-6).all()  # descending


def test_greedy_nms_mask_batched(rng):
    boxes = rng.uniform(0, 100, size=(3, 32, 2))
    wh = rng.uniform(5, 40, size=(3, 32, 2))
    xyxy = np.concatenate([boxes, boxes + wh], axis=-1).astype(np.float32)
    valid = np.ones((3, 32), bool)
    keep_b = np.asarray(greedy_nms_mask(jnp.asarray(xyxy), jnp.asarray(valid), 0.5))
    for i in range(3):
        keep_1 = np.asarray(greedy_nms_mask(
            jnp.asarray(xyxy[i:i + 1]), jnp.asarray(valid[i:i + 1]), 0.5))
        np.testing.assert_array_equal(keep_b[i], keep_1[0])


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_postprocess_parity_vs_reference(rng):
    """Full postprocess vs reference utils.py:92-223 on synthetic predictions."""
    import sys
    sys.path.insert(0, "/root/reference")
    np.int = int
    np.alltrue = np.all
    import torch
    from yolo.util.utils import postprocess as ref_postprocess

    b, n, c = 2, 400, 80
    preds = np.zeros((b, n, 5 + c), np.float32)
    preds[..., 0:2] = rng.uniform(50, 550, (b, n, 2))
    preds[..., 2:4] = rng.uniform(10, 120, (b, n, 2))
    preds[..., 4] = rng.uniform(0, 1, (b, n))
    # sparse class probabilities: ~2% of (box, class) pairs are live
    cls = rng.uniform(0, 0.2, (b, n, c))
    live = rng.random((b, n, c)) < 0.02
    preds[..., 5:] = np.where(live, rng.uniform(0, 1, (b, n, c)), cls)

    conf, nms_t = 0.4, 0.45
    ref_out = ref_postprocess(torch.from_numpy(preds.copy()), c,
                              conf_thre=conf, nms_thre=nms_t)
    det, valid = postprocess(jnp.asarray(preds), c, conf_thre=conf, nms_thre=nms_t,
                             pre_nms_topk=2048, max_dets=1024)
    det, valid = np.asarray(det), np.asarray(valid)

    for i in range(b):
        want = (np.zeros((0, 7), np.float32) if ref_out[i] is None
                else ref_out[i].numpy())
        got = det[i][valid[i]]
        assert got.shape[0] == want.shape[0], (got.shape, want.shape)
        # compare as score-sorted sets (reference orders by class, ours by score)
        def canon(arr):
            order = np.lexsort((arr[:, 0], arr[:, 6], -arr[:, 4] * arr[:, 5]))
            return arr[order]
        np.testing.assert_allclose(canon(got), canon(want), rtol=1e-4, atol=1e-4)


def test_approx_topk_plumbing(rng):
    """TEST.APPROX_TOPK path: same program with lax.approx_max_k selection.
    On the CPU test backend approx_max_k lowers to an exact sort, so the
    outputs must equal the exact path here (on TPU it is a documented
    recall~0.95 approximation; exactness there is NOT asserted)."""
    b, n, c = 2, 600, 80
    preds = np.zeros((b, n, 5 + c), np.float32)
    preds[..., 0:2] = rng.uniform(50, 550, (b, n, 2))
    preds[..., 2:4] = rng.uniform(10, 120, (b, n, 2))
    preds[..., 4] = rng.uniform(0, 1, (b, n))
    preds[..., 5:] = rng.uniform(0, 1, (b, n, c)) * (
        rng.random((b, n, c)) < 0.05)

    exact = postprocess(jnp.asarray(preds), c, 0.3, 0.45,
                        pre_nms_topk=256, max_dets=64)
    approx = postprocess(jnp.asarray(preds), c, 0.3, 0.45,
                         pre_nms_topk=256, max_dets=64, topk_approx=True)
    np.testing.assert_array_equal(np.asarray(exact[1]), np.asarray(approx[1]))
    np.testing.assert_allclose(np.asarray(exact[0]), np.asarray(approx[0]),
                               rtol=1e-6, atol=1e-6)


def test_exact_topk_partial_reduce(rng):
    """The default (exact) candidate selection uses approx_max_k with
    recall_target=1.0 (_exact_top_k). Its selected VALUES must equal
    lax.top_k's on adversarial layouts (clustered winners, strided combs,
    ties, ramps). On this CPU backend it lowers to the exact sort
    fallback; the on-chip exactness evidence for the PartialReduce
    lowering is tools/exp_topk.py (documented in docs/PERF.md)."""
    from yolov4_tpu.ops.postprocess import _exact_top_k

    n, k = 8192, 512
    cases = []
    for off in (0, 1024, n - k):
        a = np.full((2, n), -1.0, np.float32)
        a[:, off:off + k] = rng.random((2, k)).astype(np.float32) + 1.0
        cases.append(a)
    a = np.full((2, n), 0.5, np.float32)
    cases.append(a)  # all ties
    cases.append(np.tile(np.linspace(2.0, 1.0, n, dtype=np.float32), (2, 1)))
    cases.append(rng.random((2, n)).astype(np.float32))
    for arr in cases:
        rv, _ = jax.lax.top_k(jnp.asarray(arr), k)
        av, ai = _exact_top_k(jnp.asarray(arr), k)
        np.testing.assert_array_equal(np.asarray(rv), np.asarray(av))
        # indices must reference the reported values
        gathered = np.take_along_axis(arr, np.asarray(ai), axis=1)
        np.testing.assert_array_equal(gathered, np.asarray(av))


def test_blocked_nms_matches_host_oracle(rng):
    """Block-sequential greedy (K > block) vs the independent host greedy
    oracle, on dense overlapping boxes with deep suppression chains."""
    from yolov4_tpu import native

    b, k = 3, 640  # spans 3 blocks at block=256
    centers = rng.uniform(0, 400, (b, k, 2)).astype(np.float32)
    wh = rng.uniform(20, 180, (b, k, 2)).astype(np.float32)
    boxes = np.concatenate([centers, centers + wh], -1)
    valid = rng.random((b, k)) < 0.9

    keep = np.asarray(greedy_nms_mask(
        jnp.asarray(boxes), jnp.asarray(valid), 0.45, block=256))
    for i in range(b):
        want = native.greedy_nms_host(boxes[i], valid[i], 0.45)
        np.testing.assert_array_equal(keep[i], want, err_msg=f"batch {i}")
