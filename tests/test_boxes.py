"""Box geometry unit tests.

IoU semantics are golden-tested against the reference formulas
(yolo/model/yololoss.py:16-91) via an independent numpy reimplementation of
the documented math.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.ops import boxes as B


def _numpy_iou(a, b, xyxy=True):
    """Direct numpy translation of the reference bboxes_iou math."""
    if xyxy:
        tl = np.maximum(a[:, None, :2], b[:, :2])
        br = np.minimum(a[:, None, 2:], b[:, 2:])
        area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
        area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    else:
        tl = np.maximum(a[:, None, :2] - a[:, None, 2:] / 2, b[:, :2] - b[:, 2:] / 2)
        br = np.minimum(a[:, None, :2] + a[:, None, 2:] / 2, b[:, :2] + b[:, 2:] / 2)
        area_a = np.prod(a[:, 2:], axis=1)
        area_b = np.prod(b[:, 2:], axis=1)
    en = (tl < br).astype(a.dtype).prod(axis=2)
    area_i = np.prod(br - tl, axis=2) * en
    return area_i / (area_a[:, None] + area_b - area_i)


@pytest.mark.parametrize("fmt,xyxy", [("xyxy", True), ("cxcywh", False)])
def test_iou_matches_reference_formula(rng, fmt, xyxy):
    if xyxy:
        tl = rng.uniform(0, 50, size=(12, 2))
        wh = rng.uniform(1, 60, size=(12, 2))
        a = np.concatenate([tl, tl + wh], axis=1).astype(np.float32)
        tl = rng.uniform(0, 50, size=(7, 2))
        wh = rng.uniform(1, 60, size=(7, 2))
        b = np.concatenate([tl, tl + wh], axis=1).astype(np.float32)
    else:
        a = rng.uniform(1, 80, size=(12, 4)).astype(np.float32)
        b = rng.uniform(1, 80, size=(7, 4)).astype(np.float32)

    expected = _numpy_iou(a, b, xyxy=xyxy)
    got = np.asarray(B.iou_pairwise(jnp.asarray(a), jnp.asarray(b), fmt=fmt))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([
        [0.0, 0.0, 10.0, 10.0],   # identical -> 1
        [5.0, 5.0, 15.0, 15.0],   # quarter overlap -> 25/175
        [10.0, 10.0, 20.0, 20.0],  # touching corner -> 0
        [20.0, 20.0, 30.0, 30.0],  # disjoint -> 0
    ])
    got = np.asarray(B.iou_pairwise(a, b))
    np.testing.assert_allclose(got[0], [1.0, 25.0 / 175.0, 0.0, 0.0], atol=1e-6)


def test_iou_batched_matches_unbatched(rng):
    a = rng.uniform(1, 40, size=(3, 5, 4)).astype(np.float32)
    b = rng.uniform(1, 40, size=(3, 6, 4)).astype(np.float32)
    batched = np.asarray(B.iou_pairwise_safe(jnp.asarray(a), jnp.asarray(b), fmt="cxcywh"))
    for i in range(3):
        single = np.asarray(
            B.iou_pairwise_safe(jnp.asarray(a[i]), jnp.asarray(b[i]), fmt="cxcywh"))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6)


def test_format_roundtrips(rng):
    tl = rng.uniform(0, 100, size=(20, 2))
    wh = rng.uniform(1, 50, size=(20, 2))
    tlwh = jnp.asarray(np.concatenate([tl, wh], axis=1).astype(np.float32))

    xyxy = B.tlwh_to_xyxy(tlwh)
    np.testing.assert_allclose(np.asarray(B.xyxy_to_tlwh(xyxy)), np.asarray(tlwh), rtol=1e-6)

    cxcywh = B.xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(
        np.asarray(B.cxcywh_to_xyxy(cxcywh)), np.asarray(xyxy), rtol=1e-5, atol=1e-5)
    # center/size values
    np.testing.assert_allclose(np.asarray(cxcywh[:, 2:]), wh, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cxcywh[:, :2]), tl + wh / 2, rtol=1e-6)


def test_unmap_to_source_matches_reference_math():
    # reference utils.py:281-309: x1 = x1/dst_w*src_w, w = (x2-x1)/dst_w*src_w
    box = jnp.array([[100.0, 50.0, 300.0, 250.0]])
    out = np.asarray(B.unmap_to_source_tlwh(box, src_hw=(480.0, 640.0), dst_hw=(608.0, 608.0)))
    np.testing.assert_allclose(
        out[0],
        [100 / 608 * 640, 50 / 608 * 480, 200 / 608 * 640, 200 / 608 * 480],
        rtol=1e-6,
    )
    out2 = np.asarray(B.unmap_to_source_xyxy(box, src_hw=(480.0, 640.0), dst_hw=(608.0, 608.0)))
    np.testing.assert_allclose(
        out2[0],
        [100 / 608 * 640, 50 / 608 * 480, 300 / 608 * 640, 250 / 608 * 480],
        rtol=1e-6,
    )
