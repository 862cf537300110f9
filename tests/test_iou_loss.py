"""Opt-in IoU-variant box regression (CRITERION.BOX_LOSS).

The reference code trains weighted-BCE(xy) + MSE(wh)/2 only
(yolo/model/yololoss.py:417-432); the IoU/GIoU/DIoU/CIoU variants are
framework extensions (the YOLOv4 paper's CIoU loss). These tests pin the
geometry against an independent numpy formulation of the published
formulas (Zheng et al., AAAI 2020), the gradient safety at masked/padded
cells, and that the default "mse" path is byte-for-byte the parity loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.config import Config
from yolov4_tpu.models.decode import decode_layer, masked_anchors
from yolov4_tpu.ops.boxes import iou_variant_elementwise
from yolov4_tpu.ops.loss import YOLOLoss, build_criterion

CFG = {
    "ANCHORS": [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55],
                [72, 146], [142, 110], [192, 243], [459, 401]],
    "ANCHOR_MASK": [[0, 1, 2], [3, 4, 5], [6, 7, 8]],
    "N_CLASSES": 80,
}


def _np_iou_variants(p, g):
    """Independent numpy formulation (paper formulas, cxcywh)."""
    px1, py1 = p[..., 0] - p[..., 2] / 2, p[..., 1] - p[..., 3] / 2
    px2, py2 = p[..., 0] + p[..., 2] / 2, p[..., 1] + p[..., 3] / 2
    gx1, gy1 = g[..., 0] - g[..., 2] / 2, g[..., 1] - g[..., 3] / 2
    gx2, gy2 = g[..., 0] + g[..., 2] / 2, g[..., 1] + g[..., 3] / 2
    iw = np.maximum(np.minimum(px2, gx2) - np.maximum(px1, gx1), 0)
    ih = np.maximum(np.minimum(py2, gy2) - np.maximum(py1, gy1), 0)
    inter = iw * ih
    union = p[..., 2] * p[..., 3] + g[..., 2] * g[..., 3] - inter
    iou = inter / union
    cw = np.maximum(px2, gx2) - np.minimum(px1, gx1)
    ch = np.maximum(py2, gy2) - np.minimum(py1, gy1)
    giou = iou - (cw * ch - union) / (cw * ch)
    rho2 = (p[..., 0] - g[..., 0]) ** 2 + (p[..., 1] - g[..., 1]) ** 2
    diou = iou - rho2 / (cw ** 2 + ch ** 2)
    v = (4 / np.pi ** 2) * (np.arctan(g[..., 2] / g[..., 3])
                            - np.arctan(p[..., 2] / p[..., 3])) ** 2
    alpha = v / ((1 - iou) + v)
    ciou = diou - alpha * v
    return {"iou": iou, "giou": giou, "diou": diou, "ciou": ciou}


def test_variants_match_independent_numpy_formulas():
    rng = np.random.default_rng(0)
    n = 256
    p = np.stack([rng.uniform(0, 60, n), rng.uniform(0, 60, n),
                  rng.uniform(1, 30, n), rng.uniform(1, 30, n)], -1)
    g = np.stack([rng.uniform(0, 60, n), rng.uniform(0, 60, n),
                  rng.uniform(1, 30, n), rng.uniform(1, 30, n)], -1)
    want = _np_iou_variants(p, g)
    for kind in ("iou", "giou", "diou", "ciou"):
        got = np.asarray(iou_variant_elementwise(
            jnp.asarray(p, jnp.float32), jnp.asarray(g, jnp.float32), kind))
        np.testing.assert_allclose(got, want[kind], rtol=2e-5, atol=2e-5,
                                   err_msg=kind)


def test_variant_ordering_and_identity():
    p = jnp.asarray([[10.0, 10.0, 4.0, 6.0]])
    # identical boxes: every variant is exactly 1
    for kind in ("iou", "giou", "diou", "ciou"):
        np.testing.assert_allclose(
            np.asarray(iou_variant_elementwise(p, p, kind)), 1.0, atol=1e-6)
    # disjoint boxes: iou = 0, giou/diou/ciou penalize distance (< 0),
    # and ciou <= diou <= iou, giou <= iou everywhere
    g = jnp.asarray([[40.0, 40.0, 4.0, 4.0]])
    vals = {k: float(iou_variant_elementwise(p, g, k)[0])
            for k in ("iou", "giou", "diou", "ciou")}
    assert vals["iou"] == 0.0
    assert vals["giou"] < 0 and vals["diou"] < 0 and vals["ciou"] < 0
    assert vals["giou"] <= vals["iou"] + 1e-7
    assert vals["diou"] <= vals["iou"] + 1e-7
    assert vals["ciou"] <= vals["diou"] + 1e-7


def test_degenerate_boxes_finite_value_and_grad():
    """Padded cells carry all-zero gt boxes; the variant and its gradient
    must stay finite there (the loss masks AFTER evaluating — NaN*0=NaN
    would poison every batch containing padding, i.e. all of them)."""
    p = jnp.asarray([[3.0, 4.0, 2.0, 2.0], [0.0, 0.0, 0.0, 0.0]])
    g = jnp.zeros((2, 4))
    for kind in ("iou", "giou", "diou", "ciou"):
        val, grad = jax.value_and_grad(
            lambda pp: jnp.sum(iou_variant_elementwise(pp, g, kind)))(p)
        assert np.isfinite(float(val)), kind
        assert np.all(np.isfinite(np.asarray(grad))), kind


def test_closer_prediction_scores_higher():
    g = jnp.asarray([[10.0, 10.0, 8.0, 8.0]])
    near = jnp.asarray([[11.0, 10.5, 8.0, 7.0]])
    far = jnp.asarray([[16.0, 14.0, 3.0, 12.0]])
    for kind in ("giou", "diou", "ciou"):
        assert float(iou_variant_elementwise(near, g, kind)[0]) > \
            float(iou_variant_elementwise(far, g, kind)[0]), kind


def _layer_outputs(seed=0, batch=2):
    rng = np.random.default_rng(seed)
    outs = []
    for layer_no, fsize in [(0, 8), (1, 4), (2, 2)]:
        raw = rng.normal(0, 0.5, (batch, fsize, fsize, 255)).astype(np.float32)
        anc = jnp.asarray(masked_anchors(CFG["ANCHORS"], CFG["ANCHOR_MASK"],
                                         layer_no))
        outs.append(decode_layer(jnp.asarray(raw), anc, layer_no,
                                 training=True))
    return outs


def _labels(n_valid, size=64, k=60, seed=1):
    rng = np.random.default_rng(seed)
    labels = np.zeros((len(n_valid), k, 5), np.float32)
    for b, n in enumerate(n_valid):
        labels[b, :n, 0] = rng.uniform(5, size - 5, n)
        labels[b, :n, 1] = rng.uniform(5, size - 5, n)
        labels[b, :n, 2] = rng.uniform(2, size / 2, n)
        labels[b, :n, 3] = rng.uniform(2, size / 2, n)
        labels[b, :n, 4] = rng.integers(0, 80, n)
    return labels


@pytest.mark.parametrize("kind", ["iou", "giou", "diou", "ciou"])
def test_box_loss_knob_full_loss(kind):
    """Full YOLOLoss with BOX_LOSS variants: finite loss + finite gradient
    on mixed batches incl. a zero-label image, and strictly different from
    the mse parity value (the term actually switched)."""
    outs = _layer_outputs()
    targets = {"padded_labels": jnp.asarray(_labels([3, 0]))}
    loss_v = YOLOLoss(CFG, ignore_thresh=0.7, box_loss=kind)
    loss_mse = YOLOLoss(CFG, ignore_thresh=0.7)

    def f(raws, crit):
        rebuilt = []
        for (layer_no, _), raw in zip([(0, 8), (1, 4), (2, 2)], raws):
            anc = jnp.asarray(masked_anchors(
                CFG["ANCHORS"], CFG["ANCHOR_MASK"], layer_no))
            rebuilt.append(decode_layer(raw, anc, layer_no, training=True))
        return crit(rebuilt, targets)

    raws = [jnp.asarray(np.random.default_rng(0).normal(
        0, 0.5, (2, f, f, 255)).astype(np.float32)) for f in (8, 4, 2)]
    val, grads = jax.value_and_grad(lambda r: f(r, loss_v))(raws)
    assert np.isfinite(float(val)) and float(val) > 0
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # the box term changed; obj/cls stayed — values must differ
    assert float(val) != pytest.approx(float(f(raws, loss_mse)))


def test_mse_default_is_parity_loss():
    """box_loss='mse' (and the cfg default) is the SAME code path as the
    pre-knob loss — identical value on identical inputs."""
    outs = _layer_outputs()
    targets = {"padded_labels": jnp.asarray(_labels([4, 2]))}
    base = float(YOLOLoss(CFG, ignore_thresh=0.7)(outs, targets))
    explicit = float(YOLOLoss(CFG, ignore_thresh=0.7, box_loss="mse")(
        outs, targets))
    assert base == explicit

    cfg = Config.from_dict({})
    assert cfg["CRITERION"]["BOX_LOSS"] == "mse"
    crit = build_criterion(cfg)
    assert crit.box_loss == "mse"


def test_build_criterion_reads_knob_and_validates():
    cfg = Config.from_dict({"CRITERION": {"BOX_LOSS": "ciou"}})
    assert build_criterion(cfg).box_loss == "ciou"
    with pytest.raises(ValueError, match="BOX_LOSS"):
        Config.from_dict({"CRITERION": {"BOX_LOSS": "l1"}})
    with pytest.raises(ValueError, match="BOX_LOSS|variant"):
        YOLOLoss(CFG, box_loss="smooth")
