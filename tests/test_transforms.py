"""Transform tests: geometric invariants + seeded parity vs the reference."""

import random

import numpy as np
import pytest

from tests.conftest import reference_available
from yolov4_tpu.config import load_config
from yolov4_tpu.data import transforms as T


def _image(rng, h=100, w=140):
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def _boxes_tlwh(rng, n, h=100, w=140):
    out = np.zeros((n, 5))
    out[:, 0] = rng.uniform(0, w - 30, n)
    out[:, 1] = rng.uniform(0, h - 30, n)
    out[:, 2] = rng.uniform(5, 25, n)
    out[:, 3] = rng.uniform(5, 25, n)
    out[:, 4] = rng.integers(0, 80, n)
    return out


def test_val_transform_shapes(rng):
    cfg = load_config()
    t = T.Transform(cfg, is_train=False)
    img = _image(rng)
    boxes = _boxes_tlwh(rng, 3)
    out, target = t([img], [boxes], 416)
    assert out.shape == (416, 416, 3) and out.dtype == np.float32
    assert 0 <= out.min() and out.max() <= 1
    assert target["padded_labels"].shape == (60, 5)
    # 6 geometry fields: src_h, src_w, content_h, content_w, off_x, off_y
    # (stretch mode fills the canvas, offsets 0)
    assert target["img_info"] == [100, 140, 416, 416, 0, 0]
    # box scaling: cx scaled by 416/140, cy by 416/100
    lab = target["padded_labels"]
    cx, cy = boxes[0, 0] + boxes[0, 2] / 2, boxes[0, 1] + boxes[0, 3] / 2
    np.testing.assert_allclose(lab[0, 0], cx * 416 / 140, rtol=1e-5)
    np.testing.assert_allclose(lab[0, 1], cy * 416 / 100, rtol=1e-5)


def test_train_transform_mosaic_shapes(rng):
    cfg = load_config()
    t = T.Transform(cfg, is_train=True, seed=0)
    imgs = [_image(rng) for _ in range(4)]
    boxes = [_boxes_tlwh(rng, 4) for _ in range(4)]
    out, target = t(imgs, boxes, 256)
    assert out.shape == (256, 256, 3) and out.dtype == np.float32
    lab = target["padded_labels"]
    valid = lab.sum(1) > 0
    assert valid.any()
    assert (lab[valid][:, :4] <= 256).all() and (lab[valid][:, :4] >= 0).all()
    assert (lab[valid][:, 4] < 80).all()


def test_val_transform_keep_uint8(rng):
    cfg = load_config()
    t_f32 = T.Transform(cfg, is_train=False)
    t_u8 = T.Transform(cfg, is_train=False, keep_uint8=True)
    img = _image(rng)
    boxes = _boxes_tlwh(rng, 2)
    out_f, tgt_f = t_f32([img.copy()], [boxes.copy()], 128)
    out_u, tgt_u = t_u8([img.copy()], [boxes.copy()], 128)
    assert out_u.dtype == np.uint8
    np.testing.assert_allclose(out_u.astype(np.float32) / 255.0, out_f, atol=1e-7)
    np.testing.assert_allclose(tgt_u["padded_labels"], tgt_f["padded_labels"])
    # keep_uint8 is a no-op for the (float-valued) train path
    t_train = T.Transform(cfg, is_train=True, keep_uint8=True, seed=0)
    out_t, _ = t_train([img.copy()] * 4, [_boxes_tlwh(rng, 2) for _ in range(4)], 128)
    assert out_t.dtype == np.float32


def test_train_transform_no_mosaic(rng):
    cfg = load_config()
    cfg["AUGMENTATION"]["IS_MOSAIC"] = False
    t = T.Transform(cfg, is_train=True, seed=1)
    out, target = t([_image(rng)], [_boxes_tlwh(rng, 3)], 128)
    assert out.shape == (128, 128, 3)


def test_flip_distribution():
    """The reference flip gate is randn() > 0.5 => P ~ 0.3085
    (transform.py:158). Guard the quirk."""
    np_rng = np.random.RandomState(0)
    img = np.zeros((8, 8, 3))
    flips = sum(
        T.left_right_flip(img, np.zeros((0, 5)), True, np_rng)[2]
        for _ in range(4000))
    assert 0.27 < flips / 4000 < 0.35


def test_flip_box_geometry():
    np_rng = np.random.RandomState(1)
    img = np.arange(5 * 7 * 3, dtype=np.float64).reshape(5, 7, 3)
    boxes = np.array([[1.0, 1.0, 3.0, 4.0, 2.0]])
    while True:
        img2, b2, flipped = T.left_right_flip(img.copy(), boxes.copy(), True, np_rng)
        if flipped:
            break
    np.testing.assert_allclose(b2[0, :4], [7 - 3, 1, 7 - 1, 4])
    np.testing.assert_array_equal(img2, img[:, ::-1])


def test_crop_and_pad_properties(rng):
    py_rng = random.Random(3)
    np_rng = np.random.RandomState(3)
    img = _image(rng).astype(np.float64)
    boxes = _boxes_tlwh(rng, 5)
    boxes_xyxy = T.tlwh_to_xyxy_np(boxes)
    out, out_boxes, info = T.crop_and_pad(img, boxes_xyxy.copy(), 0.3, py_rng, np_rng)
    crop_w, crop_h = info[4], info[5]
    assert out.shape == (crop_h, crop_w, 3)
    if len(out_boxes):
        assert (out_boxes[:, [0, 2]] <= crop_w).all()
        assert (out_boxes[:, [1, 3]] <= crop_h).all()
        assert (out_boxes[:, :4] >= 0).all()


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("seed", [7, 11, 42])
@pytest.mark.parametrize("is_train", [True, False])
def test_transform_parity_vs_reference(seed, is_train):
    """Seeded draw-for-draw parity with reference transform.py."""
    import sys
    sys.path.insert(0, "/root/reference")
    np.int = int
    np.alltrue = np.all
    from yolo.data.transform import Transform as RefTransform

    cfg = load_config()
    rng = np.random.default_rng(seed)
    n_img = 4 if is_train else 1
    imgs = [_image(rng, h=int(rng.integers(80, 140)), w=int(rng.integers(80, 140)))
            for _ in range(n_img)]
    boxes = [_boxes_tlwh(rng, int(rng.integers(1, 6)),
                         h=img.shape[0], w=img.shape[1]) for img in imgs]

    random.seed(seed)
    np.random.seed(seed)
    ref = RefTransform(dict(cfg), is_train=is_train)
    ref_img, ref_target = ref([i.copy() for i in imgs],
                              [b.copy() for b in boxes], 256)
    ref_img = ref_img.numpy().transpose(1, 2, 0)  # CHW -> HWC

    mine = T.Transform(cfg, is_train=is_train, seed=seed)
    my_img, my_target = mine([i.copy() for i in imgs],
                             [b.copy() for b in boxes], 256)

    np.testing.assert_allclose(my_img, ref_img, atol=1e-5)
    np.testing.assert_allclose(my_target["padded_labels"],
                               ref_target["padded_labels"].numpy(), atol=1e-4)
    # reference emits 4 geometry fields; ours appends (0, 0) letterbox
    # offsets — the shared prefix must match exactly
    ref_info = list(ref_target["img_info"])
    assert list(my_target["img_info"])[:len(ref_info)] == ref_info
    assert list(my_target["img_info"])[len(ref_info):] in ([], [0, 0])


def test_letterbox_val_transform(rng):
    """Opt-in TEST.LETTERBOX (the reference's DEAD resize_and_pad,
    transform.py:19-70): aspect-preserving scale, centered gray pad,
    6-field geometry img_info, and boxes that roundtrip exactly through
    ops.boxes unmapping."""
    from yolov4_tpu.ops.boxes import unmap_to_source_tlwh

    cfg = load_config()
    cfg["TEST"]["LETTERBOX"] = True
    t = T.Transform(cfg, is_train=False)
    img = _image(rng)              # 100 x 140 BGR
    boxes = _boxes_tlwh(rng, 3)
    out, target = t([img], [boxes], 416)
    assert out.shape == (416, 416, 3) and out.dtype == np.float32

    # scale = 416/140 (width-limited); content 297x416, top/bottom pad
    content_h, content_w = int(100 * 416 / 140), 416
    off_y = (416 - content_h) // 2
    assert target["img_info"] == [100, 140, content_h, content_w, 0, off_y]
    # padding is gray 127 (the dead helper's evident intent), content is
    # the image
    np.testing.assert_allclose(out[0, 0], 127 / 255.0, atol=1e-6)
    np.testing.assert_allclose(out[-1, -1], 127 / 255.0, atol=1e-6)

    # labels scale uniformly + shift by the offsets
    lab = target["padded_labels"]
    cx = boxes[0, 0] + boxes[0, 2] / 2
    cy = boxes[0, 1] + boxes[0, 3] / 2
    np.testing.assert_allclose(lab[0, 0], cx * content_w / 140, rtol=1e-5)
    np.testing.assert_allclose(lab[0, 1], cy * content_h / 100 + off_y,
                               rtol=1e-5)

    # unmap roundtrip: canvas-space xyxy -> source tlwh == the input rows
    n = 3
    cxcywh = lab[:n]
    xyxy = np.stack([cxcywh[:, 0] - cxcywh[:, 2] / 2,
                     cxcywh[:, 1] - cxcywh[:, 3] / 2,
                     cxcywh[:, 0] + cxcywh[:, 2] / 2,
                     cxcywh[:, 1] + cxcywh[:, 3] / 2], axis=-1)
    back = unmap_to_source_tlwh(xyxy, (100, 140), (content_h, content_w),
                                offset_xy=(0, off_y))
    np.testing.assert_allclose(back, boxes[:, :4], rtol=1e-4, atol=1e-3)


def test_letterbox_off_by_default(rng):
    cfg = load_config()
    assert cfg["TEST"]["LETTERBOX"] is False
    t = T.Transform(cfg, is_train=False)
    assert t.letterbox is False
