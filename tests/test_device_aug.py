"""Device-side augmentation tests (CPU backend; geometry + invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.data import device_aug as D


def test_hsv_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(0, 255, (16, 16, 3)).astype(np.float32))
    back = D.hsv_to_rgb(D.rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-2)


def test_hsv_matches_cv2(rng):
    import cv2
    rgb = rng.uniform(0, 255, (8, 8, 3)).astype(np.float32)
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV)
    got = np.asarray(D.rgb_to_hsv(jnp.asarray(rgb)))
    np.testing.assert_allclose(got[..., 0], want[..., 0], atol=0.5)  # H deg
    np.testing.assert_allclose(got[..., 1], want[..., 1], atol=1e-3)
    np.testing.assert_allclose(got[..., 2], want[..., 2], atol=1e-3)


def test_crop_identity():
    """Zero crop offsets must return the image and boxes unchanged."""
    size = 64
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (size, size, 3)).astype(np.float32))
    boxes = np.zeros((10, 5), np.float32)
    boxes[0] = [10, 12, 30, 40, 3]
    out, new_boxes = D._crop_one(img, jnp.asarray(boxes),
                                 jnp.zeros(4, jnp.int32), size)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_boxes)[0], boxes[0], atol=1e-4)


def test_crop_zoom_out_pads_with_mean():
    size = 32
    img = jnp.full((size, size, 3), 100.0)
    boxes = np.zeros((5, 5), np.float32)
    boxes[0] = [8, 8, 24, 24, 1]
    crop = jnp.asarray([-16, -16, -16, -16], jnp.int32)  # 2x zoom out
    out, new_boxes = D._crop_one(img, jnp.asarray(boxes), crop, size)
    # uniform image: mean pad == image value
    np.testing.assert_allclose(np.asarray(out), 100.0, atol=1e-4)
    # geometry: box scales by size/(size+32) = 0.5 and shifts by +16*0.5
    nb = np.asarray(new_boxes)[0]
    np.testing.assert_allclose(nb[:4], [12, 12, 20, 20], atol=0.5)


def test_flip_geometry():
    size = 32
    img = jnp.asarray(np.arange(size * size * 3, dtype=np.float32)
                      .reshape(size, size, 3))
    boxes = np.zeros((3, 5), np.float32)
    boxes[0] = [4, 6, 10, 20, 2]
    out, fb = D._flip_one(img, jnp.asarray(boxes), jnp.asarray(True), size)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img)[:, ::-1])
    np.testing.assert_allclose(np.asarray(fb)[0], [22, 6, 28, 20, 2])
    out2, fb2 = D._flip_one(img, jnp.asarray(boxes), jnp.asarray(False), size)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(img))


def test_mosaic_quadrants():
    size = 32
    imgs = jnp.stack([jnp.full((size, size, 3), float(v))
                      for v in (10, 20, 30, 40)])
    boxes = np.zeros((4, 6, 5), np.float32)
    boxes[0, 0] = [2, 2, 8, 8, 1]       # inside quadrant 0 (if cut >= 8)
    boxes[1, 0] = [20, 2, 30, 8, 2]     # inside quadrant 1
    boxes[2, 0] = [20, 20, 30, 30, 3]   # image 2 box OUTSIDE its quadrant
    out, merged = D._mosaic(imgs, jnp.asarray(boxes),
                            jnp.asarray(16), jnp.asarray(16), size, 6)
    out = np.asarray(out)
    assert (out[:16, :16] == 10).all() and (out[:16, 16:] == 20).all()
    assert (out[16:, :16] == 30).all() and (out[16:, 16:] == 40).all()
    merged = np.asarray(merged)
    valid = merged.sum(1) > 0
    classes = set(merged[valid][:, 4].astype(int))
    assert classes == {1, 2}  # image-2 box clipped away


def test_augment_batch_shapes_and_ranges(rng):
    size, k, b = 64, 20, 2
    canvases = rng.integers(0, 255, (b, 4, size, size, 3), np.uint8)
    boxes = np.zeros((b, 4, k, 5), np.float32)
    for bi in range(b):
        for m in range(4):
            boxes[bi, m, 0] = [5, 5, 40, 40, rng.integers(0, 80)]
    imgs, labels = D.augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(canvases), jnp.asarray(boxes),
        size=size, max_labels=k)
    imgs, labels = np.asarray(imgs), np.asarray(labels)
    assert imgs.shape == (b, size, size, 3)
    assert labels.shape == (b, k, 5)
    assert imgs.min() >= 0 and imgs.max() <= 1
    valid = labels.sum(-1) > 0
    assert (labels[valid][:, :4] >= 0).all()
    assert (labels[valid][:, 0] <= size).all()


def test_augment_batch_deterministic(rng):
    size, k = 64, 10
    canvases = jnp.asarray(rng.integers(0, 255, (1, 4, size, size, 3), np.uint8))
    boxes = jnp.zeros((1, 4, k, 5), jnp.float32)
    a = D.augment_batch(jax.random.PRNGKey(7), canvases, boxes, size=size,
                        max_labels=k)
    b = D.augment_batch(jax.random.PRNGKey(7), canvases, boxes, size=size,
                        max_labels=k)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = D.augment_batch(jax.random.PRNGKey(8), canvases, boxes, size=size,
                        max_labels=k)
    assert np.abs(np.asarray(a[0]) - np.asarray(c[0])).max() > 0


def test_crop_matches_cv2_linear_interior(rng):
    """Bilinear fidelity: device crop+resize == cv2 crop-then-INTER_LINEAR
    (interior pixels; the outermost ring differs by edge-clamp policy)."""
    import cv2

    size = 64
    img = rng.uniform(0, 255, (size, size, 3)).astype(np.float32)
    left, right, top, bottom = 5, 9, 3, 7
    crop = jnp.asarray([left, right, top, bottom], jnp.int32)
    out, _ = D._crop_one(jnp.asarray(img), jnp.zeros((1, 5)), crop, size)

    window = img[top:size - bottom, left:size - right]
    want = cv2.resize(window, (size, size), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(np.asarray(out)[2:-2, 2:-2],
                               want[2:-2, 2:-2], atol=0.75)


def test_device_aug_distribution_vs_host(rng):
    """Distribution-level agreement with the host (reference-exact)
    pipeline over many samples: box survival rate and output intensity
    stay in the same ballpark (the two paths share parameter
    distributions but not RNG streams)."""
    from yolov4_tpu.config import load_config
    from yolov4_tpu.data.transforms import Transform

    size, k, n = 64, 60, 48
    cfg = load_config()
    cfg["DATA"]["MAX_NUM_LABELS"] = k
    host_t = Transform(cfg, is_train=True)
    host_t.seed(0)

    host_means, host_boxes = [], []
    dev_canvases, dev_boxes = [], []
    for i in range(n):
        imgs, tlwhs = [], []
        member_canvas = np.zeros((4, size, size, 3), np.uint8)
        member_boxes = np.zeros((4, k, 5), np.float32)
        for m in range(4):
            img = rng.integers(0, 255, (80, 96, 3)).astype(np.uint8)
            boxes = np.array([[10.0, 12.0, 40.0, 30.0, 3.0],
                              [50.0, 40.0, 30.0, 25.0, 7.0]])
            imgs.append(img)
            tlwhs.append(boxes)
            member_canvas[m] = np.asarray(
                jnp.asarray(img[:, :, ::-1], jnp.uint8))[
                    np.zeros(size, int)[:, None] * 0 + np.linspace(
                        0, 79, size).astype(int)[:, None],
                    np.linspace(0, 95, size).astype(int)[None, :]]
            sx, sy = size / 96.0, size / 80.0
            member_boxes[m, :2] = [
                [b[0] * sx, b[1] * sy, (b[0] + b[2]) * sx,
                 (b[1] + b[3]) * sy, b[4]] for b in boxes]
        h_img, h_target = host_t(imgs, tlwhs, size)
        host_means.append(float(np.mean(h_img)))
        host_boxes.append(int((h_target["padded_labels"].sum(1) > 0).sum()))
        dev_canvases.append(member_canvas)
        dev_boxes.append(member_boxes)

    d_imgs, d_labels = D.augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(np.stack(dev_canvases)),
        jnp.asarray(np.stack(dev_boxes)), size=size, max_labels=k)
    d_means = np.asarray(d_imgs).mean(axis=(1, 2, 3))
    d_counts = (np.asarray(d_labels).sum(axis=2) > 0).sum(axis=1)

    # same parameter distributions -> comparable aggregate statistics
    assert abs(np.mean(host_means) - np.mean(d_means)) < 0.1, \
        (np.mean(host_means), np.mean(d_means))
    assert abs(np.mean(host_boxes) - np.mean(d_counts)) < 2.5, \
        (np.mean(host_boxes), np.mean(d_counts))
