"""Device-side batched train augmentation (optional fast path).

The parity-exact host pipeline (data/transforms.py) reproduces the
reference bit-for-bit; this module moves the augmentation MATH onto the
TPU as one jit-compiled batched program (the north-star "device-side
batched transforms"): the host only decodes JPEGs and stretch-resizes each
source to a fixed S x S canvas, then per training sample the device applies

  random crop/zoom-out with channel-mean padding  (crop_and_pad equivalent)
  horizontal flip with the reference's ~31% gate   (randn > 0.5)
  HSV color dithering (hue shift, sat/exp scaling) (color_dithering equiv.)
  4-image mosaic assembly with coordinate gathers  (blend_mosaic equivalent)
  box transforms mirrored with fixed [K, 5] masks  (filter_truth equivalent)

Distributional notes vs the host pipeline: geometry parameters are drawn
from the same distributions — including the mosaic paste-window shifts
blend_mosaic derives from zoom-out crop padding (transform.py:287-307),
which are folded into each member's crop resample (_mosaic_shifts) — but
crops act on the pre-resized canvas rather than the original image (one
extra bilinear resample), and RNG is jax PRNG rather than python/numpy.
So this path is distribution-level, not draw-for-draw, equivalent;
tests/test_device_aug.py pins the joint geometry distribution against the
host pipeline with two-sample KS tests (box centers/sizes/counts, padding
visibility). Keep the host pipeline for strict reproduction of the
reference's augmentation stream.

Everything is static-shape: inputs [B, 4, S, S, 3] uint8 canvases +
[B, 4, K, 5] padded boxes, output [B, S, S, 3] float32 + [B, K, 5].
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# color space helpers (match cv2's float32 RGB<->HSV: H in [0, 360))

def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    h = jnp.where(
        maxc == r, (g - b) / safe,
        jnp.where(maxc == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe))
    h = jnp.where(delta > 0, (h * 60.0) % 360.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = (h % 360.0) / 60.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------

def _sample_params(key: jax.Array, size: int, cfg_vals) -> Dict[str, jnp.ndarray]:
    """All randomness for ONE mosaic sample (4 member images)."""
    jitter, hue, sat, exp, min_offset, flip_enabled, dither_enabled = cfg_vals
    keys = jax.random.split(key, 8)
    j = int(round(size * jitter))
    params = {
        # per member image: crop offsets in canvas pixels (left/right/top/bot)
        "crop": jax.random.randint(keys[0], (4, 4), -j, j + 1),
        "flip": (jax.random.normal(keys[1], (4,)) > 0.5) & flip_enabled,
        "dhue": jax.random.uniform(keys[2], (4,), minval=-hue, maxval=hue),
        "dsat": _rand_scale(keys[3], sat),
        "dexp": _rand_scale(keys[4], exp),
        "cut_x": jax.random.randint(
            keys[5], (), int(size * min_offset), int(size * (1 - min_offset)) + 1),
        "cut_y": jax.random.randint(
            keys[6], (), int(size * min_offset), int(size * (1 - min_offset)) + 1),
        "dither": jnp.full((4,), dither_enabled),
    }
    return params


def _rand_scale(key: jax.Array, s: float) -> jnp.ndarray:
    """reference rand_scale: uniform(1, s), inverted with p=0.5."""
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (4,), minval=1.0, maxval=s)
    inv = jax.random.bernoulli(k2, 0.5, (4,))
    return jnp.where(inv, scale, 1.0 / scale)


def _crop_one(img: jnp.ndarray, boxes: jnp.ndarray, crop: jnp.ndarray,
              size: int, shift=(0.0, 0.0)) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittered crop + channel-mean pad + resize back to S x S, on-canvas.

    crop = [left, right, top, bottom] offsets (canvas pixels). The reference
    crops a (S - l - r) x (S - t - b) window starting at (l, t) (negative
    offsets zoom out with mean padding) and stretch-resizes to S x S with
    cv2 INTER_LINEAR. On device the crop+resize is ONE bilinear
    ``scale_and_translate`` (separable resampling the TPU runs as two small
    matmuls — round 1's per-pixel nearest gathers were 8x the no-aug step):
    output pixel x samples input u = l + (x+0.5)*crop_w/S, i.e.
    scale = S/crop_w, translation = -l*S/crop_w. Mean fill outside the
    canvas comes for free from linearity: resample(img - mean) + mean
    (scale_and_translate zero-fills out-of-bounds taps).
    Boxes map linearly: x' = (x - l) * S / crop_w (then clipped).

    shift = (ty, tx): EXTRA integer output-space translation, used to fold
    the reference's mosaic paste-window shifts (blend_mosaic,
    transform.py:287-307) into this resample. Integer shifts reuse the
    same bilinear weight pattern, so this equals translating the resampled
    image — exactly the reference's shifted integer-pixel paste slice.
    """
    left, right, top, bottom = crop[0], crop[1], crop[2], crop[3]
    crop_w = (size - left - right).astype(jnp.float32)
    crop_h = (size - top - bottom).astype(jnp.float32)
    ty, tx = shift

    mean = jnp.mean(img, axis=(0, 1))
    scale = jnp.stack([size / crop_h, size / crop_w])
    translation = jnp.stack([ty - top * size / crop_h,
                             tx - left * size / crop_w])
    out = jax.image.scale_and_translate(
        img - mean, (size, size, 3), (0, 1), scale, translation,
        method="linear", antialias=False) + mean

    # boxes: [K, 5] xyxy+cls in canvas pixels, zero rows = padding
    valid = jnp.sum(boxes, axis=1) > 0
    sx = size / jnp.maximum(crop_w, 1.0)
    sy = size / jnp.maximum(crop_h, 1.0)
    x1 = jnp.clip((boxes[:, 0] - left) * sx + tx, 0, size)
    y1 = jnp.clip((boxes[:, 1] - top) * sy + ty, 0, size)
    x2 = jnp.clip((boxes[:, 2] - left) * sx + tx, 0, size)
    y2 = jnp.clip((boxes[:, 3] - top) * sy + ty, 0, size)
    degenerate = (x1 >= x2) | (y1 >= y2)
    valid = valid & ~degenerate
    new_boxes = jnp.where(valid[:, None],
                          jnp.stack([x1, y1, x2, y2, boxes[:, 4]], axis=1), 0.0)
    return out, new_boxes


def _mosaic_shifts(crop: jnp.ndarray, flips: jnp.ndarray, cut_x, cut_y,
                   size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-member mosaic content translations matching the reference's
    paste-window shifts (blend_mosaic, transform.py:287-307).

    When a member's crop had NEGATIVE offsets (zoom-out, mean padding on
    that side), the reference shifts the quadrant's paste window toward
    real content by the padding amount in resized pixels,
    ``int(min(limit, max(0, -offset * S / crop_w)))``, twice clamped; the
    flip swaps which side the left/right padding sits on. Returns
    post-flip output-space translations (tx[4], ty[4]): quadrant pixel
    (x, y) shows member pixel (x - tx, y - ty).
    """
    left = jnp.where(flips, crop[:, 1], crop[:, 0]).astype(jnp.float32)
    right = jnp.where(flips, crop[:, 0], crop[:, 1]).astype(jnp.float32)
    top = crop[:, 2].astype(jnp.float32)
    bottom = crop[:, 3].astype(jnp.float32)
    crop_w = (size - crop[:, 0] - crop[:, 1]).astype(jnp.float32)
    crop_h = (size - crop[:, 2] - crop[:, 3]).astype(jnp.float32)
    s = float(size)
    fx = jnp.asarray(cut_x, jnp.float32)
    fy = jnp.asarray(cut_y, jnp.float32)

    ls = jnp.trunc(jnp.minimum(fx, jnp.maximum(0.0, -left * s / crop_w)))
    ts = jnp.trunc(jnp.minimum(fy, jnp.maximum(0.0, -top * s / crop_h)))
    rs = jnp.trunc(jnp.minimum(s - fx, jnp.maximum(0.0, -right * s / crop_w)))
    bs = jnp.trunc(jnp.minimum(s - fy, jnp.maximum(0.0, -bottom * s / crop_h)))
    ls = jnp.minimum(ls, s - fx)
    ts = jnp.minimum(ts, s - fy)
    rs = jnp.minimum(rs, fx)
    bs = jnp.minimum(bs, fy)

    # member order: [top-left, top-right, bottom-left, bottom-right]
    tx = jnp.stack([-ls[0], rs[1], -ls[2], rs[3]])
    ty = jnp.stack([-ts[0], -ts[1], bs[2], bs[3]])
    return tx, ty


def _flip_one(img, boxes, do_flip, size):
    flipped = jnp.where(do_flip, img[:, ::-1, :], img)
    valid = jnp.sum(boxes, axis=1) > 0
    fx1 = size - boxes[:, 2]
    fx2 = size - boxes[:, 0]
    fb = jnp.stack([fx1, boxes[:, 1], fx2, boxes[:, 3], boxes[:, 4]], axis=1)
    fb = jnp.where(valid[:, None], fb, 0.0)
    return flipped, jnp.where(do_flip, fb, boxes)


def _dither_one(img, dhue, dsat, dexp, enabled):
    hsv = rgb_to_hsv(img)
    h = hsv[..., 0] + 179.0 * dhue
    s = hsv[..., 1] * dsat
    v = hsv[..., 2] * dexp
    out = jnp.clip(hsv_to_rgb(jnp.stack([h, s, v], axis=-1)), 0.0, 255.0)
    return jnp.where(enabled, out, img)


def _mosaic(imgs, boxes, cut_x, cut_y, size, max_labels):
    """imgs: [4, S, S, 3]; boxes: [4, K, 5] xyxy+cls. Quadrants take their
    own member's pixels at identical coordinates — the reference's
    crop-derived paste-window shifts are already applied to each member
    (folded into _crop_one's resample via _mosaic_shifts), so the plain
    quadrant select here IS blend_mosaic's shifted paste."""
    ys = jnp.arange(size)[:, None, None]   # [S, 1, 1]
    xs = jnp.arange(size)[None, :, None]   # [1, S, 1]
    top = ys < cut_y
    lft = xs < cut_x
    # pure elementwise selects (a cross-member gather lowers poorly on TPU)
    out = jnp.where(top & lft, imgs[0],
                    jnp.where(top, imgs[1],
                              jnp.where(lft, imgs[2], imgs[3])))

    # clip each member's boxes to its quadrant, drop degenerates
    bounds = jnp.stack([
        jnp.stack([0, 0, cut_x, cut_y]),
        jnp.stack([cut_x, 0, size, cut_y]),
        jnp.stack([0, cut_y, cut_x, size]),
        jnp.stack([cut_x, cut_y, size, size]),
    ]).astype(jnp.float32)                                          # [4, 4]
    valid = jnp.sum(boxes, axis=2) > 0                              # [4, K]
    x1 = jnp.clip(boxes[..., 0], bounds[:, None, 0], bounds[:, None, 2])
    y1 = jnp.clip(boxes[..., 1], bounds[:, None, 1], bounds[:, None, 3])
    x2 = jnp.clip(boxes[..., 2], bounds[:, None, 0], bounds[:, None, 2])
    y2 = jnp.clip(boxes[..., 3], bounds[:, None, 1], bounds[:, None, 3])
    degenerate = (x1 >= x2) | (y1 >= y2)
    valid = valid & ~degenerate
    merged = jnp.where(
        valid[..., None],
        jnp.stack([x1, y1, x2, y2, boxes[..., 4]], axis=-1),
        0.0).reshape(4 * boxes.shape[1], 5)
    flat_valid = valid.reshape(-1)

    # compact valid rows to the front, keep first max_labels
    order = jnp.argsort(~flat_valid, stable=True)
    merged = merged[order][:max_labels]
    return out, merged


def _augment_sample(key, imgs_u8, boxes, size, max_labels, cfg_vals):
    """imgs_u8: [4, S, S, 3] uint8; boxes: [4, K, 5] xyxy+cls canvas px."""
    p = _sample_params(key, size, cfg_vals)
    imgs = imgs_u8.astype(jnp.float32)

    # reference paste-window shifts, folded into each member's crop
    # resample. The shift is defined POST-flip; _crop_one runs before the
    # flip, and a pre-flip translation by u becomes -u after mirroring,
    # so flipped members get the sign-compensated shift.
    tx, ty = _mosaic_shifts(p["crop"], p["flip"], p["cut_x"], p["cut_y"],
                            size)
    ux = jnp.where(p["flip"], -tx, tx)

    outs, outb = [], []
    for m in range(4):
        img, bx = _crop_one(imgs[m], boxes[m], p["crop"][m], size,
                            shift=(ty[m], ux[m]))
        img, bx = _flip_one(img, bx, p["flip"][m], size)
        img = _dither_one(img, p["dhue"][m], p["dsat"][m], p["dexp"][m],
                          p["dither"][m])
        outs.append(img)
        outb.append(bx)
    mosaic_img, mosaic_boxes = _mosaic(
        jnp.stack(outs), jnp.stack(outb), p["cut_x"], p["cut_y"], size,
        max_labels)

    # xyxy -> cxcywh (transform.py:345 tail) and /255 normalize
    valid = jnp.sum(mosaic_boxes, axis=1) > 0
    cx = (mosaic_boxes[:, 0] + mosaic_boxes[:, 2]) / 2
    cy = (mosaic_boxes[:, 1] + mosaic_boxes[:, 3]) / 2
    w = mosaic_boxes[:, 2] - mosaic_boxes[:, 0]
    h = mosaic_boxes[:, 3] - mosaic_boxes[:, 1]
    labels = jnp.where(valid[:, None],
                       jnp.stack([cx, cy, w, h, mosaic_boxes[:, 4]], axis=1),
                       0.0)
    return mosaic_img / 255.0, labels


def augment_batch_impl(key: jax.Array, canvases: jnp.ndarray,
                       boxes: jnp.ndarray, size: int, max_labels: int = 60,
                       jitter: float = 0.3, hue: float = 0.1,
                       saturation: float = 1.5, exposure: float = 1.5,
                       min_offset: float = 0.2, flip: bool = True,
                       dither: bool = True):
    """Non-jitted body (composable inside a larger program, e.g. the train
    step). See :func:`augment_batch` for the argument contract."""
    b = canvases.shape[0]
    keys = jax.random.split(key, b)
    cfg_vals = (jitter, hue, saturation, exposure, min_offset, flip, dither)
    fn = lambda k, c, bx: _augment_sample(k, c, bx, size, max_labels, cfg_vals)
    return jax.vmap(fn)(keys, canvases, boxes)


@partial(jax.jit, static_argnames=("size", "max_labels", "jitter", "hue",
                                   "saturation", "exposure", "min_offset",
                                   "flip", "dither"))
def augment_batch(key: jax.Array, canvases: jnp.ndarray, boxes: jnp.ndarray,
                  size: int, max_labels: int = 60, jitter: float = 0.3,
                  hue: float = 0.1, saturation: float = 1.5,
                  exposure: float = 1.5, min_offset: float = 0.2,
                  flip: bool = True, dither: bool = True):
    """Batched device augmentation.

    canvases: [B, 4, S, S, 3] uint8 (host-decoded, stretch-resized members)
    boxes:    [B, 4, K, 5] float32 xyxy+cls in canvas pixels (zero padded)
    Returns (images [B, S, S, 3] f32 in [0,1], labels [B, K, 5] cxcywh+cls).
    """
    return augment_batch_impl(key, canvases, boxes, size, max_labels, jitter,
                              hue, saturation, exposure, min_offset, flip,
                              dither)


class CanvasTransform:
    """Host-side minimal prep for the device pipeline: per mosaic member,
    BGR->RGB + stretch-resize to the canvas + box scaling. The actual
    augmentation runs on device (augment_batch). Duck-types data/transforms
    .Transform (is_mosaic attribute drives the dataset's 4-image sampling).
    """

    is_mosaic = True
    is_train = True

    def __init__(self, cfg: Dict, seed=None):
        self.max_num_labels = cfg["DATA"]["MAX_NUM_LABELS"]

    def seed(self, seed) -> None:  # no host randomness
        pass

    def __call__(self, img_list, bboxes_list, img_size: int):
        import cv2
        import numpy as np

        assert len(img_list) == 4, "device mosaic needs 4 members"
        k = self.max_num_labels
        canvases = np.zeros((4, img_size, img_size, 3), np.uint8)
        boxes = np.zeros((4, k, 5), np.float32)
        for m, (img, tlwh) in enumerate(zip(img_list, bboxes_list)):
            h, w = img.shape[:2]
            canvases[m] = cv2.resize(img[:, :, ::-1], (img_size, img_size),
                                     interpolation=cv2.INTER_LINEAR)
            if len(tlwh) > 0:
                n = min(len(tlwh), k)
                sx, sy = img_size / w, img_size / h
                boxes[m, :n, 0] = tlwh[:n, 0] * sx
                boxes[m, :n, 1] = tlwh[:n, 1] * sy
                boxes[m, :n, 2] = (tlwh[:n, 0] + tlwh[:n, 2]) * sx
                boxes[m, :n, 3] = (tlwh[:n, 1] + tlwh[:n, 3]) * sy
                boxes[m, :n, 4] = tlwh[:n, 4]
        return canvases, {"member_boxes": boxes, "img_info": []}
