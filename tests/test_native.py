"""Native fastops tests: builds the C extension and checks vs numpy and vs
the on-device NMS."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu import native
from yolov4_tpu.ops.nms import greedy_nms_mask


def test_extension_builds():
    assert native.available(), native._build_error


def test_pack_f32_flat(rng):
    x = rng.integers(0, 255, (3, 5, 7, 3), np.uint8)
    out = native.pack_f32_flat(x)
    want = x.reshape(3, -1).astype(np.float32) / 255.0
    np.testing.assert_allclose(out, want, rtol=1e-7)
    assert out.dtype == np.float32 and out.shape == (3, 5 * 7 * 3)


def test_pack_planar(rng):
    x = rng.integers(0, 255, (2, 6, 9, 3), np.uint8)
    out = native.pack_planar_u8(x)
    want = x.transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(out, want)


def test_native_nms_matches_device_nms(rng):
    k = 300
    tl = rng.uniform(0, 500, (k, 2))
    wh = rng.uniform(10, 150, (k, 2))
    boxes = np.concatenate([tl, tl + wh], -1).astype(np.float32)
    valid = rng.random(k) > 0.2
    want = np.asarray(greedy_nms_mask(
        jnp.asarray(boxes[None]), jnp.asarray(valid[None]), 0.45))[0]
    got = native.greedy_nms_host(boxes, valid, 0.45)
    np.testing.assert_array_equal(got, want)


def test_native_nms_fallback_path(rng, monkeypatch):
    """The numpy fallback must agree with the native path."""
    k = 64
    tl = rng.uniform(0, 200, (k, 2))
    wh = rng.uniform(10, 80, (k, 2))
    boxes = np.concatenate([tl, tl + wh], -1).astype(np.float32)
    valid = np.ones(k, bool)
    native_keep = native.greedy_nms_host(boxes, valid, 0.5)
    monkeypatch.setattr(native, "_fastops", None)
    monkeypatch.setattr(native, "_build_error", "forced-off")
    fallback_keep = native.greedy_nms_host(boxes, valid, 0.5)
    np.testing.assert_array_equal(native_keep, fallback_keep)


def test_pack_s2d_matches_numpy_oracle(rng):
    """Native pack_s2d == the space_to_depth permutation, exactly."""
    b, h, w = 2, 12, 16
    img = rng.integers(0, 256, (b, h, w, 3)).astype(np.uint8)
    got = native.pack_s2d_u8(img)
    want = np.ascontiguousarray(
        img.reshape(b, h // 2, 2, w // 2, 2, 3)
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12))
    np.testing.assert_array_equal(got, want)
    # and it matches the model-side space_to_depth channel order
    from yolov4_tpu.models.layers import space_to_depth
    import jax.numpy as jnp
    dev = np.asarray(space_to_depth(jnp.asarray(img, jnp.float32)))
    np.testing.assert_array_equal(got.astype(np.float32), dev)


def test_pack_s2d_f32_matches_fallback(rng, monkeypatch):
    b, h, w = 2, 10, 14
    img = rng.random((b, h, w, 3)).astype(np.float32)
    native_out = native.pack_s2d_f32(img)
    monkeypatch.setattr(native, "_fastops", None)
    monkeypatch.setattr(native, "_build_error", "forced-off")
    np.testing.assert_array_equal(native.pack_s2d_f32(img), native_out)
    # and it equals the u8 permutation applied to the same data
    q = (img * 255).astype(np.uint8)
    monkeypatch.undo()
    np.testing.assert_array_equal(
        native.pack_s2d_u8(q), (native.pack_s2d_f32(q.astype(np.float32))
                                ).astype(np.uint8))


def test_pack_s2d_fallback_path(rng, monkeypatch):
    b, h, w = 1, 8, 8
    img = rng.integers(0, 256, (b, h, w, 3)).astype(np.uint8)
    native_out = native.pack_s2d_u8(img)
    monkeypatch.setattr(native, "_fastops", None)
    monkeypatch.setattr(native, "_build_error", "forced-off")
    np.testing.assert_array_equal(native.pack_s2d_u8(img), native_out)
