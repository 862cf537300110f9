"""Serving export (utils/export.py): a single-file StableHLO artifact of
the full uint8-wire -> forward -> decode -> NMS program, weights baked in.
Round-trip must be bit-identical to the live Predictor — the artifact IS
the serving program, just serialized."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov4_tpu.config import load_config
from yolov4_tpu.engine.predictor import Predictor
from yolov4_tpu.utils.export import (MAGIC, ServingArtifact, export_serving,
                                     load_serving)


def _small_cfg(**model_over):
    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, **model_over)
    cfg["TEST"].update(IMGSIZE=64, PRE_NMS_TOPK=64, MAX_DETS=10)
    return cfg


@pytest.fixture(scope="module")
def small_predictor():
    return Predictor(_small_cfg(), img_size=64, batch_size=2)


def test_roundtrip_bit_identical(small_predictor, tmp_path):
    path = str(tmp_path / "model.y4x")
    header = export_serving(small_predictor, path)
    art = load_serving(path)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    got = art.predict(imgs)
    want = small_predictor.dispatch(imgs)
    assert len(got) == len(header["outputs"])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))

    # short batches unpad like the live path
    one = art.predict(imgs[:1])
    assert one[0].shape[0] == 1
    np.testing.assert_array_equal(one[0][0], got[0][0])


def test_mesh_predictor_export_rejected(tmp_path):
    """A mesh-sharded predictor must fail at EXPORT time with a clear
    message, not at load time on the single-device serving host with a
    cryptic device-count error."""
    import jax

    from yolov4_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    pred = Predictor(_small_cfg(), img_size=64, batch_size=2,
                     mesh=create_mesh())
    with pytest.raises(ValueError, match="single-device"):
        export_serving(pred, str(tmp_path / "m.y4x"))


def test_header_records_serving_contract(small_predictor, tmp_path):
    path = str(tmp_path / "model.y4x")
    header = export_serving(small_predictor, path)
    art = load_serving(path)
    assert art.meta == header
    assert header["img_size"] == 64
    assert header["batch_size"] == 2
    assert header["wire_dtype"] == "uint8"
    assert header["outputs"][:2] == ["detections", "valid"]
    assert isinstance(header["s2d_wire"], bool)
    assert header["platforms"], "lowered platforms must be recorded"


def test_float32_wire_variant(small_predictor, tmp_path):
    path = str(tmp_path / "model_f32.y4x")
    export_serving(small_predictor, path, wire_dtype=np.float32)
    art = load_serving(path)
    imgs = np.random.default_rng(1).random((2, 64, 64, 3)).astype(np.float32)
    got = art.predict(imgs)
    want = small_predictor.dispatch(imgs)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))
    # dtype contract is enforced, not silently cast
    with pytest.raises(ValueError, match="wire dtype"):
        art.predict(imgs.astype(np.uint8))


def test_uncalibrated_int8_static_export_refused(tmp_path):
    pred = Predictor(_small_cfg(QUANT="int8_static"), img_size=64,
                     batch_size=2)
    with pytest.raises(ValueError, match="calibrat"):
        export_serving(pred, str(tmp_path / "x.y4x"))
    # after calibration it exports and round-trips
    imgs = np.random.default_rng(2).integers(0, 256, (2, 64, 64, 3),
                                             np.uint8)
    pred.calibrate(imgs)
    path = str(tmp_path / "q.y4x")
    header = export_serving(pred, path)
    assert header["quant"] == "int8_static"
    got = load_serving(path).predict(imgs)
    want = pred.dispatch(imgs)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))


def test_bad_file_rejected(tmp_path):
    p = tmp_path / "junk.y4x"
    p.write_bytes(b"NOTMAGIC" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a yolov4_tpu"):
        ServingArtifact(str(p))
    p2 = tmp_path / "badver.y4x"
    p2.write_bytes(MAGIC + bytes([99]) + b"\x00" * 16)
    with pytest.raises(ValueError, match="version"):
        ServingArtifact(str(p2))
