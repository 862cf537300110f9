"""Serving runtime: dynamic batcher + multi-bucket HTTP server.

The batcher must (a) group concurrent requests into the compiled static
batch, (b) flush partial batches at the latency deadline, (c) return
per-request results identical to direct Predictor calls with the same batch
composition, and (d) never hang callers across shutdown. The HTTP layer is
driven end-to-end over a real socket.
"""
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov4_tpu.config import load_config
from yolov4_tpu.engine.predictor import Predictor
from yolov4_tpu.serve import (DynamicBatcher, ServingRuntime, make_server,
                              result_to_json, serve_background)

SIZE = 64


def _small_cfg(**model_over):
    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, **model_over)
    cfg["TEST"].update(IMGSIZE=SIZE, PRE_NMS_TOPK=64, MAX_DETS=10,
                       CONFTHRE=0.01)
    return cfg


class FakePredictor:
    """Predictor stand-in: records dispatched batch sizes; each request's
    single detection row carries its canvas's first byte so results can be
    matched back to requests."""

    def __init__(self, img_size=SIZE, batch_size=4, conf_thre=0.1,
                 nms_thre=0.5, delay_s=0.0):
        self.img_size = img_size
        self.batch_size = batch_size
        self.conf_thre = conf_thre
        self.nms_thre = nms_thre
        self.batch_sizes = []
        self.delay_s = delay_s

    def warmup(self, dtype=None):
        pass

    def dispatch(self, images):
        self.batch_sizes.append(images.shape[0])
        if self.delay_s:
            time.sleep(self.delay_s)
        n = images.shape[0]
        det = np.zeros((n, 1, 7), np.float32)
        det[:, 0, :4] = [1.0, 2.0, 3.0, 4.0]
        det[:, 0, 4] = images[:, 0, 0, 0].astype(np.float32) / 255.0  # obj
        det[:, 0, 5] = 1.0                                    # cls_conf
        det[:, 0, 6] = 7.0                                    # class
        valid = np.ones((n, 1), bool)
        return det, valid

    @staticmethod
    def fetch_local(arr):
        return np.asarray(arr)


def _canvas(value):
    c = np.full((SIZE, SIZE, 3), value, np.uint8)
    return c


INFO = (SIZE, SIZE, SIZE, SIZE)  # identity unmap


def test_batcher_groups_requests_and_flushes_tail():
    fake = FakePredictor(batch_size=4)
    b = DynamicBatcher(fake, max_wait_ms=300.0).start()
    try:
        futs = [b.submit_canvas(_canvas(10 + i), INFO) for i in range(6)]
        results = [f.result(timeout=10) for f in futs]
    finally:
        b.close()
    # 6 fast submissions into batch_size 4: one full batch + deadline tail
    assert fake.batch_sizes == [4, 2]
    # every request got ITS OWN detection back (obj carries the identity)
    for i, r in enumerate(results):
        assert r.scores.shape == (1,)
        np.testing.assert_allclose(r.scores[0], (10 + i) / 255.0, rtol=1e-6)
        np.testing.assert_allclose(r.boxes[0], [1, 2, 3, 4], rtol=1e-6)
        assert r.class_ids[0] == 7
    snap = b.metrics.snapshot()
    assert snap["counters"]["requests_total"] == 6
    assert snap["counters"]["batches_total"] == 2
    assert snap["counters"]["batch_rows_total"] == 6
    assert snap["counters"]["errors_total"] == 0


def test_single_request_flushes_at_deadline():
    fake = FakePredictor(batch_size=8)
    b = DynamicBatcher(fake, max_wait_ms=50.0).start()
    try:
        t0 = time.perf_counter()
        res = b.submit_canvas(_canvas(99), INFO).result(timeout=10)
        dt = time.perf_counter() - t0
    finally:
        b.close()
    assert fake.batch_sizes == [1]
    assert res.scores.shape == (1,)
    # flushed by the deadline, not by a full batch (generous upper bound
    # for a loaded CI host; the point is it did not wait forever)
    assert dt < 30.0
    assert res.timings_ms["e2e"] >= 0.0


def test_per_request_conf_is_post_nms_filter():
    fake = FakePredictor(batch_size=2, conf_thre=0.1)
    b = DynamicBatcher(fake, max_wait_ms=20.0).start()
    try:
        # obj = 128/255 = 0.502; request conf above that drops the row
        lo = b.submit_canvas(_canvas(128), INFO, conf_thre=0.3)
        hi = b.submit_canvas(_canvas(128), INFO, conf_thre=0.9)
        assert lo.result(10).scores.shape == (1,)
        assert hi.result(10).scores.shape == (0,)
        assert hi.result(10).boxes.shape == (0, 4)
        # cannot LOWER below the bucket threshold (would need a re-run)
        with pytest.raises(ValueError, match="below bucket"):
            b.submit_canvas(_canvas(1), INFO, conf_thre=0.01)
    finally:
        b.close()


def test_shape_and_dtype_validation():
    b = DynamicBatcher(FakePredictor(batch_size=2), max_wait_ms=10.0)
    with pytest.raises(ValueError, match="canvas"):
        b.submit_canvas(np.zeros((SIZE, SIZE + 1, 3), np.uint8), INFO)
    with pytest.raises(ValueError, match="uint8"):
        b.submit_canvas(np.zeros((SIZE, SIZE, 3), np.float32), INFO)
    b.close()


def test_close_fails_pending_and_rejects_new():
    b = DynamicBatcher(FakePredictor(batch_size=2), max_wait_ms=10.0)
    fut = b.submit_canvas(_canvas(1), INFO)  # never started -> stays queued
    b.close()
    with pytest.raises(RuntimeError, match="shut down"):
        fut.result(timeout=1)
    with pytest.raises(RuntimeError, match="shut down"):
        b.submit_canvas(_canvas(1), INFO)


def test_submit_backpressure_timeout_and_close_wake():
    """Saturated submit parks on a Condition (no sleep-poll): it times out
    with queue.Full at its deadline, and close() wakes parked waiters
    promptly with the shutdown error instead of stranding them."""
    import queue as queue_mod
    fake = FakePredictor(batch_size=4)
    b = DynamicBatcher(fake, max_queue=1)  # NOT started: nothing drains
    b.submit_canvas(_canvas(1), INFO)      # fills the queue
    t0 = time.monotonic()
    with pytest.raises(queue_mod.Full):
        b.submit_canvas(_canvas(2), INFO, timeout=0.2)
    assert time.monotonic() - t0 < 5.0

    woke = []

    def park():
        try:
            b.submit_canvas(_canvas(3), INFO, timeout=30.0)
        except RuntimeError as e:
            woke.append(str(e))

    th = threading.Thread(target=park)
    th.start()
    time.sleep(0.15)  # let it park
    b.close()
    th.join(5.0)
    assert not th.is_alive()
    assert woke and "shut down" in woke[0]


def test_submit_waiter_admitted_when_queue_drains():
    """A parked submitter is admitted as soon as the assembler drains a
    slot (condition notify path, not the defensive re-check cap)."""
    fake = FakePredictor(batch_size=4)
    b = DynamicBatcher(fake, max_queue=1)  # NOT started: manual drain
    b.submit_canvas(_canvas(1), INFO)
    admitted = threading.Event()

    def park():
        b.submit_canvas(_canvas(2), INFO, timeout=30.0)
        admitted.set()

    th = threading.Thread(target=park)
    th.start()
    time.sleep(0.15)
    assert not admitted.is_set()
    b._queue_get(timeout=1.0)  # assembler-side drain frees one slot
    assert admitted.wait(5.0)
    th.join(5.0)
    b.close()


def test_cancelled_future_does_not_kill_fetcher():
    """A client that times out and cancel()s its future must not wedge the
    bucket: these futures are never set_running_or_notify_cancel'd, so
    set_result on a cancelled one raises InvalidStateError — which used to
    escape _fetch_loop and silently kill the fetcher thread (every later
    request then hung until process restart)."""
    fake = FakePredictor(batch_size=2, delay_s=0.1)
    b = DynamicBatcher(fake, max_wait_ms=5.0).start()
    try:
        doomed = b.submit_canvas(_canvas(1), INFO)
        assert doomed.cancel()  # client gave up before the batch resolved
        # the bucket must still serve everyone else
        for v in (20, 30, 40):
            r = b.submit_canvas(_canvas(v), INFO).result(timeout=10)
            np.testing.assert_allclose(r.scores[0], v / 255.0, rtol=1e-6)
    finally:
        b.close()


def test_close_drains_stranded_inflight_batch():
    """A dispatched batch the fetcher never collected (its exit condition
    races the assembler's put) must be failed by close(), not leave its
    callers hanging in future.result() forever."""
    from concurrent.futures import Future

    from yolov4_tpu.serve.batcher import _Request

    b = DynamicBatcher(FakePredictor(batch_size=2), max_wait_ms=10.0)
    b.start()
    b._stop.set()  # fetcher drains and exits
    time.sleep(0.3)
    stranded = _Request(canvas=_canvas(5), img_info=INFO, future=Future(),
                        conf_thre=None)
    b._inflight.put(([stranded], None, 0.0))  # the raced post-exit put
    b.close()
    with pytest.raises(RuntimeError, match="shut down"):
        stranded.future.result(timeout=1)


def test_dispatch_error_propagates_to_futures():
    class Boom(FakePredictor):
        def dispatch(self, images):
            raise RuntimeError("device fell over")

    b = DynamicBatcher(Boom(batch_size=2), max_wait_ms=10.0).start()
    try:
        fut = b.submit_canvas(_canvas(1), INFO)
        with pytest.raises(RuntimeError, match="fell over"):
            fut.result(timeout=10)
        assert b.metrics.snapshot()["counters"]["errors_total"] == 1
    finally:
        b.close()


@pytest.fixture(scope="module")
def tiny_predictor():
    return Predictor(_small_cfg(), img_size=SIZE, batch_size=4)


def test_batcher_matches_direct_predictor(tiny_predictor):
    """Same batch composition through the batcher and the direct call must
    produce identical detections (the batcher adds routing, not math)."""
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, SIZE, SIZE, 3), np.uint8)
    b = DynamicBatcher(tiny_predictor, max_wait_ms=500.0)
    b.start(warmup=False)
    try:
        futs = [b.submit_canvas(imgs[i], INFO) for i in range(4)]
        got = [f.result(timeout=120) for f in futs]
    finally:
        b.close()
    dets, valids = tiny_predictor(imgs)
    for i in range(4):
        d = dets[i][valids[i]]
        np.testing.assert_array_equal(got[i].boxes, d[:, :4])
        np.testing.assert_array_equal(got[i].scores, d[:, 4] * d[:, 5])
        np.testing.assert_array_equal(got[i].class_ids,
                                      d[:, 6].astype(np.int32))


def test_concurrent_submitters(tiny_predictor):
    """Many threads hammering submit still get exactly their own result."""
    b = DynamicBatcher(tiny_predictor, max_wait_ms=5.0)
    b.start(warmup=False)
    results = {}
    errors = []

    def worker(idx):
        try:
            rng = np.random.default_rng(idx)
            img = rng.integers(0, 256, (SIZE, SIZE, 3), np.uint8)
            results[idx] = (img, b.submit_canvas(img, INFO).result(120))
        except Exception as exc:  # noqa: BLE001
            errors.append((idx, exc))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
    finally:
        b.close()
    assert not errors, errors
    assert len(results) == 12
    # spot-check two requests against a direct single-image run
    for idx in (0, 11):
        img, res = results[idx]
        dets, valids = tiny_predictor(img[None])
        d = dets[0][valids[0]]
        np.testing.assert_array_equal(res.boxes, d[:, :4])


def test_batcher_int8_static_autocalibrates():
    """int8_static serving through the batcher: the first dispatched batch
    calibrates (Predictor auto-calibration), later batches serve with the
    recorded scales — and results still match the direct path batch-for-
    batch."""
    pred = Predictor(_small_cfg(QUANT="int8_static"), img_size=SIZE,
                     batch_size=2)
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (4, SIZE, SIZE, 3), np.uint8)
    b = DynamicBatcher(pred, max_wait_ms=500.0)
    b.start(warmup=False)
    try:
        first = [b.submit_canvas(imgs[i], INFO) for i in range(2)]
        got_first = [f.result(timeout=300) for f in first]
        assert "quant" in pred.variables  # calibration happened
        second = [b.submit_canvas(imgs[i], INFO) for i in range(2, 4)]
        got_second = [f.result(timeout=300) for f in second]
    finally:
        b.close()
    # the SAME calibrated predictor, driven directly on the same batch,
    # must agree row-for-row
    dets, valids = pred(imgs[2:4])
    for i in range(2):
        d = dets[i][valids[i]]
        np.testing.assert_array_equal(got_second[i].boxes, d[:, :4])
        np.testing.assert_array_equal(
            got_second[i].scores, (d[:, 4] * d[:, 5]).astype(np.float32))
    assert all(r.boxes.shape[1] == 4 for r in got_first)


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def http_runtime():
    cfg = _small_cfg()
    rt = ServingRuntime(cfg, sizes=[SIZE, 32], batch_size=2,
                        max_wait_ms=5.0, conf_thre=0.01)
    rt.start(warmup=False)
    srv = make_server(rt, port=0)
    serve_background(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield rt, base
    srv.shutdown()
    rt.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.read()


def test_http_detect_roundtrip(http_runtime):
    rt, base = http_runtime
    img = np.random.default_rng(3).integers(0, 256, (97, 130, 3), np.uint8)
    ok, jpeg = cv2.imencode(".jpg", img)
    assert ok
    req = urllib.request.Request(f"{base}/v1/detect", data=jpeg.tobytes(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=180) as r:
        assert r.status == 200
        body = json.loads(r.read())
    assert body["img_size"] == SIZE
    assert body["num_detections"] == len(body["detections"])
    for det in body["detections"]:
        assert len(det["box"]) == 4
        assert 0.0 <= det["score"] <= 1.0
        assert isinstance(det["class_name"], str)
        # boxes are in SOURCE coordinates
        assert det["box"][2] <= img.shape[1] + 1
        assert det["box"][3] <= img.shape[0] + 1
    # the non-default bucket serves too
    with urllib.request.urlopen(
            urllib.request.Request(f"{base}/v1/detect?size=32",
                                   data=jpeg.tobytes(), method="POST"),
            timeout=180) as r:
        assert json.loads(r.read())["img_size"] == 32


def test_http_detect_raw_matches_direct(http_runtime):
    """/v1/detect_raw (pre-decoded BGR bytes, no server-side jpeg decode)
    returns exactly what the runtime computes for the same pixels."""
    rt, base = http_runtime
    img = np.random.default_rng(9).integers(0, 256, (41, 53, 3), np.uint8)
    req = urllib.request.Request(
        f"{base}/v1/detect_raw?h=41&w=53", data=img.tobytes(),
        method="POST")
    with urllib.request.urlopen(req, timeout=180) as r:
        assert r.status == 200
        body = json.loads(r.read())
    direct = result_to_json(rt.detect(img))
    for k in ("img_size", "num_detections", "detections"):
        assert body[k] == direct[k], k


def test_http_detect_raw_error_paths(http_runtime):
    rt, base = http_runtime
    img = np.zeros((8, 8, 3), np.uint8)
    # missing shape params
    req = urllib.request.Request(f"{base}/v1/detect_raw",
                                 data=img.tobytes(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
    # body length disagrees with h*w*3
    req = urllib.request.Request(f"{base}/v1/detect_raw?h=9&w=9",
                                 data=img.tobytes(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400


def test_http_health_config_metrics(http_runtime):
    rt, base = http_runtime
    status, body = _get(f"{base}/healthz")
    assert status == 200 and json.loads(body)["status"] == "ok"

    status, body = _get(f"{base}/v1/config")
    cfg = json.loads(body)
    assert cfg["sizes"] == [SIZE, 32]
    assert cfg["batch_size"][str(SIZE)] == 2

    status, body = _get(f"{base}/metrics")
    text = body.decode()
    assert "yolov4_serve_requests_total" in text
    assert "yolov4_serve_e2e_ms" in text
    assert "yolov4_serve_ready 1" in text

    status, body = _get(f"{base}/stats")
    stats = json.loads(body)
    assert stats["ready"] is True
    assert str(SIZE) in stats["buckets"]


def test_mesh_sharded_serving_matches_single_device():
    """ServingRuntime with a device mesh: the batch shards over the
    'data' axis (GSPMD partitions the whole serving program) and
    per-image results match the unsharded predictor on the same batch."""
    import jax
    from yolov4_tpu.parallel.mesh import create_mesh
    from yolov4_tpu.serve import ServingRuntime

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    cfg = _small_cfg()
    mesh = create_mesh()
    rt = ServingRuntime(cfg, sizes=[SIZE], batch_size=8, max_wait_ms=300.0,
                        mesh=mesh)
    rt.start(warmup=False)
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 256, (8, SIZE, SIZE, 3), np.uint8)
    try:
        bucket = rt.buckets[SIZE]
        assert bucket.batch_size == 8  # rounded to a whole per-device count
        futs = [bucket.submit_canvas(imgs[i], INFO) for i in range(8)]
        got = [f.result(timeout=600) for f in futs]
    finally:
        rt.close()
    plain = Predictor(cfg, img_size=SIZE, batch_size=8)
    dets, valids = plain(imgs)
    for i in range(8):
        d = dets[i][valids[i]]
        np.testing.assert_allclose(got[i].boxes, d[:, :4], rtol=1e-5,
                                   atol=1e-4)
        assert got[i].class_ids.shape[0] == d.shape[0]


def test_artifact_serving_matches_live(tiny_predictor, tmp_path):
    """ServingRuntime.from_artifacts drives the exported single-file
    program through the batcher with results identical to the live
    Predictor on the same batch."""
    from yolov4_tpu.serve import ServingRuntime
    from yolov4_tpu.utils.export import export_serving

    path = str(tmp_path / "m.y4x")
    export_serving(tiny_predictor, path)
    rt = ServingRuntime.from_artifacts([path], max_wait_ms=300.0)
    rt.start(warmup=False)
    try:
        assert rt.sizes == [SIZE]
        bucket = rt.buckets[SIZE]
        assert bucket.batch_size == tiny_predictor.batch_size
        assert bucket.predictor.conf_thre == tiny_predictor.conf_thre
        rng = np.random.default_rng(5)
        imgs = rng.integers(0, 256, (4, SIZE, SIZE, 3), np.uint8)
        futs = [bucket.submit_canvas(imgs[i], INFO) for i in range(4)]
        got = [f.result(timeout=300) for f in futs]
    finally:
        rt.close()
    dets, valids = tiny_predictor(imgs)
    for i in range(4):
        d = dets[i][valids[i]]
        np.testing.assert_array_equal(got[i].boxes, d[:, :4])
        np.testing.assert_array_equal(
            got[i].scores, (d[:, 4] * d[:, 5]).astype(np.float32))
    # duplicate sizes are rejected
    with pytest.raises(ValueError, match="duplicate"):
        ServingRuntime.from_artifacts([path, path])


def test_http_error_paths(http_runtime):
    rt, base = http_runtime
    # junk body -> 400, not a dead server
    req = urllib.request.Request(f"{base}/v1/detect", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    # unknown bucket -> 400 via KeyError
    ok, jpeg = cv2.imencode(".jpg", np.zeros((8, 8, 3), np.uint8))
    req = urllib.request.Request(f"{base}/v1/detect?size=999",
                                 data=jpeg.tobytes(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/nope")
    assert e.value.code == 404
    # server still alive afterwards
    status, _ = _get(f"{base}/healthz")
    assert status == 200


def test_http_oversize_body_rejected(http_runtime):
    rt, base = http_runtime
    # raw socket: urllib would try to SEND the advertised body; the server
    # must 413 (and close) from the header alone, before any body arrives
    import socket
    host, port = base.replace("http://", "").split(":")
    with socket.create_connection((host, int(port)), timeout=60) as s:
        s.sendall(b"POST /v1/detect HTTP/1.1\r\n"
                  b"Host: x\r\n"
                  b"Content-Length: 209715200\r\n\r\n")
        status_line = s.makefile("rb").readline()
    assert b"413" in status_line, status_line
    # server alive afterwards
    status, _ = _get(f"{base}/healthz")
    assert status == 200
