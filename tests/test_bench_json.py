"""The driver-facing bench.py JSON contract.

The driver parses exactly one JSON line from bench.py at every round end
(metric/value/unit/vs_baseline). Two shapes exist: a measured run, and —
because the experimental `axon` tunnel has shown hours-long outages — an
honest zero-rate fallback that must still parse and must carry the last
successful run's hardware-meaningful rates (bench_last.json). These tests
pin both shapes without touching any backend.
"""
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

REQUIRED = {"metric", "value", "unit", "vs_baseline"}


def _capture_emit(tmp_path, seed_last=None, monkeypatch=None):
    # LAST_RESULT_PATH is repo-root-anchored (the driver may run bench.py
    # from any cwd); point it into the sandbox for the test
    path = str(tmp_path / "bench_last.json")
    monkeypatch.setattr(bench, "LAST_RESULT_PATH", path)
    if seed_last is not None:
        with open(path, "w") as f:
            json.dump(seed_last, f)
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.emit_backend_down(608)
    monkeypatch.undo()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, "driver expects exactly one JSON line"
    return json.loads(lines[0])


def test_backend_down_line_parses_with_required_fields(tmp_path, monkeypatch):
    d = _capture_emit(tmp_path, monkeypatch=monkeypatch)
    assert REQUIRED <= set(d)
    assert d["value"] == 0.0
    assert d["backend_unavailable"] is True
    assert d["metric"] == "coco_e2e_images_per_sec_per_chip_608"
    # no last-good file in this cwd -> no stale/invented numbers
    assert "last_recorded" not in d


def test_backend_down_carries_last_good_result(tmp_path, monkeypatch):
    last = {"recorded_at": "2026-08-17T19:30:00Z", "source": "test",
            "result": {"metric": "coco_e2e_images_per_sec_per_chip_608",
                       "value": 33.61, "unit": "images/sec",
                       "vs_baseline": None,
                       "device_fwd_nms_img_s": 538.0}}
    d = _capture_emit(tmp_path, seed_last=last, monkeypatch=monkeypatch)
    assert d["last_recorded"]["result"]["device_fwd_nms_img_s"] == 538.0
    assert d["last_recorded"]["recorded_at"] == "2026-08-17T19:30:00Z"


def test_backend_down_survives_corrupt_last_file(tmp_path, monkeypatch):
    with open(tmp_path / "bench_last.json", "w") as f:
        f.write("{not json")
    d = _capture_emit(tmp_path, monkeypatch=monkeypatch)
    # corrupt file is ignored, the line still parses
    assert "last_recorded" not in d
    assert REQUIRED <= set(d)


def test_last_result_path_is_repo_anchored():
    """The driver invokes bench.py from its own cwd; the seed must
    resolve to the repo copy regardless."""
    assert os.path.isabs(bench.LAST_RESULT_PATH)
    assert os.path.dirname(bench.LAST_RESULT_PATH) == os.path.dirname(
        os.path.abspath(bench.__file__))


def test_repo_bench_last_json_is_valid_and_consistent():
    """The checked-in seed must itself satisfy the contract it feeds."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), bench.LAST_RESULT_PATH)
    with open(path) as f:
        last = json.load(f)
    assert {"recorded_at", "source", "result"} <= set(last)
    assert REQUIRED <= set(last["result"])
    assert last["result"]["value"] > 0
