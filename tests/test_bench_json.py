"""The driver-facing bench.py JSON contract.

The driver parses exactly one JSON line from bench.py at every round end
(metric/value/unit/vs_baseline). Three shapes exist: a measured run, a
watchdog partial (global budget expired mid-measurement — round 3's
BENCH_r03.json rc=124 is the failure this prevents), and — because the
experimental `axon` tunnel has shown hours-long outages — an honest
zero-rate fallback that must still parse and must carry the last
successful run's hardware-meaningful rates (bench_last.json). These tests
pin all three shapes without touching any backend.
"""
import io
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

REQUIRED = {"metric", "value", "unit", "vs_baseline"}


@pytest.fixture(autouse=True)
def _reset_state():
    bench._state["printed"] = False
    bench._state["rates"] = []
    bench._state["tunnel_MBps"] = None
    bench._state["img_size"] = 608
    bench._state["child"] = None
    bench._state["phases"] = {}
    yield
    bench._state["printed"] = False
    bench._state["rates"] = []
    bench._state["phases"] = {}


def _stdout_lines(monkeypatch, fn, *args, **kwargs):
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    try:
        fn(*args, **kwargs)
    finally:
        monkeypatch.undo()
    return [ln for ln in buf.getvalue().splitlines() if ln.strip()]


def _capture_emit(tmp_path, seed_last=None, monkeypatch=None):
    # LAST_RESULT_PATH is repo-root-anchored (the driver may run bench.py
    # from any cwd); point it into the sandbox for the test
    path = str(tmp_path / "bench_last.json")
    monkeypatch.setattr(bench, "LAST_RESULT_PATH", path)
    if seed_last is not None:
        with open(path, "w") as f:
            json.dump(seed_last, f)
    lines = _stdout_lines(monkeypatch, bench.emit_backend_down, 608)
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


# ---- round-4 survivability contract ---------------------------------


def test_primary_result_shape():
    r = bench.primary_result([10.0, 30.0, 20.0], 608, tunnel_MBps=25.3)
    assert REQUIRED <= set(r)
    assert r["value"] == 20.0  # median
    assert r["metric"] == "coco_e2e_images_per_sec_per_chip_608"
    assert r["tunnel_MBps"] == 25.3
    assert r["windows"] == 3
    assert "partial" not in r
    p = bench.primary_result([10.0], 416, partial=True)
    assert p["partial"] is True
    assert "tunnel_MBps" not in p
    assert p["metric"] == "coco_e2e_images_per_sec_per_chip_416"


def test_emit_primary_is_idempotent_single_line(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "bench_last.json"))
    r = bench.primary_result([20.0, 22.0, 24.0], 608)

    def both():
        assert bench.emit_primary(r) is True
        assert bench.emit_primary(r) is False  # second call: no output
        bench.emit_backend_down(608)  # post-primary fallback: no output

    lines = _stdout_lines(monkeypatch, both)
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 22.0
    # persisted incrementally for the backend-down path of FUTURE runs
    with open(tmp_path / "bench_last.json") as f:
        assert json.load(f)["result"]["value"] == 22.0


def test_watchdog_emits_partial_median(tmp_path, monkeypatch):
    """Budget expiry mid-measurement still yields a parsable honest line."""
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "bench_last.json"))
    bench._state["rates"] = [18.0, 26.3, 19.7, 19.1]
    bench._state["tunnel_MBps"] = 21.0
    lines = _stdout_lines(monkeypatch, bench._watchdog_emit)
    assert len(lines) == 1
    d = json.loads(lines[0])
    assert REQUIRED <= set(d)
    assert d["partial"] is True
    assert d["windows"] == 4
    assert d["value"] == 19.4  # median of the completed windows
    assert d["tunnel_MBps"] == 21.0
    # a degraded partial (few windows, no device extras) must NOT clobber
    # the last FULL record future backend-down lines re-publish
    assert not os.path.exists(tmp_path / "bench_last.json")


def test_watchdog_with_no_windows_reports_budget_expired(
        tmp_path, monkeypatch):
    """Zero windows at budget expiry is NOT an outage claim: a healthy
    backend that spent the budget compiling must not be recorded as
    backend_unavailable."""
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "bench_last.json"))
    lines = _stdout_lines(monkeypatch, bench._watchdog_emit)
    assert len(lines) == 1
    d = json.loads(lines[0])
    assert d["value"] == 0.0
    assert d["budget_expired"] is True
    assert "backend_unavailable" not in d
    assert "budget expired" in d["note"]
    assert not os.path.exists(tmp_path / "bench_last.json")


def test_crash_note_reaches_fallback_line(tmp_path, monkeypatch):
    """The __main__ guard routes in-run crashes through _watchdog_emit
    with the exception in the note (zero stdout lines would lose the
    round)."""
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "bench_last.json"))
    lines = _stdout_lines(monkeypatch, bench._watchdog_emit,
                          note="bench crashed mid-run: XlaRuntimeError: x")
    d = json.loads(lines[0])
    assert d["budget_expired"] is True
    assert "XlaRuntimeError" in d["note"]


def test_crash_note_rides_partial_line(tmp_path, monkeypatch):
    """ADVICE r4: a run that crashed mid-extras after >=1 window must be
    distinguishable from one the budget merely truncated."""
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "bench_last.json"))
    bench._state["rates"] = [18.0, 20.0]
    lines = _stdout_lines(monkeypatch, bench._watchdog_emit,
                          note="bench crashed mid-run: ValueError: x")
    d = json.loads(lines[0])
    assert d["partial"] is True
    assert d["value"] == 19.0
    assert "ValueError" in d["note"]


def test_plain_budget_expiry_partial_has_no_crash_note(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "bench_last.json"))
    bench._state["rates"] = [18.0]
    lines = _stdout_lines(monkeypatch, bench._watchdog_emit)
    d = json.loads(lines[0])
    assert d["partial"] is True
    assert "note" not in d


def test_fallback_carries_attribution_fields(tmp_path, monkeypatch):
    """VERDICT r4 weak #2: a zero needs explaining — tunnel_MBps and the
    phase breakdown must ride every fallback line that has them."""
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "bench_last.json"))
    bench._state["tunnel_MBps"] = 12.53
    bench._state["phases"] = {"backend_probe_s": 33.04, "compile_s": 401.2}
    lines = _stdout_lines(monkeypatch, bench.emit_backend_down, 608)
    d = json.loads(lines[0])
    assert d["tunnel_MBps"] == 12.5
    assert d["phases_s"] == {"backend_probe_s": 33.0, "compile_s": 401.2}


def test_primary_result_carries_phases(monkeypatch):
    bench._state["phases"] = {"compile_s": 12.345, "windows_s": 100.0}
    r = bench.primary_result([20.0, 21.0, 22.0], 608)
    assert r["phases_s"] == {"compile_s": 12.3, "windows_s": 100.0}


def test_vs_baseline_null_without_published_number():
    """BASELINE.json `published` is {} (the reference records no
    throughput, engine/build.py:93-99) -> vs_baseline stays null."""
    assert bench.compute_vs_baseline(30.0) is None
    r = bench.primary_result([30.0], 608)
    assert r["vs_baseline"] is None


def test_vs_baseline_ratio_when_published(tmp_path, monkeypatch):
    p = tmp_path / "BASELINE.json"
    p.write_text(json.dumps(
        {"published": {"images_per_sec_per_chip_608": 20.0}}))
    monkeypatch.setattr(bench, "BASELINE_PATH", str(p))
    assert bench.compute_vs_baseline(30.0) == 1.5
    # unreadable/malformed file degrades to null, never raises
    p.write_text("{broken")
    assert bench.compute_vs_baseline(30.0) is None


def test_watchdog_after_primary_is_silent(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "bench_last.json"))

    def seq():
        bench.emit_primary(bench.primary_result([30.0, 31.0, 32.0], 608))
        bench._watchdog_emit()

    lines = _stdout_lines(monkeypatch, seq)
    assert len(lines) == 1, "watchdog must not add a second stdout line"


def test_plan_windows_adapts_to_budget():
    # plenty of budget: plan what was requested
    assert bench.plan_windows(12, per_window_s=8.0, remaining_s=900) == 12
    # tight budget: shrink, but never below the minimum of 3
    assert bench.plan_windows(12, per_window_s=8.0, remaining_s=60) == 5
    assert bench.plan_windows(12, per_window_s=30.0, remaining_s=40) == 3
    # unknown window cost: don't guess, keep the request
    assert bench.plan_windows(12, per_window_s=0.0, remaining_s=40) == 12


def test_budget_default_and_override(monkeypatch):
    # 780 s default: inside every plausible driver timeout (see bench.py
    # module docstring) while fitting congested 12-window medians
    monkeypatch.delenv("YOLOV4_BENCH_BUDGET_S", raising=False)
    assert bench.budget_s() == 780.0
    monkeypatch.setenv("YOLOV4_BENCH_BUDGET_S", "120")
    assert bench.budget_s() == 120.0
    monkeypatch.setenv("YOLOV4_BENCH_BUDGET_S", "junk")
    assert bench.budget_s() == 780.0
