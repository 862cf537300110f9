"""End-to-end exercise of tools/run_coco_gate.py (the armed 0.359 gate).

The gate is the one command that will produce the published-number claim
(reference README.md:122-123) whenever COCO val2017 + trained weights
appear. Every pipeline piece is parity-tested individually; these tests
pin the gate SCRIPT itself — prerequisite reporting, the full
data→predictor→COCOeval path on a committed synthetic fixture, and the
report schema — so it cannot rot while waiting for the data.
"""

import importlib.util
import json
import os
import re
import subprocess
import sys

import pytest

import jax

from tests.fixtures import make_fake_coco

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "tools", "run_coco_gate.py")


def _load_gate_module():
    spec = importlib.util.spec_from_file_location("run_coco_gate", GATE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_blocked_reports_both_missing_prereqs(tmp_path):
    """No data + no weights -> exit 2 and a remediation list (gate
    docstring contract: 'says exactly what is missing')."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("COCO_ROOT", "YOLOV4_CKPT")}
    env["YOLOV4_TPU_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, GATE], cwd=tmp_path, env=env,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 2, out.stdout + out.stderr
    assert "BLOCKED" in out.stdout
    assert "val2017" in out.stdout and "weights" in out.stdout


@pytest.fixture(scope="module")
def gate_fixture(tmp_path_factory):
    """Synthetic COCO-layout val2017 + a native checkpoint + reduced cfg."""
    root = tmp_path_factory.mktemp("gate")
    data = str(root / "COCO")
    make_fake_coco(data, "val2017", n_images=4, seed=7)

    from yolov4_tpu.config import load_config
    from yolov4_tpu.models.yolov4 import build_model, init_variables
    from yolov4_tpu.utils import checkpoint as ckpt_lib

    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.34, COMPUTE_DTYPE="float32",
                        S2D_STEM=False, WPACK=False, SPLIT_HEAD=False,
                        PALLAS_CSP=False, BACKBONE_PRETRAINED=None)
    cfg["TEST"]["IMGSIZE"] = 96
    cfg_path = str(root / "gate.cfg")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)  # JSON is valid YAML; cfg is a dict subclass

    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), 96)
    ckpt_path = ckpt_lib.save_checkpoint(
        {"variables": variables}, is_best=False, output_dir=str(root),
        filename="gate_weights.ckpt")
    return {"data": data, "cfg": cfg_path, "ckpt": ckpt_path}


def test_gate_runs_end_to_end_on_fixture(gate_fixture, capsys, monkeypatch):
    """The full gate path — data discovery, checkpoint load, batched
    Predictor eval, first-party COCOeval, report + verdict — on the
    committed synthetic fixture. Random weights must yield a sane AP in
    [0, 1] and a NOT-met verdict (exit 1), proving the armed gate's
    plumbing and report schema without real COCO."""
    gate = _load_gate_module()
    monkeypatch.setattr(sys, "argv", [
        "run_coco_gate.py", "--data", gate_fixture["data"],
        "--checkpoint", gate_fixture["ckpt"], "--cfg", gate_fixture["cfg"],
        "--batch-size", "2", "--pre-nms-topk", "256", "--max-dets", "64",
    ])
    monkeypatch.chdir(REPO)
    with pytest.raises(SystemExit) as e:
        gate.main()
    out = capsys.readouterr().out

    # report schema: both measured numbers with their published anchors
    m = re.search(r"GATE: AP (\d\.\d+) \(published 0\.35925\) "
                  r"AP50 (\d\.\d+) \(published 0\.59468\)", out)
    assert m, out
    ap, ap50 = float(m.group(1)), float(m.group(2))
    assert 0.0 <= ap <= 1.0 and 0.0 <= ap50 <= 1.0
    assert ap50 >= ap - 1e-9  # COCO invariant: AP50 dominates AP[.50:.95]
    # random weights cannot meet the published number
    assert e.value.code == 1
    assert "GATE NOT met" in out
    assert f"data: {gate_fixture['data']}" in out


def test_gate_reports_layout_remediation(tmp_path):
    """A stock-distribution layout (val2017/ at top level) gets the
    mkdir/ln remediation hint instead of a mid-run crash."""
    gate = _load_gate_module()
    ann = tmp_path / "annotations"
    ann.mkdir()
    (ann / "instances_val2017.json").write_text("{}")
    (tmp_path / "val2017").mkdir()
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        found = gate.find_data(str(tmp_path))
    assert found is None
    assert "images/val2017" in buf.getvalue()
