#!/usr/bin/env python3
"""Generate golden parity fixtures from the reference implementation.

Run where /root/reference is mounted; writes small .npz files under
tests/goldens/ so the always-on golden tests (tests/test_goldens.py) can
pin reference numerics without importing the reference.

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np

np.int = int
np.alltrue = np.all

import torch

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

MODEL_CFG = {
    "TYPE": "YOLOv4", "BACKBONE_PRETRAINED": None,
    "ANCHORS": [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55],
                [72, 146], [142, 110], [192, 243], [459, 401]],
    "ANCHOR_MASK": [[0, 1, 2], [3, 4, 5], [6, 7, 8]],
    "N_CLASSES": 80,
}


def save(name, **arrays):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"{path}: {os.path.getsize(path) / 1024:.0f} KB")


def golden_blocks():
    from darknet.darknet import ConvBNAct, CSPDownSample0, CSPDownSample

    torch.manual_seed(100)
    cases = {
        "convbnact_mish": (ConvBNAct(3, 8, 3, 1, act="mish"), 3),
        "convbnact_stride2": (ConvBNAct(4, 8, 3, 2, act="leaky_relu"), 4),
        "convbnact_bias_linear": (
            ConvBNAct(4, 8, 1, 1, bias=True, bn=False, act="linear"), 4),
        "csp0": (CSPDownSample0(8, 16, 3, 2, act="mish"), 8),
        "csp": (CSPDownSample(16, 32, 3, 2, num_blocks=2, act="mish"), 16),
    }
    for name, (mod, cin) in cases.items():
        mod.eval()
        x = torch.randn(2, cin, 16, 16)
        with torch.no_grad():
            y = mod(x)
        arrays = {f"sd/{k}": v.numpy() for k, v in mod.state_dict().items()}
        save(f"block_{name}", x=x.numpy(), y=y.numpy(), **arrays)


def golden_decode_and_loss():
    from yolo.model.yololayer import YOLOLayer
    from yolo.model.yololoss import YOLOLoss

    torch.manual_seed(101)
    rng = np.random.default_rng(101)
    raws, outputs, preds, evals = [], [], [], []
    for layer_no, fsize in [(0, 8), (1, 4), (2, 2)]:
        raw = torch.randn(2, 255, fsize, fsize)
        layer = YOLOLayer(MODEL_CFG, layer_no=layer_no, device=None)
        layer.train()
        out = layer(raw.clone())
        layer.eval()
        ev = layer(raw.clone()).detach().numpy()
        raws.append(raw.numpy())
        outputs.append(out["output"].detach().numpy())
        preds.append(out["pred"].detach().numpy())
        evals.append(ev)

    labels = np.zeros((2, 60, 5), np.float32)
    for b, n in [(0, 4), (1, 0)]:  # second image: zero labels
        labels[b, :n, 0] = rng.uniform(5, 59, n)
        labels[b, :n, 1] = rng.uniform(5, 59, n)
        labels[b, :n, 2] = rng.uniform(2, 30, n)
        labels[b, :n, 3] = rng.uniform(2, 30, n)
        labels[b, :n, 4] = rng.integers(0, 80, n)
    criterion = YOLOLoss(MODEL_CFG, ignore_thresh=0.7, device=None)
    t_out = [{"layer_no": i,
              "output": torch.from_numpy(outputs[i].copy()),
              "pred": torch.from_numpy(preds[i].copy())} for i in range(3)]
    loss = criterion(t_out, {"padded_labels": torch.from_numpy(labels)}).item()

    save("decode_loss",
         raw0=raws[0], raw1=raws[1], raw2=raws[2],
         out0=outputs[0], out1=outputs[1], out2=outputs[2],
         pred0=preds[0], pred1=preds[1], pred2=preds[2],
         eval0=evals[0], eval1=evals[1], eval2=evals[2],
         labels=labels, loss=np.float32(loss))


def golden_postprocess():
    from yolo.util.utils import postprocess

    rng = np.random.default_rng(102)
    b, n, c = 2, 300, 80
    preds = np.zeros((b, n, 5 + c), np.float32)
    preds[..., 0:2] = rng.uniform(50, 550, (b, n, 2))
    preds[..., 2:4] = rng.uniform(10, 120, (b, n, 2))
    preds[..., 4] = rng.uniform(0, 1, (b, n))
    cls = rng.uniform(0, 0.2, (b, n, c))
    live = rng.random((b, n, c)) < 0.02
    preds[..., 5:] = np.where(live, rng.uniform(0, 1, (b, n, c)), cls)

    out = postprocess(torch.from_numpy(preds.copy()), c, conf_thre=0.4,
                      nms_thre=0.45)
    dets = [o.numpy() if o is not None else np.zeros((0, 7), np.float32)
            for o in out]
    save("postprocess", preds=preds, det0=dets[0], det1=dets[1],
         conf=np.float32(0.4), nms=np.float32(0.45))


if __name__ == "__main__":
    golden_blocks()
    golden_decode_and_loss()
    golden_postprocess()
