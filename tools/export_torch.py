#!/usr/bin/env python3
"""Export a native checkpoint to a reference-compatible torch .pth.tar.

    python tools/export_torch.py outputs/.../model_best.ckpt out.pth.tar

The produced file loads into the reference repo's YOLOv4 via its normal
checkpoint path (state_dict layout identical, verified against the
reference model's key set in tests/test_torch_convert.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", help="native .ckpt checkpoint")
    parser.add_argument("out", help="output .pth.tar path")
    args = parser.parse_args()

    import torch

    from yolov4_tpu.utils import checkpoint as ckpt_lib
    from yolov4_tpu.utils.torch_convert import export_state_dict

    raw = ckpt_lib.load_checkpoint_raw(args.ckpt)
    variables = raw.get("variables", raw)
    state_dict = {k: torch.from_numpy(v.copy())
                  for k, v in export_state_dict(variables).items()}
    meta = raw.get("meta", {})
    blob = {
        "epoch": meta.get("epoch", 0),
        "ap50": meta.get("ap50", 0.0),
        "ap50_95": meta.get("ap50_95", 0.0),
        "best_ap50": meta.get("best_ap50", 0.0),
        "best_ap50_95": meta.get("best_ap50_95", 0.0),
        "state_dict": state_dict,
    }
    torch.save(blob, args.out)
    print(f"wrote {args.out} ({len(state_dict)} tensors)")


if __name__ == "__main__":
    sys.exit(main())
