"""Letterbox eval A/B on an already-trained smoke checkpoint.

TEST.LETTERBOX changes eval GEOMETRY only (host preprocessing + box
unmapping; the device program is shape-identical), so the knob's on-chip
A/B is an eval-only comparison on the SAME trained params.
"""
import sys

sys.path.insert(0, ".")
from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import copy

from yolov4_tpu.config import load_config
from yolov4_tpu.data.coco import COCODataset
from yolov4_tpu.data.pipeline import DataLoader
from yolov4_tpu.data.transforms import Transform
from yolov4_tpu.engine.evaluator import validate
from yolov4_tpu.engine.predictor import Predictor
from yolov4_tpu.utils import checkpoint as ckpt_lib

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gs_easy/out/model_best.ckpt"
ROOT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gs_easy"
S, B = 320, 8

variables = ckpt_lib.load_variables(CKPT)
for mode, letterbox in (("stretch", False), ("letterbox", True)):
    cfg = load_config()
    cfg["TRAIN"]["IMGSIZE"] = S
    cfg["TEST"].update(IMGSIZE=S, BATCH_SIZE=B, CONFTHRE=0.3, NMSTHRE=0.4,
                       LETTERBOX=letterbox)
    ds = COCODataset(ROOT, "val2017", img_size=S, is_train=False,
                     transform=Transform(cfg, is_train=False,
                                         keep_uint8=True))
    pred = Predictor(cfg, variables=variables, img_size=S, batch_size=B,
                     conf_thre=0.3, nms_thre=0.4)
    ap, ap50 = validate(DataLoader(ds, batch_size=B, shuffle=False), pred,
                        verbose=False)
    print(f"LB_AB {mode:9s}: held-out AP {ap:.4f} AP50 {ap50:.4f}",
          flush=True)
