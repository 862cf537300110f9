"""detect.py video mode: batched detection over a frame stream."""
import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import detect as detect_cli
from yolov4_tpu.config import load_config
from yolov4_tpu.data.transforms import Transform
from yolov4_tpu.engine.predictor import Predictor

N_FRAMES = 10


def _write_video(path: str, n=N_FRAMES, hw=(80, 100)):
    for fourcc, ext in (("mp4v", ".mp4"), ("MJPG", ".avi")):
        p = os.path.splitext(path)[0] + ext
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*fourcc), 10.0,
                            (hw[1], hw[0]))
        if not w.isOpened():
            continue
        rng = np.random.default_rng(0)
        for i in range(n):
            frame = rng.integers(0, 255, (*hw, 3), np.uint8)
            cv2.rectangle(frame, (10 + i, 20), (60 + i, 60), (0, 0, 255), -1)
            w.write(frame)
        w.release()
        return p
    pytest.skip("no usable cv2 video codec in this image")


def test_process_video_roundtrip(tmp_path):
    src = _write_video(str(tmp_path / "in.mp4"))
    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25)
    cfg["TEST"].update(IMGSIZE=64, PRE_NMS_TOPK=64, MAX_DETS=10)
    pred = Predictor(cfg, img_size=64, batch_size=4, conf_thre=0.3,
                     nms_thre=0.5)
    transform = Transform(cfg, is_train=False, keep_uint8=True)
    out = str(tmp_path / "out.mp4")
    seen = []
    n, written = detect_cli.process_video(pred, transform, 64, src, out,
                                          progress=seen.append)
    assert n == N_FRAMES
    # the returned path is the annotated copy (may be .avi on fallback)
    assert os.path.exists(written)
    cap = cv2.VideoCapture(written)
    count = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (80, 100, 3)
        count += 1
    cap.release()
    assert count == N_FRAMES
    assert seen and seen[-1] <= N_FRAMES


def test_video_source_detection():
    assert "clip.mp4".lower().endswith(detect_cli.VIDEO_EXTS)
    assert not "img.jpg".lower().endswith(detect_cli.VIDEO_EXTS)
