#!/usr/bin/env python3
"""Single/batch image detection CLI (reference detect.py surface).

Usage:
    python detect.py --cfg configs/yolov4_Tianxiaomo.cfg \
        --ckpt outputs/model_best.ckpt --source ./data/images/ \
        [--dest runs/detect/] [--conf-thre 0.2] [--nms-thre 0.5]

Differences from the reference (detect.py:28-253): inference is batched
through one jit-compiled program (model + decode + on-device NMS) instead of
a per-image python loop; checkpoints may be native .ckpt or the reference's
torch .pth.tar (auto-converted).
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import cv2
import numpy as np

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

from yolov4_tpu.config import load_config
from yolov4_tpu.data.transforms import Transform
from yolov4_tpu.engine.predictor import Predictor
from yolov4_tpu.ops.boxes import unmap_to_source_xyxy
from yolov4_tpu.utils import checkpoint as ckpt_lib
from yolov4_tpu.utils.logging import setup_logging, get_logger
from yolov4_tpu.utils.visualize import class_name, draw_detections


def parse_args():
    parser = argparse.ArgumentParser(description="TPU YOLOv4 Detection.")
    parser.add_argument("--cfg", type=str, default="configs/yolov4_default.cfg")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint file (.ckpt or reference .pth.tar)")
    parser.add_argument("--source", type=str, default="./data/images/",
                        help="image file or directory")
    parser.add_argument("--dest", type=str, default="./runs/detect/",
                        help="output directory root")
    parser.add_argument("--conf-thre", type=float, default=-0.1)
    parser.add_argument("--nms-thre", type=float, default=-0.1)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--quant", choices=("none", "int8", "int8_static"),
                        default=None,
                        help="serving quantization mode (default cfg "
                             "MODEL.QUANT; int8* are faster but not "
                             "reference-exact)")
    parser.add_argument("--letterbox", action="store_true",
                        help="aspect-preserving letterbox preprocessing "
                             "(cfg TEST.LETTERBOX; default: the "
                             "reference's stretch-resize)")
    return parser.parse_args()


def increment_path(path: str) -> Path:
    """runs/detect/exp -> exp2 -> exp3 ... (reference detect.py:125-148)."""
    path = Path(path)
    if path.exists():
        for n in range(2, 9999):
            candidate = Path(f"{path}{n}")
            if not candidate.exists():
                path = candidate
                break
        else:  # never silently reuse (= overwrite) an existing run dir
            raise SystemExit(f"error: {path}2..{path}9998 all exist")
    path.mkdir(parents=True, exist_ok=True)
    return path


VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")
IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(source: str):
    if os.path.isfile(source):
        return [source]
    if not os.path.isdir(source):
        raise SystemExit(f"error: --source {source!r} is neither a file nor a directory")
    # extension match is case-insensitive: camera files are often .JPG
    return sorted(
        os.path.join(source, f) for f in os.listdir(source)
        if f.lower().endswith(IMAGE_EXTS))


def process_video(predictor, transform, img_size: int, src_path: str,
                  out_path: str, progress=None):
    """Run batched detection over a video stream; writes an annotated copy.

    Frames batch through the same compiled program as still images (the
    video is just a frame source); a full batch is in flight while the
    previous one draws/encodes. Returns (frames_written, actual_out_path)
    — the path may gain an .avi extension when the mp4 codec is absent.
    Beyond the reference CLI (images only, detect.py:51-81)."""
    cap = cv2.VideoCapture(src_path)
    if not cap.isOpened():
        raise SystemExit(f"error: cannot open video {src_path!r}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():  # codec fallback
        out_path = os.path.splitext(out_path)[0] + ".avi"
        writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"MJPG"),
                                 fps, (w, h))
    if not writer.isOpened():
        # write() on an unopened writer is a silent no-op — fail loudly
        # instead of reporting N frames that never hit disk
        cap.release()
        raise SystemExit("error: no usable cv2 video encoder "
                         "(tried mp4v, MJPG)")

    def read_batch():
        frames, canvases, infos = [], [], []
        while len(frames) < predictor.batch_size:
            ok, frame = cap.read()
            if not ok:
                break
            canvas, target = transform([frame], [np.zeros((0, 5))], img_size)
            frames.append(frame)
            canvases.append(canvas)
            infos.append(target["img_info"])
        return frames, canvases, infos

    def draw(frames, infos, dets, valids):
        for i, frame in enumerate(frames):
            det = dets[i][valids[i]]
            src_h, src_w, dst_h, dst_w = infos[i][:4]
            off = tuple(infos[i][4:6]) if len(infos[i]) >= 6 else (0, 0)
            boxes = np.asarray(unmap_to_source_xyxy(
                det[:, :4], (src_h, src_w), (dst_h, dst_w), offset_xy=off))
            writer.write(draw_detections(
                frame, boxes, det[:, 4] * det[:, 5],
                det[:, 6].astype(int)))

    n_out = 0
    pending = None  # (frames, infos, device futures)
    while True:
        frames, canvases, infos = read_batch()
        if frames:
            out = predictor.dispatch(np.stack(canvases))
            nxt = (frames, infos, out)
        else:
            nxt = None
        if pending is not None:
            pf, pi, po = pending
            dets = predictor.fetch_local(po[0])[:len(pf)]
            valids = predictor.fetch_local(po[1])[:len(pf)]
            draw(pf, pi, dets, valids)
            n_out += len(pf)
            if progress:
                progress(n_out)
        pending = nxt
        if pending is None:
            break
    cap.release()
    writer.release()
    return n_out, out_path


def main():
    args = parse_args()
    setup_logging(0)
    logger = get_logger(__name__)
    cfg = load_config(args.cfg)
    if args.quant is not None:
        cfg["MODEL"]["QUANT"] = args.quant
    if args.letterbox:
        cfg["TEST"]["LETTERBOX"] = True
    conf_thre = cfg["TEST"]["CONFTHRE"] if args.conf_thre < 0 else args.conf_thre
    nms_thre = cfg["TEST"]["NMSTHRE"] if args.nms_thre < 0 else args.nms_thre
    img_size = cfg["TEST"]["IMGSIZE"]

    video_mode = (os.path.isfile(args.source)
                  and args.source.lower().endswith(VIDEO_EXTS))
    paths = [] if video_mode else list_images(args.source)
    if not video_mode:
        if not paths:
            raise FileNotFoundError(
                f"no image files ({'/'.join(IMAGE_EXTS)}) under {args.source}")
        logger.info(f"detecting {len(paths)} image(s) at {img_size}x"
                    f"{img_size}, conf {conf_thre}, nms {nms_thre}")

    variables = None
    if args.ckpt:
        variables = ckpt_lib.load_variables(args.ckpt)
        logger.info(f"loaded checkpoint {args.ckpt}")
    else:
        logger.warning("no --ckpt given: running with RANDOM weights")

    transform = Transform(cfg, is_train=False, keep_uint8=True)

    if video_mode:
        predictor = Predictor(cfg, variables=variables, img_size=img_size,
                              batch_size=args.batch_size,
                              conf_thre=conf_thre, nms_thre=nms_thre)
        dest = increment_path(os.path.join(args.dest, "exp"))
        stem = os.path.splitext(os.path.basename(args.source))[0]
        out_path = os.path.join(str(dest), f"{stem}_det.mp4")
        logger.info(f"video {args.source} at {img_size}x{img_size}, "
                    f"conf {conf_thre}, nms {nms_thre}")
        t0 = time.time()
        n, out_path = process_video(
            predictor, transform, img_size, args.source, out_path,
            progress=lambda k: (k % (args.batch_size * 8) == 0
                                and logger.info(f"  {k} frames...")))
        dt = time.time() - t0
        logger.info(f"done: {n} frames in {dt:.2f}s "
                    f"({n / max(dt, 1e-9):.1f} fps) -> {out_path}")
        return
    predictor = Predictor(cfg, variables=variables, img_size=img_size,
                          batch_size=min(args.batch_size, len(paths)),
                          conf_thre=conf_thre, nms_thre=nms_thre)

    dest = increment_path(os.path.join(args.dest, "exp"))
    t0 = time.time()
    n_done = 0

    # decode + preprocess per chunk (constant memory — a large --source
    # directory must not hold every raw frame + canvas in RAM at once)
    def load_chunk(start):
        raw_imgs, batch, infos = [], [], []
        for p in paths[start:start + predictor.batch_size]:
            img = cv2.imread(p)
            assert img is not None, p
            out, target = transform([img], [np.zeros((0, 5))], img_size)
            raw_imgs.append(img)
            batch.append(out)
            infos.append(target["img_info"])
        return raw_imgs, np.stack(batch), infos

    def draw_chunk(start, raw_imgs, infos, dets, valids):
        nonlocal n_done
        for i in range(len(raw_imgs)):
            idx = start + i
            src_h, src_w, dst_h, dst_w = infos[i][:4]
            off = tuple(infos[i][4:6]) if len(infos[i]) >= 6 else (0, 0)
            det = dets[i][valids[i]]
            boxes = np.asarray(unmap_to_source_xyxy(
                det[:, :4], (src_h, src_w), (dst_h, dst_w), offset_xy=off))
            scores = det[:, 4] * det[:, 5]
            cls_idxs = det[:, 6].astype(int)

            summary = {}
            for c in cls_idxs:
                summary[class_name(c)] = summary.get(class_name(c), 0) + 1
            desc = (", ".join(f"{v} {k}" for k, v in summary.items())
                    or "no detections")
            logger.info(f"image {idx + 1}/{len(paths)} "
                        f"{os.path.basename(paths[idx])}: {desc}")

            drawn = draw_detections(raw_imgs[i].copy(), boxes, scores,
                                    cls_idxs)
            out_path = os.path.join(str(dest), os.path.basename(paths[idx]))
            cv2.imwrite(out_path, drawn)
            n_done += 1

    def consume(pending):
        start, raw_imgs, infos, out = pending
        dets = predictor.fetch_local(out[0])[:len(raw_imgs)]
        valids = predictor.fetch_local(out[1])[:len(raw_imgs)]
        draw_chunk(start, raw_imgs, infos, dets, valids)

    # dispatch-ahead (the process_video pattern): the next chunk's decode/
    # preprocess/upload overlaps the previous chunk's device pass — the
    # serial loop left the chip idle per chunk, which roughly halves
    # throughput when transfer latency dominates (the tunneled setup)
    pending = None
    for start in range(0, len(paths), predictor.batch_size):
        raw_imgs, chunk, infos = load_chunk(start)
        out = predictor.dispatch(chunk)
        if pending is not None:
            consume(pending)
        pending = (start, raw_imgs, infos, out)
    if pending is not None:
        consume(pending)

    dt = time.time() - t0
    logger.info(f"done: {n_done} image(s) in {dt:.2f}s -> {dest}")


if __name__ == "__main__":
    main()
