"""Native host kernels (C, OpenMP) with build-on-first-import and a pure
numpy fallback. See fastops.c for the kernel inventory."""

from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sysconfig
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastops.c")
_BUILD_DIR = os.path.join(_DIR, "_build")

_fastops = None
_build_error: Optional[str] = None


def _build() -> Optional[object]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"_fastops_{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        include = sysconfig.get_paths()["include"]
        # note: no -march=native — the build cache is keyed by source only
        # and the repo may move between machines; these kernels are
        # memory-bound so portable codegen costs nothing measurable
        #
        # per-pid temp name: concurrent first-builds (e.g. the 2-process
        # multihost test on a fresh checkout) must not interleave writes
        # into one shared temp file — os.replace of a private temp is
        # atomic, so whichever full build finishes last wins intact
        tmp_path = f"{so_path}.{os.getpid()}.tmp"
        cmd = [
            "gcc", "-shared", "-fPIC", "-O3", "-fopenmp",
            f"-I{include}", _SRC, "-o", tmp_path,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp_path, so_path)
        finally:
            if os.path.exists(tmp_path):
                os.remove(tmp_path)
    spec = importlib.util.spec_from_file_location("_fastops", so_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def get_fastops() -> Optional[object]:
    """The compiled module, or None if the toolchain is unavailable."""
    global _fastops, _build_error
    if _fastops is None and _build_error is None:
        try:
            _fastops = _build()
        except Exception as exc:  # no gcc / sandbox: numpy fallback
            _build_error = str(exc)
    return _fastops


def available() -> bool:
    return get_fastops() is not None


# ---------------------------------------------------------------------------
# public wrappers (native when possible, numpy otherwise)

def pack_f32_flat(batch_u8: np.ndarray, scale: float = 1.0 / 255.0) -> np.ndarray:
    """uint8 [B, ...] -> float32 flat [B, prod(...)] * scale."""
    batch_u8 = np.ascontiguousarray(batch_u8)
    b = batch_u8.shape[0]
    flat_len = batch_u8.size // b
    ops = get_fastops()
    if ops is None:
        return (batch_u8.reshape(b, flat_len).astype(np.float32) * scale)
    out = np.empty((b, flat_len), np.float32)
    ops.pack_f32(batch_u8.reshape(-1), out.reshape(-1), float(scale))
    return out


def pack_planar_u8(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 NHWC [B, H, W, 3] -> planar uint8 [B, 3, H, W] (contiguous)."""
    batch_u8 = np.ascontiguousarray(batch_u8)
    b, h, w, c = batch_u8.shape
    assert c == 3, batch_u8.shape
    ops = get_fastops()
    if ops is None:
        return np.ascontiguousarray(batch_u8.transpose(0, 3, 1, 2))
    out = np.empty((b, 3, h, w), np.uint8)
    ops.pack_planar(batch_u8.reshape(-1), out.reshape(-1), b, h, w)
    return out


def pack_s2d_u8(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 NHWC [B, H, W, 3] -> s2d wire layout uint8 [B, H/2, W/2, 12]
    (channel (dy*2+dx)*3+c = pixel (2y2+dy, 2x2+dx, c) — the exact input
    layout of the space-to-depth stem)."""
    batch_u8 = np.ascontiguousarray(batch_u8)
    b, h, w, c = batch_u8.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, batch_u8.shape
    ops = get_fastops()
    if ops is None:
        return np.ascontiguousarray(
            batch_u8.reshape(b, h // 2, 2, w // 2, 2, 3)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12))
    out = np.empty((b, h // 2, w // 2, 12), np.uint8)
    ops.pack_s2d(batch_u8.reshape(-1), out.reshape(-1), b, h, w, 1)
    return out


def pack_s2d_f32(batch_f32: np.ndarray) -> np.ndarray:
    """float32 NHWC [B, H, W, 3] -> s2d wire layout f32 [B, H/2, W/2, 12]
    (same C kernel as pack_s2d_u8, elem_size=4; used by the training
    transfer path)."""
    batch_f32 = np.ascontiguousarray(batch_f32, np.float32)
    b, h, w, c = batch_f32.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, batch_f32.shape
    ops = get_fastops()
    if ops is None:
        return np.ascontiguousarray(
            batch_f32.reshape(b, h // 2, 2, w // 2, 2, 3)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12))
    out = np.empty((b, h // 2, w // 2, 12), np.float32)
    ops.pack_s2d(batch_f32.reshape(-1), out.reshape(-1), b, h, w, 4)
    return out


def coco_match_batch(ious_flat: np.ndarray, g_ignore: np.ndarray,
                     iscrowd: np.ndarray, d_outside: np.ndarray,
                     nd: np.ndarray, ng: np.ndarray,
                     iou_thrs: np.ndarray):
    """Batched COCOeval greedy matching (native only; returns None when the
    toolchain is unavailable — the caller falls back to numpy)."""
    ops = get_fastops()
    if ops is None:
        return None
    t_count = int(iou_thrs.shape[0])
    total_d = int(nd.sum())
    matched = np.zeros((t_count, total_d), np.uint8)
    ignored = np.zeros((t_count, total_d), np.uint8)
    ops.coco_match(
        np.ascontiguousarray(ious_flat, np.float64),
        np.ascontiguousarray(g_ignore, np.uint8),
        np.ascontiguousarray(iscrowd, np.uint8),
        np.ascontiguousarray(d_outside, np.uint8),
        np.ascontiguousarray(nd, np.int64),
        np.ascontiguousarray(ng, np.int64),
        np.ascontiguousarray(iou_thrs, np.float64),
        matched.reshape(-1), ignored.reshape(-1))
    return matched.astype(bool), ignored.astype(bool)


def greedy_nms_host(boxes_xyxy: np.ndarray, valid: np.ndarray,
                    iou_thresh: float) -> np.ndarray:
    """Score-sorted greedy NMS on the host. boxes [K, 4] f32, valid [K]."""
    boxes_xyxy = np.ascontiguousarray(boxes_xyxy, np.float32)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)
    k = valid_u8.shape[0]
    ops = get_fastops()
    if ops is None:
        keep = valid_u8.astype(bool).copy()
        for i in range(k):
            if not keep[i]:
                continue
            xi1, yi1, xi2, yi2 = boxes_xyxy[i]
            ai = (xi2 - xi1) * (yi2 - yi1)
            for j in range(i + 1, k):
                if not keep[j]:
                    continue
                tx, ty = max(boxes_xyxy[j, 0], xi1), max(boxes_xyxy[j, 1], yi1)
                bx, by = min(boxes_xyxy[j, 2], xi2), min(boxes_xyxy[j, 3], yi2)
                if tx >= bx or ty >= by:
                    continue
                inter = (bx - tx) * (by - ty)
                aj = ((boxes_xyxy[j, 2] - boxes_xyxy[j, 0])
                      * (boxes_xyxy[j, 3] - boxes_xyxy[j, 1]))
                if inter / max(ai + aj - inter, 1e-12) >= iou_thresh:
                    keep[j] = False
        return keep
    keep = np.empty(k, np.uint8)
    ops.greedy_nms(boxes_xyxy.reshape(-1), valid_u8, float(iou_thresh), keep)
    return keep.astype(bool)
