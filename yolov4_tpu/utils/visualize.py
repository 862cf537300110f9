"""Detection visualization (reference detect.py:188-228 show_bbox and
yolo/util/vis_bbox.py equivalents)."""

from __future__ import annotations

from typing import Optional, Sequence

import cv2
import numpy as np

from yolov4_tpu.data.coco import COCO_CLASS_IDS, COCO_LABEL_NAMES

_COLORS = np.random.RandomState(12345).randint(96, 255, size=(80, 3))


def class_name(cls_idx: int) -> str:
    """Model class index (0..79) -> COCO label name.

    Assumes the STANDARD 80-class COCO table, exactly like the
    reference's hardcoded label list (cocodataset.py:24-55): a model
    trained on a custom/subset category table gets generic names here
    (the dataset-derived mapping lives in COCODataset.class_ids and is
    what the EVALUATOR uses — drawing/serving labels are cosmetic)."""
    i = int(cls_idx)
    if not 0 <= i < len(COCO_CLASS_IDS):
        return f"class_{i}"
    return COCO_LABEL_NAMES[COCO_CLASS_IDS[i]]


def draw_detections(img_bgr: np.ndarray, boxes_xyxy: np.ndarray,
                    scores: Sequence[float], cls_idxs: Sequence[int],
                    thickness: int = 2) -> np.ndarray:
    """Draw labelled boxes on a BGR uint8 image (in place) and return it."""
    h, w = img_bgr.shape[:2]
    for box, score, cls_idx in zip(boxes_xyxy, scores, cls_idxs):
        x1, y1, x2, y2 = [int(round(float(v))) for v in box]
        x1, x2 = np.clip([x1, x2], 0, w - 1)
        y1, y2 = np.clip([y1, y2], 0, h - 1)
        color = tuple(int(c) for c in _COLORS[int(cls_idx) % 80])
        cv2.rectangle(img_bgr, (x1, y1), (x2, y2), color, thickness)
        label = f"{class_name(cls_idx)} {float(score):.2f}"
        (tw, th), baseline = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        ty = max(y1, th + baseline)
        cv2.rectangle(img_bgr, (x1, ty - th - baseline), (x1 + tw, ty), color, -1)
        cv2.putText(img_bgr, label, (x1, ty - baseline // 2),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1, cv2.LINE_AA)
    return img_bgr


def vis_bbox_matplotlib(img_rgb: np.ndarray, boxes_xyxy: np.ndarray,
                        scores=None, cls_idxs=None, ax=None):
    """Matplotlib variant (reference yolo/util/vis_bbox.py:5). Unused by the
    CLIs (which draw with cv2, like the reference) but kept for notebooks."""
    import matplotlib.pyplot as plt
    from matplotlib import patches

    if ax is None:
        _, ax = plt.subplots(1, 1)
    ax.imshow(img_rgb.astype(np.uint8))
    for i, box in enumerate(boxes_xyxy):
        x1, y1, x2, y2 = [float(v) for v in box]
        ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       fill=False, edgecolor="red", linewidth=1.5))
        if cls_idxs is not None:
            caption = class_name(cls_idxs[i])
            if scores is not None:
                caption += f" {float(scores[i]):.2f}"
            ax.text(x1, y1, caption, color="white",
                    bbox={"facecolor": "red", "alpha": 0.6, "pad": 1})
    return ax
