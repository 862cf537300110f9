"""COCO dataset: lightweight annotation index + detection dataset.

Replaces the reference's pycocotools dependency (yolo/data/cocodataset.py)
with a first-party JSON index (`COCOIndex`) exposing the pieces the
framework needs: image listing, per-image annotations (including crowds,
matching the reference's ``getAnnIds(iscrowd=None)``), and category tables.
Evaluation lives in yolov4_tpu/eval/cocoeval.py.

`COCODataset` reproduces the reference dataset semantics
(cocodataset.py:58-156): images at ``root/images/{name}/{id:012}.jpg``,
annotation boxes filtered by ``w > min_size and h > min_size`` and class
range, rows REVERSED relative to file order (the reference ``insert(0, ...)``
loop), mosaic sampling 3 extra random images with a retry-until-labeled
loop, and a mutable ``img_size`` for multi-scale schedules.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

# Standard COCO tables (91-entry label names incl. background + the 80
# instance category ids), as in reference cocodataset.py:24-55.
COCO_LABEL_NAMES = (
    "background",
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "street sign",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "hat",
    "backpack", "umbrella", "shoe", "eye glasses", "handbag", "tie",
    "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "plate", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "mirror", "dining table", "window",
    "desk", "toilet", "door", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "blender", "book", "clock", "vase", "scissors",
    "teddy bear", "hair drier", "toothbrush",
)

COCO_CLASS_IDS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40,
    41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79,
    80, 81, 82, 84, 85, 86, 87, 88, 89, 90,
]


def get_coco_label_names():
    """(names, class_ids, colors) — reference cocodataset.py:24-55.

    Colors come from a private seeded RNG: a lookup helper must neither
    return different colors per call nor perturb global np.random state."""
    colors = np.random.RandomState(12345).randint(128, 255, size=(80, 3))
    return COCO_LABEL_NAMES, COCO_CLASS_IDS, colors


class COCOIndex:
    """Minimal COCO instances-JSON index (pycocotools.coco.COCO subset)."""

    def __init__(self, annotation_file: str):
        with open(annotation_file, "r") as f:
            blob = json.load(f)
        self.images: List[Dict] = blob.get("images", [])
        self.categories: List[Dict] = blob.get("categories", [])
        self.img_info: Dict[int, Dict] = {img["id"]: img for img in self.images}
        self.anns_by_img: Dict[int, List[Dict]] = {img["id"]: [] for img in self.images}
        for ann in blob.get("annotations", []):
            self.anns_by_img.setdefault(ann["image_id"], []).append(ann)

    def get_img_ids(self) -> List[int]:
        return [img["id"] for img in self.images]

    def get_cat_ids(self) -> List[int]:
        return [cat["id"] for cat in self.categories]

    def load_anns(self, img_id: int) -> List[Dict]:
        """All annotations for an image, crowds included
        (reference getAnnIds(iscrowd=None), cocodataset.py:99)."""
        return self.anns_by_img.get(img_id, [])


class COCODataset:
    """Detection dataset over a COCO directory layout
    (reference cocodataset.py:58-156)."""

    def __init__(self, root: str, name: str = "train2017", img_size: int = 416,
                 min_size: int = 1, is_train: bool = True, transform=None,
                 num_classes: int = 80, seed: Optional[int] = None):
        self.root = root
        self.name = name
        self.img_size = img_size
        self.min_size = min_size
        self.is_train = is_train
        self.transform = transform
        self.num_classes = num_classes

        if "train" in name:
            json_file = "instances_train2017.json"
        elif "val" in name:
            json_file = "instances_val2017.json"
        else:
            raise ValueError(f"{name} does not match any files")
        annotation_file = os.path.join(root, "annotations", json_file)
        if not os.path.isfile(annotation_file):
            raise FileNotFoundError(
                f"COCO annotations not found: {annotation_file} — expected "
                f"layout: {root}/annotations/instances_*.json + "
                f"{root}/images/{name}/*.jpg")
        self.coco = COCOIndex(annotation_file)
        self.ids = self.coco.get_img_ids()
        self.class_ids = sorted(self.coco.get_cat_ids())
        self._py_rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.ids)

    def seed(self, seed: Optional[int]) -> None:
        self._py_rng = random.Random(seed)
        if self.transform is not None and hasattr(self.transform, "seed"):
            self.transform.seed(seed)

    def img_path(self, img_id: int) -> str:
        return os.path.join(self.root, "images", self.name, f"{img_id:012}.jpg")

    def get_img_and_labels(self, index: Optional[int] = None):
        """(BGR uint8 image, [N, 5] tlwh+cls float array, img_id).

        Boxes kept when w > min_size and h > min_size, class-filtered, and
        row order reversed vs annotation order (reference insert(0, ...),
        cocodataset.py:101-110)."""
        if index is None:
            index = self._py_rng.randrange(len(self.ids))
        img_id = self.ids[index]
        path = self.img_path(img_id)
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)

        rows = []
        for ann in self.coco.load_anns(int(img_id)):
            bbox = ann["bbox"]
            if bbox[2] > self.min_size and bbox[3] > self.min_size:
                rows.insert(0, list(bbox) + [self.class_ids.index(ann["category_id"])])
        bboxes = np.array(rows, dtype=np.float64)
        if len(bboxes) > 0:
            keep = (bboxes[:, 4] < self.num_classes) & (bboxes[:, 4] >= 0)
            bboxes = bboxes[keep]
        return img, bboxes, img_id

    def __getitem__(self, index: int):
        img, bboxes, img_id = self.get_img_and_labels(index)
        if self.transform is None:
            # debug/inspection path: RAW variable-length labels, always
            # [N, 5]-shaped (N may be 0) — NOT the fixed [60, 5] contract
            # the batching stack collates, hence the distinct key
            return img, {"raw_labels": bboxes.reshape(-1, 5),
                         "img_info": [img_id, index]}

        img_list, bboxes_list = [img], [bboxes]
        if self.is_train and getattr(self.transform, "is_mosaic", False):
            for _ in range(3):
                # reference mosaic semantics (cocodataset.py:124-133):
                # redraw until the extra image has labels — but FAIL
                # loudly on degenerate datasets where nothing does (the
                # unbounded loop hangs a loader worker silently)
                extra_img, extra_boxes, _ = self.get_img_and_labels()
                tries = 0
                while len(extra_boxes) == 0:
                    tries += 1
                    if tries > max(1000, 4 * len(self)):
                        raise RuntimeError(
                            "mosaic: no image with surviving labels found "
                            f"after {tries} draws — every annotation is "
                            "filtered out (min_size/class filters); "
                            "disable AUGMENTATION.IS_MOSAIC or fix the "
                            "dataset")
                    extra_img, extra_boxes, _ = self.get_img_and_labels()
                img_list.append(extra_img)
                bboxes_list.append(extra_boxes)

        out_img, target = self.transform(img_list, bboxes_list, self.img_size)
        target["img_info"] = list(target["img_info"]) + [img_id, index]
        return out_img, target

    def set_img_size(self, img_size: int) -> None:
        self.img_size = img_size

    def get_img_size(self) -> int:
        return self.img_size
