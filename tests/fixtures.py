"""Synthetic COCO fixture: a tiny on-disk dataset so data tests never need
the real COCO (reference test scripts required a real ./COCO tree)."""

import json
import os

import cv2
import numpy as np

from yolov4_tpu.data.coco import COCO_CLASS_IDS, COCO_LABEL_NAMES


def make_fake_coco(root: str, name: str = "train2017", n_images: int = 6,
                   seed: int = 0, img_hw=(120, 160), max_boxes: int = 5):
    """Create root/images/{name}/*.jpg + root/annotations/instances_{name}.json.

    Returns the list of image ids."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images", name)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    ids = []
    for i in range(n_images):
        img_id = 1000 + i
        ids.append(img_id)
        h = int(img_hw[0] + rng.integers(-20, 20))
        w = int(img_hw[1] + rng.integers(-20, 20))
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        # draw some rectangles so detections have structure
        for _ in range(3):
            x, y = int(rng.integers(0, w - 20)), int(rng.integers(0, h - 20))
            cv2.rectangle(img, (x, y), (x + 18, y + 15),
                          tuple(int(c) for c in rng.integers(0, 255, 3)), -1)
        cv2.imwrite(os.path.join(img_dir, f"{img_id:012}.jpg"), img)
        images.append({"id": img_id, "file_name": f"{img_id:012}.jpg",
                       "height": h, "width": w})

        for _ in range(int(rng.integers(1, max_boxes + 1))):
            bw = float(rng.uniform(8, w / 2))
            bh = float(rng.uniform(8, h / 2))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            cat = int(COCO_CLASS_IDS[rng.integers(0, len(COCO_CLASS_IDS))])
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [],
            })
            ann_id += 1

    categories = [
        {"id": cid, "name": COCO_LABEL_NAMES[idx + 1], "supercategory": "none"}
        for idx, cid in enumerate(COCO_CLASS_IDS)
    ]
    blob = {"images": images, "annotations": annotations,
            "categories": categories}
    with open(os.path.join(ann_dir, f"instances_{name}.json"), "w") as f:
        json.dump(blob, f)
    return ids
