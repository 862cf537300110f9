"""COCO dataset + loader tests over the synthetic fixture."""

import os
import numpy as np
import pytest

from tests.fixtures import make_fake_coco
from yolov4_tpu.config import load_config
from yolov4_tpu.data.coco import COCODataset, COCOIndex
from yolov4_tpu.data.pipeline import DataLoader
from yolov4_tpu.data.transforms import Transform


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco"))
    make_fake_coco(root, "train2017", n_images=8, seed=0)
    make_fake_coco(root, "val2017", n_images=5, seed=1)
    return root


def test_index_roundtrip(fake_root):
    idx = COCOIndex(f"{fake_root}/annotations/instances_train2017.json")
    ids = idx.get_img_ids()
    assert len(ids) == 8
    assert len(idx.get_cat_ids()) == 80
    anns = idx.load_anns(ids[0])
    assert all(len(a["bbox"]) == 4 for a in anns)


def test_dataset_raw_labels(fake_root):
    ds = COCODataset(fake_root, "train2017", img_size=128, is_train=True,
                     transform=None)
    img, boxes, img_id = ds.get_img_and_labels(0)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    if len(boxes):
        assert boxes.shape[1] == 5
        assert (boxes[:, 4] >= 0).all() and (boxes[:, 4] < 80).all()
    # the no-transform __getitem__ path: always [N, 5]-shaped (even N=0)
    # under its own key — this is NOT the fixed padded_labels contract
    _, target = ds[0]
    assert target["raw_labels"].ndim == 2
    assert target["raw_labels"].shape[1] == 5


def test_dataset_train_mosaic(fake_root):
    cfg = load_config()
    ds = COCODataset(fake_root, "train2017", img_size=128, is_train=True,
                     transform=Transform(cfg, is_train=True, seed=0), seed=0)
    img, target = ds[0]
    assert img.shape == (128, 128, 3) and img.dtype == np.float32
    assert target["padded_labels"].shape == (60, 5)
    assert len(target["img_info"]) == 2  # [img_id, index]


def test_dataset_val(fake_root):
    cfg = load_config()
    ds = COCODataset(fake_root, "val2017", img_size=96, is_train=False,
                     transform=Transform(cfg, is_train=False))
    img, target = ds[1]
    assert img.shape == (96, 96, 3)
    info = target["img_info"]
    # src_h, src_w, content_h, content_w, off_x, off_y, img_id, index
    assert len(info) == 8
    assert info[2] == 96 and info[3] == 96
    assert info[4] == 0 and info[5] == 0  # stretch mode: no letterbox pad
    assert info[6] == ds.ids[1] and info[7] == 1


@pytest.mark.parametrize("num_workers", [0, 2])
def test_loader_batches(fake_root, num_workers):
    cfg = load_config()
    ds = COCODataset(fake_root, "val2017", img_size=64, is_train=False,
                     transform=Transform(cfg, is_train=False))
    loader = DataLoader(ds, batch_size=2, shuffle=False,
                        num_workers=num_workers)
    batches = list(loader)
    assert len(batches) == 3  # 5 imgs, pad_last
    imgs, target = batches[-1]
    assert imgs.shape == (2, 64, 64, 3)
    assert target["batch_mask"].tolist() == [True, False]
    assert target["padded_labels"].shape == (2, 60, 5)


@pytest.mark.parametrize("num_workers", [0, 2])
def test_loader_multiscale_schedule(fake_root, num_workers):
    """TRAIN.MULTISCALE plumbing: a size_schedule re-targets the transform
    per batch, INCLUDING through worker processes (they hold frozen
    dataset copies, so the size must ride with each prefetch task —
    reference hook cocodataset.py:152-156, dead at build.py:105-107)."""
    cfg = load_config()
    ds = COCODataset(fake_root, "val2017", img_size=64, is_train=False,
                     transform=Transform(cfg, is_train=False))
    loader = DataLoader(ds, batch_size=2, shuffle=False,
                        num_workers=num_workers)
    sizes = [32, 64, 96]
    loader.size_schedule = lambda epoch, i: sizes[i % len(sizes)]
    batches = list(loader)
    assert len(batches) == 3
    for i, (imgs, target) in enumerate(batches):
        s = sizes[i % len(sizes)]
        assert imgs.shape == (2, s, s, 3), f"batch {i}"
        # labels scale with the batch's size (dst dims in img_info)
        assert target["img_info"][0, 2] == s
    # schedule off -> fixed size again, and the parent dataset was not
    # permanently re-targeted by the in-process path beyond the last call
    loader.size_schedule = None
    ds.set_img_size(64)
    imgs, _ = next(iter(loader))
    assert imgs.shape == (2, 64, 64, 3)


def test_loader_determinism(fake_root):
    cfg = load_config()
    ds = COCODataset(fake_root, "train2017", img_size=64, is_train=True,
                     transform=Transform(cfg, is_train=True), seed=0)
    def run(num_workers):
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=123,
                            num_workers=num_workers)
        loader.set_epoch(1)
        return [b[0] for b in loader]
    a = run(0)
    b = run(2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_loader_sharding(fake_root):
    cfg = load_config()
    ds = COCODataset(fake_root, "val2017", img_size=64, is_train=False,
                     transform=Transform(cfg, is_train=False))
    seen = []
    for pi in range(2):
        loader = DataLoader(ds, batch_size=2, shuffle=False, pad_last=False,
                            process_index=pi, process_count=2)
        for _, target in loader:
            seen.extend(target["img_info"][:, 6][target["batch_mask"]].tolist())
    # every image covered (with wrap padding allowed)
    assert set(int(s) for s in seen) == set(ds.ids)


def test_trainer_evaluate_only_needs_no_train_split(fake_root, tmp_path, monkeypatch):
    """train.py -e must work with a val-only dataset root."""
    import shutil
    val_only = str(tmp_path / "val_only")
    os.makedirs(f"{val_only}/annotations")
    shutil.copy(f"{fake_root}/annotations/instances_val2017.json",
                f"{val_only}/annotations/instances_val2017.json")
    shutil.copytree(f"{fake_root}/images/val2017", f"{val_only}/images/val2017")

    from yolov4_tpu.engine.trainer import Trainer
    cfg = load_config()
    cfg["MODEL"].update(COMPUTE_DTYPE="float32", BACKBONE_PRETRAINED=None)
    cfg["TRAIN"].update(IMGSIZE=64, OUTPUT_DIR=str(tmp_path / "out"))
    cfg["TEST"].update(IMGSIZE=64, BATCH_SIZE=2, PRE_NMS_TOPK=128, MAX_DETS=10)
    cfg["DATA"]["WORKERS"] = 0
    trainer = Trainer(cfg, val_only, evaluate_only=True)
    assert trainer.train_loader is None and trainer.train_step is None
    ap, ap50 = trainer.fit(evaluate_only=True)
    assert ap == 0.0  # random weights


def test_shapes_fixture_annotations_match_pixels(tmp_path):
    """make_shapes_coco draws DETECTABLE objects: every annotation's bbox
    must frame actual non-background pixels of its shape (the contract the
    generalization smoke depends on)."""
    from tests.fixtures import make_shapes_coco

    root = str(tmp_path / "shapes")
    ids = make_shapes_coco(root, "val2017", n_images=6, seed=3,
                           img_hw=(160, 200), id_base=500)
    ds = COCODataset(root, "val2017", img_size=160, is_train=False,
                     transform=Transform(load_config(), is_train=False))
    assert len(ds) == 6 and ds.ids == ids
    import cv2
    checked = 0
    for img_id in ids:
        img = cv2.imread(os.path.join(root, "images", "val2017",
                                      f"{img_id:012}.jpg"))
        for ann in ds.coco.load_anns(img_id):
            x, y, w, h = ann["bbox"]
            xi, yi, wi, hi = (int(round(v)) for v in (x, y, w, h))
            assert 0 <= xi and 0 <= yi
            assert xi + wi <= img.shape[1] and yi + hi <= img.shape[0]
            patch = img[yi:yi + hi, xi:xi + wi].astype(np.int32)
            # background is a 90..150 noise band; shape colors are near 30
            # or 220 — the box must contain clearly-foreground pixels
            fg = ((patch < 70).any(axis=-1) | (patch > 180).any(axis=-1))
            assert fg.mean() > 0.2, (img_id, (x, y, w, h))
            checked += 1
    assert checked >= 6
