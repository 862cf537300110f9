"""validate() end-to-end over the fake dataset with an oracle predictor:
tests coordinate unmapping + evaluator plumbing (AP must be ~1.0)."""

import numpy as np
import pytest

from tests.fixtures import make_fake_coco
from yolov4_tpu.config import load_config
from yolov4_tpu.data.coco import COCODataset
from yolov4_tpu.data.pipeline import DataLoader
from yolov4_tpu.data.transforms import Transform
from yolov4_tpu.engine.evaluator import detections_to_coco, validate


class OraclePredictor:
    """Emits the ground-truth labels (already in model-input pixels) as
    perfect detections."""

    def __init__(self, max_dets=100):
        self.max_dets = max_dets
        self.conf_thre = None
        self.nms_thre = None
        self._labels = None

    def attach(self, target):
        self._labels = target["padded_labels"]

    def dispatch(self, imgs):
        return self(imgs)

    def __call__(self, imgs):
        b = imgs.shape[0]
        det = np.zeros((b, self.max_dets, 7), np.float32)
        valid = np.zeros((b, self.max_dets), bool)
        for i in range(b):
            labels = self._labels[i]
            real = labels.sum(1) > 0
            n = int(real.sum())
            cx, cy, w, h, cls = labels[:n].T
            det[i, :n, 0] = cx - w / 2
            det[i, :n, 1] = cy - h / 2
            det[i, :n, 2] = cx + w / 2
            det[i, :n, 3] = cy + h / 2
            det[i, :n, 4] = 1.0
            det[i, :n, 5] = 1.0
            det[i, :n, 6] = cls
            valid[i, :n] = True
        return det, valid


class DistinctScoreOracle(OraclePredictor):
    """Oracle whose objectness is a deterministic function of the image id
    (1 - 1e-3*id): global detection ordering under the evaluator's stable
    score sort is then independent of row gather order, so AP comparisons
    between differently-ordered runs (e.g. multi-process allgather vs
    single process) are exact."""

    def attach(self, target):
        super().attach(target)
        self._infos = target["img_info"]

    def __call__(self, imgs):
        det, valid = super().__call__(imgs)
        for i in range(det.shape[0]):
            det[i, :, 4] = 1.0 - 1e-3 * float(self._infos[i][-2])
        return det, valid


class LoaderWithHook:
    def __init__(self, loader, predictor):
        self.loader = loader
        self.predictor = predictor
        self.dataset = loader.dataset

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for imgs, target in self.loader:
            self.predictor.attach(target)
            yield imgs, target


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco_eval"))
    make_fake_coco(root, "val2017", n_images=6, seed=3)
    return root


def test_validate_oracle_gets_ap1(fake_root, capsys):
    cfg = load_config()
    dataset = COCODataset(fake_root, "val2017", img_size=128, is_train=False,
                          transform=Transform(cfg, is_train=False))
    loader = DataLoader(dataset, batch_size=2, shuffle=False)
    predictor = OraclePredictor()
    ap, ap50 = validate(LoaderWithHook(loader, predictor), predictor,
                        verbose=False)
    assert ap50 == pytest.approx(1.0, abs=1e-6)
    assert ap == pytest.approx(1.0, abs=0.02)  # resize rounding at high IoU


def test_detections_to_coco_unmaps():
    det = np.array([[10.0, 20.0, 110.0, 220.0, 0.9, 0.8, 2.0]])
    valid = np.array([True])
    img_info = np.array([480.0, 640.0, 320.0, 320.0, 42.0, 0.0])
    rows = detections_to_coco(det, valid, img_info, class_ids=list(range(1, 81)))
    assert len(rows) == 1
    row = rows[0]
    assert row["image_id"] == 42
    assert row["category_id"] == 3  # class_ids[2]
    np.testing.assert_allclose(
        row["bbox"],
        [10 / 320 * 640, 20 / 320 * 480, 100 / 320 * 640, 200 / 320 * 480],
        rtol=1e-6)
    assert row["score"] == pytest.approx(0.72)


def test_validate_sharded_over_mesh(fake_root):
    """Full validate() through a real Predictor sharded over the 8-device
    CPU mesh: the forward+NMS program partitions on the batch axis via
    GSPMD and the loop's futures fetch correctly."""
    import jax

    from yolov4_tpu.engine.predictor import Predictor
    from yolov4_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    cfg["TEST"]["IMGSIZE"] = 64
    cfg["TEST"]["PRE_NMS_TOPK"] = 64
    cfg["TEST"]["MAX_DETS"] = 10
    dataset = COCODataset(fake_root, "val2017", img_size=64, is_train=False,
                          transform=Transform(cfg, is_train=False,
                                              keep_uint8=True),
                          num_classes=cfg["MODEL"]["N_CLASSES"])
    loader = DataLoader(dataset, batch_size=4, shuffle=False, num_workers=0)
    mesh = create_mesh()
    predictor = Predictor(cfg, batch_size=4, mesh=mesh)
    assert predictor.batch_size % (mesh.devices.size // jax.process_count()) == 0
    ap, ap50 = validate(loader, predictor, verbose=False)
    # random weights: plumbing must complete and produce finite stats
    assert np.isfinite(ap) and np.isfinite(ap50)


def test_dedup_wrap_padding():
    """Multi-host wrap padding (pipeline._local_indices pads the index
    list to a multiple of process_count by wrapping) means the same image
    can be evaluated on two processes; the gathered results must score it
    exactly once (double GTs + duplicate-detection FPs skew AP)."""
    from yolov4_tpu.engine.evaluator import _dedup_wrap_padding

    row = lambda img, score: {"image_id": img, "category_id": 1,
                              "bbox": [0.0, 0.0, 10.0, 10.0], "score": score}
    # p0 evaluated images 1,2; p1 evaluated 3 and the wrap-padded copy of 1
    per_process = [
        ([row(1, 0.9), row(2, 0.8)], [1, 2]),
        ([row(3, 0.7), row(1, 0.9)], [3, 1]),
    ]
    rows, ids = _dedup_wrap_padding(per_process)
    assert ids == [1, 2, 3]
    assert [r["image_id"] for r in rows] == [1, 2, 3]
    # no-duplicate case passes through untouched
    rows2, ids2 = _dedup_wrap_padding([([row(1, 0.9)], [1]),
                                       ([row(2, 0.8)], [2])])
    assert ids2 == [1, 2] and len(rows2) == 2


def test_detections_to_coco_letterbox_offsets():
    """8-field letterbox img_info: the offsets are subtracted before the
    content-dims rescale (a box at the content's top-left maps to the
    source origin)."""
    det = np.array([[20.0, 59.0, 120.0, 159.0, 0.9, 0.8, 2.0]])
    valid = np.array([True])
    # src 100x140, content 297x416? no: content dims follow src aspect —
    # use src 100x140 -> scale 416/140, content (297, 416), off (0, 59)
    info = np.array([100.0, 140.0, 297.0, 416.0, 0.0, 59.0, 42.0, 0.0])
    rows = detections_to_coco(det, valid, info, class_ids=list(range(1, 81)))
    assert rows[0]["image_id"] == 42
    x, y, w, h = rows[0]["bbox"]
    np.testing.assert_allclose(x, 20.0 / 416 * 140, rtol=1e-6)
    np.testing.assert_allclose(y, 0.0, atol=1e-9)  # 59 - off_y = 0
    np.testing.assert_allclose(w, 100.0 / 416 * 140, rtol=1e-6)
    np.testing.assert_allclose(h, 100.0 / 297 * 100, rtol=1e-6)


def test_validate_oracle_letterbox_ap1(fake_root):
    """The full eval protocol stays consistent under TEST.LETTERBOX: an
    oracle echoing the letterboxed gt labels must still score AP ~ 1.0
    (transform geometry and unmap geometry are exact inverses)."""
    cfg = load_config()
    cfg["TEST"]["LETTERBOX"] = True
    dataset = COCODataset(fake_root, "val2017", img_size=128, is_train=False,
                          transform=Transform(cfg, is_train=False))
    loader = DataLoader(dataset, batch_size=2, shuffle=False)
    predictor = OraclePredictor()
    ap, ap50 = validate(LoaderWithHook(loader, predictor), predictor,
                        verbose=False)
    assert ap50 == pytest.approx(1.0, abs=1e-6)
    assert ap == pytest.approx(1.0, abs=0.02)
