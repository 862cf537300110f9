"""Serve from an exported single-file artifact (utils/export.py).

``ArtifactPredictor`` adapts a loaded ServingArtifact to the Predictor
interface the DynamicBatcher drives (dispatch/fetch_local/warmup), so the
HTTP server can run off ONE file — no model code, config, or checkpoint
on the serving host. Thresholds are the ones baked at export time."""

from __future__ import annotations

import numpy as np

from yolov4_tpu.utils.export import ServingArtifact, load_serving


class ArtifactPredictor:
    def __init__(self, artifact: ServingArtifact):
        self.artifact = artifact
        meta = artifact.meta
        self.img_size = int(meta["img_size"])
        self.batch_size = int(meta["batch_size"])
        self.conf_thre = float(meta["conf_thre"])
        self.nms_thre = float(meta["nms_thre"])
        self.num_classes = int(meta["num_classes"])
        self.max_dets = int(meta["max_dets"])
        self.quant = meta.get("quant", "none")
        self._wire_dtype = np.dtype(meta["wire_dtype"])
        self._s2d_wire = bool(meta["s2d_wire"])

    @classmethod
    def load(cls, path: str) -> "ArtifactPredictor":
        return cls(load_serving(path))

    def warmup(self, dtype=None) -> None:
        import jax
        flat_len = 3 * self.img_size * self.img_size
        jax.block_until_ready(self.artifact.call(
            np.zeros((self.batch_size, flat_len), self._wire_dtype)))

    def dispatch(self, images: np.ndarray):
        """[n <= batch_size, S, S, 3] wire-dtype batch -> async device
        results (detections, valid[, relevant_count])."""
        from yolov4_tpu.engine.predictor import pack_wire
        if images.dtype != self._wire_dtype:
            raise ValueError(f"expected {self._wire_dtype} images "
                             f"(exported wire dtype), got {images.dtype}")
        flat = pack_wire(images, self.batch_size, self._s2d_wire)
        return self.artifact.call(flat)

    @staticmethod
    def fetch_local(arr) -> np.ndarray:
        return np.asarray(arr)
