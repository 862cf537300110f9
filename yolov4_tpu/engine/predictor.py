"""Batched jit-compiled inference: forward + decode + on-device NMS.

One compiled XLA program covers preprocessing-normalized NHWC batches
through to fixed-shape detections; the host only unmaps coordinates back to
source images. This is the TPU-native replacement for the reference's
eval/detect inner loops (detect.py:103-122, engine/build.py:121-145), which
bounced every image through CPU postprocessing.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov4_tpu.models import build_model
from yolov4_tpu.models.yolov4 import init_variables
from yolov4_tpu.ops.postprocess import postprocess


class Predictor:
    """Compile-once batched detector.

    Batches are padded to ``batch_size`` so XLA sees one static shape.
    """

    def __init__(self, cfg: Dict, variables: Optional[Dict] = None,
                 img_size: Optional[int] = None, batch_size: int = 8,
                 conf_thre: Optional[float] = None,
                 nms_thre: Optional[float] = None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.img_size = img_size or cfg["TEST"]["IMGSIZE"]
        self.batch_size = batch_size
        self.conf_thre = cfg["TEST"]["CONFTHRE"] if conf_thre is None else conf_thre
        self.nms_thre = cfg["TEST"]["NMSTHRE"] if nms_thre is None else nms_thre
        self.num_classes = cfg["MODEL"]["N_CLASSES"]
        self.pre_nms_topk = cfg["TEST"].get("PRE_NMS_TOPK", 2048)
        self.max_dets = cfg["TEST"].get("MAX_DETS", 100)

        if variables is None:
            variables = init_variables(
                self.model, jax.random.PRNGKey(0), self.img_size)
        self.variables = jax.device_put(variables)

        @partial(jax.jit, static_argnames=())
        def _run(variables, images, conf_thre, nms_thre):
            preds = self.model.apply(variables, images, train=False)
            return postprocess(
                preds, self.num_classes, conf_thre, nms_thre,
                pre_nms_topk=self.pre_nms_topk, max_dets=self.max_dets)

        self._run = _run

    def warmup(self) -> None:
        dummy = jnp.zeros((self.batch_size, self.img_size, self.img_size, 3),
                          jnp.float32)
        jax.block_until_ready(
            self._run(self.variables, dummy, self.conf_thre, self.nms_thre))

    def predict_device(self, images: jnp.ndarray):
        """Device-resident path (no host transfer), for benchmarking and
        fused pipelines. images: [batch_size, S, S, 3] float32 in [0, 1]."""
        return self._run(self.variables, images, self.conf_thre, self.nms_thre)

    def __call__(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """images: [B, S, S, 3] float32 in [0, 1], B <= batch_size.

        Returns (detections [B, max_dets, 7], valid [B, max_dets]) numpy,
        rows = x1, y1, x2, y2, obj, cls_conf, cls_idx in input pixels.
        """
        n = images.shape[0]
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n, *images.shape[1:]), images.dtype)
            images = np.concatenate([images, pad])
        elif n > self.batch_size:
            raise ValueError(f"batch {n} exceeds compiled size {self.batch_size}")
        det, valid = self._run(self.variables, jnp.asarray(images),
                               self.conf_thre, self.nms_thre)
        return np.asarray(det)[:n], np.asarray(valid)[:n]
