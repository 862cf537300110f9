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


def pack_wire(images: np.ndarray, batch_size: int,
              s2d_wire: bool) -> np.ndarray:
    """Pack an NHWC host batch into the flat device wire format: pad to
    ``batch_size``, reorder (s2d stem layout / planar NCHW), flatten to
    [batch_size, 3*S*S]. Shared by Predictor and exported serving
    artifacts (utils/export.py) so both feed bit-identical bytes."""
    n = images.shape[0]
    if n < batch_size:
        pad = np.zeros((batch_size - n, *images.shape[1:]), images.dtype)
        images = np.concatenate([images, pad])
    elif n > batch_size:
        raise ValueError(f"batch {n} exceeds compiled size {batch_size}")
    from yolov4_tpu import native
    if s2d_wire:
        packed = (native.pack_s2d_u8(images) if images.dtype == np.uint8
                  else native.pack_s2d_f32(images))
    elif images.dtype == np.uint8:
        packed = native.pack_planar_u8(images)  # C/OpenMP de-interleave
    else:
        packed = np.ascontiguousarray(images.transpose(0, 3, 1, 2))
    return packed.reshape(batch_size, -1)


class Predictor:
    """Compile-once batched detector.

    Batches are padded to ``batch_size`` so XLA sees one static shape.

    With ``mesh`` given (>1 device), the batch is sharded over the mesh's
    'data' axis and the params replicated, so per-epoch validation uses
    every chip instead of idling N-1 of them (GSPMD partitions the whole
    forward+NMS program from the input sharding). ``batch_size`` stays the
    PER-PROCESS batch; on multi-host meshes each process feeds its local
    shard and the compiled program sees the global batch.
    """

    def __init__(self, cfg: Dict, variables: Optional[Dict] = None,
                 img_size: Optional[int] = None, batch_size: int = 8,
                 conf_thre: Optional[float] = None,
                 nms_thre: Optional[float] = None,
                 mesh=None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.img_size = img_size or cfg["TEST"]["IMGSIZE"]
        self.batch_size = batch_size
        self.conf_thre = cfg["TEST"]["CONFTHRE"] if conf_thre is None else conf_thre
        self.nms_thre = cfg["TEST"]["NMSTHRE"] if nms_thre is None else nms_thre
        self.num_classes = cfg["MODEL"]["N_CLASSES"]
        self.pre_nms_topk = cfg["TEST"].get("PRE_NMS_TOPK", 2048)
        self.max_dets = cfg["TEST"].get("MAX_DETS", 100)
        self.topk_approx = bool(cfg["TEST"].get("APPROX_TOPK", False))
        # pycocotools-style per-(image, category) scoring cap; when the
        # fixed-size output is deeper than it (max_dets > cat_cap), the
        # program also counts scoring-relevant rows per image so callers
        # can PROVE the fixed-size truncation dropped nothing (evaluator
        # logs overflow). See ops/postprocess.py.
        self.cat_cap = int(cfg["TEST"].get("CAT_CAP", 100))
        self.count_relevant = bool(self.cat_cap
                                   and self.max_dets > self.cat_cap)

        self._in_sharding = None
        self._replicated = None
        self._lockstep_done = False
        self._calib_lockstep_done = False
        if mesh is not None and mesh.devices.size > 1:
            from yolov4_tpu.parallel.mesh import batch_sharding, replicated
            self._in_sharding = batch_sharding(mesh)
            self._replicated = replicated(mesh)
            n_dev = mesh.devices.size
            n_proc = jax.process_count()
            if n_dev % n_proc:
                raise ValueError(f"{n_dev}-device mesh does not split over "
                                 f"{n_proc} processes")
            # round the compiled per-process batch up to a whole number of
            # rows per device; dispatch() zero-pads short host batches and
            # the caller's batch_mask drops the padding
            per_proc_dev = n_dev // n_proc
            self.batch_size = -(-self.batch_size // per_proc_dev) * per_proc_dev

        caller_vars = variables is not None
        if variables is None:
            variables = init_variables(
                self.model, jax.random.PRNGKey(0), self.img_size)
        # int8_static: the model reads CALIBRATED activation scales from a
        # "quant" variable collection (layers.ConvBNAct). calibrate()
        # records them; the first dispatch() auto-calibrates on its own
        # batch when nobody called it ("calibrate on first batch"). A
        # CALLER-provided "quant" collection is deliberate calibration
        # (e.g. captured from a previously calibrated predictor's
        # .variables) and is kept — only init-time zero collections are
        # stripped so auto-calibration still triggers on fresh params.
        self._quant_static = (
            cfg["MODEL"].get("QUANT", "none") == "int8_static")
        self._quant_ready = not self._quant_static
        self._quant_seed = None  # compile-only scales (see calibrate)
        if self._quant_static:
            if caller_vars and "quant" in variables:
                # caller quant can only come from a CALIBRATED predictor's
                # .variables (warmup's pre-calibration seed scales are
                # never published there) — keep it, don't recalibrate
                self._quant_ready = True
            else:
                variables = {k: v for k, v in variables.items()
                             if k != "quant"}
        self.variables = (jax.device_put(variables, self._replicated)
                          if self._replicated is not None
                          else jax.device_put(variables))

        size = self.img_size
        # s2d wire: the host packs bytes in the space-to-depth stem's own
        # input layout ([B, S/2, S/2, 12] flat), so the device program
        # skips the 3-channel relayout copies the planar upload needed
        # (~1.3 ms/batch of the fwd trace). Same flat transfer length.
        self._s2d_wire = bool(
            cfg["MODEL"].get("S2D_STEM", True) in (True, "fused")
            and cfg["TEST"].get("S2D_WIRE", True)
            and size % 2 == 0)
        s2d_wire = self._s2d_wire
        # direct-u8 stem (opt-in MODEL.QUANT_STEM; measured negative on
        # v5e, docs/PERF.md): the stem consumes the uint8 wire bytes as
        # shifted s8 — exact activation math, and the u8->f32 normalize
        # pass vanishes from the program. The backbone normalizes itself
        # if any guard there disagrees (layers.ConvBNAct /
        # darknet.Backbone uint8 fallbacks), so keeping bytes u8 here is
        # always safe.
        u8_stem = (
            cfg["MODEL"].get("QUANT", "none") in ("int8", "int8_static",
                                                  True)
            and cfg["MODEL"].get("QUANT_STEM", False)
            and cfg["MODEL"].get("QUANT_SPAN", "late") == "full"
            and cfg["MODEL"].get("S2D_STEM", True) in (True, "fused")
            and size % 2 == 0)
        self._u8_stem = u8_stem

        def _wire_to_images(flat_images):
            # ONE input lowering shared by the serving and calibration
            # programs: the recorded int8_static scales must describe the
            # activations the serving program will actually see — a
            # different lowering produces ulp-different activations whose
            # shifted quantization grids compound across ~60 layers.
            # Inputs arrive FLAT [B, 3*S*S]: a trailing dim of 3 would be
            # lane-padded 3->128 during host->device transfer (a ~40x
            # tax). Layout on the wire is the s2d stem layout when the
            # model runs the fused s2d stem (above), else planar NCHW +
            # a cheap device transpose.
            if s2d_wire:
                images = flat_images.reshape(-1, size // 2, size // 2, 12)
            else:
                images = flat_images.reshape(-1, 3, size, size)
                images = jnp.transpose(images, (0, 2, 3, 1))  # -> NHWC
            if images.dtype == jnp.uint8 and not u8_stem:
                images = images.astype(jnp.float32) / 255.0
            return images

        @partial(jax.jit, static_argnames=())
        def _run(variables, flat_images, conf_thre, nms_thre):
            preds = self.model.apply(variables, _wire_to_images(flat_images),
                                     train=False, input_s2d=s2d_wire)
            return postprocess(
                preds, self.num_classes, conf_thre, nms_thre,
                pre_nms_topk=self.pre_nms_topk, max_dets=self.max_dets,
                topk_approx=self.topk_approx, cat_cap=self.cat_cap,
                return_relevant_count=self.count_relevant)

        self._run = _run

        @jax.jit
        def _calib(variables, flat_images):
            _, updated = self.model.apply(
                variables, _wire_to_images(flat_images), train=False,
                input_s2d=s2d_wire, mutable=["quant"])
            return updated["quant"]

        self._calib = _calib

    @property
    def variables(self):
        return self._variables

    @variables.setter
    def variables(self, value):
        # External reassignment (Trainer.evaluate swaps in fresh train
        # state every validation) may drop the "quant" collection; an
        # int8_static predictor must then RE-calibrate on its next batch
        # — a sticky ready flag would dispatch a program whose calibrated
        # scales no longer exist (immutable-collection error) or describe
        # stale weights.
        self._variables = value
        if getattr(self, "_quant_static", False) and "quant" not in value:
            self._quant_ready = False

    def _pack_flat(self, images: np.ndarray) -> np.ndarray:
        """Host wire packing shared by dispatch() and calibrate():
        pad to batch_size, pack (s2d / planar), flatten."""
        return pack_wire(images, self.batch_size, self._s2d_wire)

    def calibrate(self, images: np.ndarray, mark_ready: bool = True) -> None:
        """Record int8_static activation scales (running per-layer abs-max)
        from a representative batch. images: [B, S, S, 3] uint8 or float32
        in [0, 1]. Callable repeatedly — scales only grow. Values beyond
        the calibrated range clip to +-127 at serving time (the standard
        post-training-quantization contract)."""
        if not self._quant_static:
            return
        if self._u8_stem and images.dtype != np.uint8:
            # The direct-u8 stem records its quant variables only when the
            # traced calibration batch IS uint8 (the float input keeps the
            # bf16 stem, darknet.Backbone); calibrating on floats would
            # leave the collection missing the stem's wq/sw/amax and the
            # next uint8 dispatch would crash on the immutable collection.
            # Serving with QUANT_STEM always consumes uint8 wire bytes, so
            # quantizing the calibration batch to uint8 is also the MORE
            # representative distribution to record.
            images = np.clip(np.round(np.asarray(images, np.float32)
                                      * 255.0), 0, 255).astype(np.uint8)
        flat = self._pack_flat(images)
        base = {k: v for k, v in self.variables.items() if k != "quant"}
        feed = dict(base)
        if "quant" in self.variables:
            feed["quant"] = self.variables["quant"]
        if self._in_sharding is not None:
            # mesh predictor: the calibration batch must enter through the
            # same global sharding as serving batches (a process-local
            # array cannot feed a jit over globally-sharded variables),
            # and multi-process runs need the same compile-then-barrier
            # as dispatch() so gloo's ~30 s communicator rendezvous isn't
            # blown by cross-process compile skew.
            arr = jax.make_array_from_process_local_data(
                self._in_sharding, flat)
            if jax.process_count() > 1 and not self._calib_lockstep_done:
                from yolov4_tpu.parallel.mesh import coordinator_lockstep
                self._calib.lower(feed, arr).compile()
                coordinator_lockstep(f"calib_{self.img_size}"
                                     f"_{self.batch_size}")
                self._calib_lockstep_done = True
        else:
            arr = jnp.asarray(flat)
        quant = jax.device_get(self._calib(feed, arr))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            # every process must serve with identical scales: take the
            # cross-process max leafwise (processes saw different shards)
            quant = jax.tree.map(
                lambda x: multihost_utils.process_allgather(x).max(axis=0),
                quant)
        put = (lambda t: jax.device_put(t, self._replicated)
               if self._replicated is not None else jax.device_put(t))
        if mark_ready:
            self.variables = {**base, "quant": put(quant)}
            self._quant_ready = True
        else:
            # compile-only SEED scales (warmup before calibration): kept
            # OUT of .variables so a caller capturing .variables can never
            # mistake degenerate pre-calibration scales for calibration
            self._quant_seed = put(quant)

    def warmup(self, dtype=np.float32) -> None:
        """Compile the EXACT program dispatch() will run: the dummy goes
        through the same input-sharding path (a single-device zeros array
        would compile a different executable on mesh predictors — and fail
        outright multi-process), and the int8_static seed calibration uses
        the same ``dtype`` as serving so the calibration program traced
        here is the one the first real calibrate() reuses."""
        variables = self.variables
        if self._quant_static and "quant" not in variables:
            if self._quant_seed is None:
                # seed scales so the serving program can compile; real
                # scales arrive with the first calibrate(). The seed stays
                # out of .variables (see calibrate).
                self.calibrate(np.zeros(
                    (1, self.img_size, self.img_size, 3), dtype),
                    mark_ready=False)
            variables = {**variables, "quant": self._quant_seed}
        flat = np.zeros((self.batch_size, self.img_size ** 2 * 3), dtype)
        jax.block_until_ready(
            self._run(variables, self._to_device(flat, variables),
                      self.conf_thre, self.nms_thre))

    def dispatch(self, images: np.ndarray):
        """Async path: pad/flatten/upload and dispatch the compiled program;
        returns device futures (detections, valid) — plus relevant_count
        when ``count_relevant`` (max_dets deeper than the scoring cap). Use
        for pipelined loops — fetch with np.asarray when needed. images:
        [B, S, S, 3] float32 in [0, 1] or uint8 (normalized on device)."""
        if self._quant_static and not self._quant_ready:
            self.calibrate(images)  # int8_static: calibrate on first batch
        flat = self._pack_flat(images)
        arr = self._to_device(flat)
        return self._run(self.variables, arr, self.conf_thre, self.nms_thre)

    def _to_device(self, flat: np.ndarray, variables=None):
        """Host wire bytes -> device array through the serving input path:
        the mesh input sharding when present (one global array assembled
        from per-process shards), with the multi-process compile-then-
        barrier on first use — gloo creates its communicator contexts at
        the first execution under a hardcoded ~30 s rendezvous, which
        cross-process compile skew on contended hosts otherwise blows
        (see parallel.mesh.coordinator_lockstep). ``variables``: the tree
        the caller will feed _run (warmup's seed-merged tree) so the
        lockstep pre-compile matches the executed signature."""
        if self._in_sharding is None:
            return jnp.asarray(flat)
        arr = jax.make_array_from_process_local_data(self._in_sharding, flat)
        if jax.process_count() > 1 and not self._lockstep_done:
            from yolov4_tpu.parallel.mesh import coordinator_lockstep
            v = self.variables if variables is None else variables
            self._run.lower(v, arr, self.conf_thre,
                            self.nms_thre).compile()
            coordinator_lockstep(f"predictor_{self.img_size}"
                                 f"_{self.batch_size}")
            self._lockstep_done = True
        return arr

    @staticmethod
    def fetch_local(arr) -> np.ndarray:
        """Fetch this process's rows of a (possibly multi-host-sharded)
        result array. Fully-addressable arrays fetch whole."""
        if getattr(arr, "is_fully_addressable", True):
            return np.asarray(arr)
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards])

    def __call__(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Synchronous predict. images: [B, S, S, 3] float32 in [0, 1] or
        uint8, B <= batch_size.

        Returns (detections [B, max_dets, 7], valid [B, max_dets]) numpy,
        rows = x1, y1, x2, y2, obj, cls_conf, cls_idx in input pixels.
        """
        n = images.shape[0]
        out = self.dispatch(images)
        return self.fetch_local(out[0])[:n], self.fetch_local(out[1])[:n]
