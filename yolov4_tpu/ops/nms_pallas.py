"""Pallas TPU kernel for greedy NMS suppression.

The XLA-level implementation (ops/nms.py) materializes a [B, K, K] IoU
matrix in HBM and streams one row per fori_loop iteration. This kernel
keeps everything VMEM-resident: per batch element, boxes live as an [8, K]
struct-of-arrays block (x1/y1/x2/y2/area/valid + padding — the SoA layout
keeps K on the 128-wide lane axis; an AoS [K, 4] block would waste 31/32
lanes), and the inherently sequential greedy pass runs as a fori_loop whose
per-step work is one [1, K] VPU IoU row computed on the fly. No HBM traffic
inside the loop, O(K) VMEM instead of O(K^2) HBM.

Semantics identical to ops/nms.greedy_nms_mask (suppress at IoU >= thresh
by a higher-scored KEPT candidate; suppressed boxes don't suppress).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(thresh_ref, data_ref, keep_ref):
    """data_ref: [8, K] (x1, y1, x2, y2, area, valid, pad, pad) in VMEM.
    keep_ref: [1, K] float32 output (1.0 = kept)."""
    k = data_ref.shape[1]
    x1 = data_ref[0:1, :]
    y1 = data_ref[1:2, :]
    x2 = data_ref[2:3, :]
    y2 = data_ref[3:4, :]
    area = data_ref[4:5, :]
    valid = data_ref[5:6, :]
    thresh = thresh_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep):
        # Mosaic can't dynamic-slice a lane index; extract box i's scalars
        # with masked reductions instead (one-hot dot on the VPU).
        eq_i = (col == i).astype(jnp.float32)
        xi1 = jnp.sum(x1 * eq_i)
        yi1 = jnp.sum(y1 * eq_i)
        xi2 = jnp.sum(x2 * eq_i)
        yi2 = jnp.sum(y2 * eq_i)
        area_i = jnp.sum(area * eq_i)
        active = jnp.sum(keep * valid * eq_i) > 0.0

        tlx = jnp.maximum(x1, xi1)
        tly = jnp.maximum(y1, yi1)
        brx = jnp.minimum(x2, xi2)
        bry = jnp.minimum(y2, yi2)
        has_inter = (tlx < brx) & (tly < bry)
        inter = jnp.where(has_inter, (brx - tlx) * (bry - tly), 0.0)
        union = jnp.maximum(area + area_i - inter, 1e-12)
        iou = inter / union

        suppress = (iou >= thresh) & (col > i) & active
        return jnp.where(suppress, 0.0, keep)

    keep0 = valid
    keep_ref[0:1, :] = jax.lax.fori_loop(0, k, body, keep0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def greedy_nms_mask_pallas(boxes_xyxy: jnp.ndarray, valid: jnp.ndarray,
                           iou_thresh, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops/nms.greedy_nms_mask.

    boxes_xyxy: [B, K, 4] score-sorted; valid: [B, K] bool. K should be a
    multiple of 128 for clean lane tiling (postprocess uses 2048).
    """
    b, k, _ = boxes_xyxy.shape
    boxes = boxes_xyxy.astype(jnp.float32)
    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    data = jnp.stack([
        boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3],
        area, valid.astype(jnp.float32),
        jnp.zeros((b, k), jnp.float32), jnp.zeros((b, k), jnp.float32),
    ], axis=1)  # [B, 8, K]

    thresh = jnp.asarray([iou_thresh], jnp.float32)

    keep = pl.pallas_call(
        _nms_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((None, 8, k), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, 1, k), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(thresh, data)
    return keep[:, 0, :] > 0.0
