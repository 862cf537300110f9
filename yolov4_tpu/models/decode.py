"""Anchor decoding (reference yolo/model/yololayer.py:16-166) as pure
functions over NHWC head outputs.

For each scale l (strides 8/16/32) the raw head output [B, f, f, 3*(5+C)]
is viewed as [B, 3, f, f, 5+C] (anchor-major channel order, matching the
torch reshape of [B, 3*(5+C), f, f]), then:

    bx = sigmoid(tx) + cx          bw = exp(tw) * anchor_w / stride
    by = sigmoid(ty) + cy          bh = exp(th) * anchor_h / stride
    obj/cls = sigmoid(raw)

Training returns per-layer (output, pred) pairs feeding the loss — `output`
keeps RAW tw/th (only xy/obj/cls sigmoided), `pred` holds decoded grid-unit
boxes, exactly as yololayer.py:122-145. Eval scales decoded boxes by the
stride into input pixels and flattens (yololayer.py:146-166).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

STRIDES: Tuple[int, int, int] = (8, 16, 32)


def masked_anchors(anchors: Sequence[Sequence[float]],
                   anchor_mask: Sequence[Sequence[int]],
                   layer_no: int) -> np.ndarray:
    """Per-layer anchors in grid units: anchors[mask] / stride
    (reference yololayer.py:73-76). Returns [n_anchors, 2] float32."""
    stride = STRIDES[layer_no]
    sel = [anchors[i] for i in anchor_mask[layer_no]]
    return np.asarray(sel, dtype=np.float32) / float(stride)


def split_head_output(raw: jnp.ndarray, n_anchors: int, n_ch: int) -> jnp.ndarray:
    """[B, f_h, f_w, A*n_ch] NHWC -> [B, A, f_h, f_w, n_ch], anchor-major.

    The torch layout is [B, A*n_ch, f_h, f_w] reshaped to [B, A, n_ch, ...]:
    channel index c = a * n_ch + k. Our NHWC conv produces the same channel
    ordering on the last axis, so the reshape is [B, f, f, A, n_ch].
    """
    b, fh, fw, _ = raw.shape
    x = raw.reshape(b, fh, fw, n_anchors, n_ch)
    return jnp.transpose(x, (0, 3, 1, 2, 4))


def decode_layer(raw: jnp.ndarray, anchors_grid: jnp.ndarray, layer_no: int,
                 training: bool):
    """Decode one scale.

    Args:
      raw: [B, f_h, f_w, A*(5+C)] NHWC head output (pre-activation).
      anchors_grid: [A, 2] anchors already divided by the stride.
      layer_no: 0/1/2 selecting stride 8/16/32.
      training: choose the train (dict) or eval (flat pixels) branch.

    Returns:
      training: dict(layer_no, output=[B,A,f,f,5+C] with raw wh,
                     pred=[B,A,f,f,4] decoded cxcywh in grid units)
      eval: [B, A*f_h*f_w, 5+C] decoded, boxes in input pixels.
    """
    n_anchors = anchors_grid.shape[0]
    n_ch = raw.shape[-1] // n_anchors
    stride = STRIDES[layer_no]

    x = split_head_output(raw, n_anchors, n_ch)  # [B, A, fh, fw, n_ch]
    b, _, fh, fw, _ = x.shape
    dtype = jnp.float32
    x = x.astype(dtype)

    txy = jax.nn.sigmoid(x[..., 0:2])
    twh = x[..., 2:4]
    objcls = jax.nn.sigmoid(x[..., 4:])

    cx = jax.lax.broadcasted_iota(dtype, (b, n_anchors, fh, fw), 3)
    cy = jax.lax.broadcasted_iota(dtype, (b, n_anchors, fh, fw), 2)
    grid = jnp.stack([cx, cy], axis=-1)  # [B, A, fh, fw, 2]

    anc = anchors_grid.astype(dtype).reshape(1, n_anchors, 1, 1, 2)
    box_xy = txy + grid
    box_wh = jnp.exp(twh) * anc

    if training:
        output = jnp.concatenate([txy, twh, objcls], axis=-1)
        pred = jnp.concatenate([box_xy, box_wh], axis=-1)
        return {"layer_no": layer_no, "output": output, "pred": pred}

    boxes = jnp.concatenate([box_xy, box_wh], axis=-1) * stride
    flat = jnp.concatenate([boxes, objcls], axis=-1)
    return flat.reshape(b, n_anchors * fh * fw, n_ch)


def decode_layer_split(raws_a: Sequence[jnp.ndarray],
                       anchors_grid: jnp.ndarray,
                       layer_no: int) -> jnp.ndarray:
    """Eval decode of one scale from PER-ANCHOR head maps (Head
    anchor_split=True): each [B, f_h, f_w, 5+C] map decodes in its natural
    layout and flattens to [B, f_h*f_w, 5+C]; concatenating over anchors
    yields exactly the fused path's anchor-major candidate order with no
    [B,f,f,A,C] -> [B,A,f,f,C] transpose materialized."""
    stride = STRIDES[layer_no]
    dtype = jnp.float32
    outs = []
    for a, raw in enumerate(raws_a):
        x = raw.astype(dtype)
        b, fh, fw, n_ch = x.shape
        txy = jax.nn.sigmoid(x[..., 0:2])
        twh = x[..., 2:4]
        objcls = jax.nn.sigmoid(x[..., 4:])
        cx = jax.lax.broadcasted_iota(dtype, (b, fh, fw), 2)
        cy = jax.lax.broadcasted_iota(dtype, (b, fh, fw), 1)
        grid = jnp.stack([cx, cy], axis=-1)           # [B, fh, fw, 2]
        anc = anchors_grid[a].astype(dtype).reshape(1, 1, 1, 2)
        boxes = jnp.concatenate([txy + grid, jnp.exp(twh) * anc],
                                axis=-1) * stride
        flat = jnp.concatenate([boxes, objcls], axis=-1)
        outs.append(flat.reshape(b, fh * fw, n_ch))
    return jnp.concatenate(outs, axis=1)


def decode_all(raws: List, anchors: Sequence[Sequence[float]],
               anchor_mask: Sequence[Sequence[int]], training: bool):
    """Decode all three scales. Training: list of per-layer dicts (order
    preserved). Eval: concatenated [B, sum_l A*f_l^2, 5+C]
    (reference yolov4.py:321-324). A scale given as a tuple/list of
    per-anchor maps (Head anchor_split) uses the transpose-free path."""
    outs = []
    for layer_no, raw in enumerate(raws):
        anc = jnp.asarray(masked_anchors(anchors, anchor_mask, layer_no))
        if isinstance(raw, (tuple, list)):
            assert not training, "anchor_split decode is eval-only"
            outs.append(decode_layer_split(raw, anc, layer_no))
        else:
            outs.append(decode_layer(raw, anc, layer_no, training))
    if training:
        return outs
    return jnp.concatenate(outs, axis=1)
