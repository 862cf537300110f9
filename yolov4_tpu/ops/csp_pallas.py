"""Pallas TPU kernels: fused eval-time CSP backbone stages.

The stride-4/8 CSPDarknet53 stages are ~8x memory-bound under XLA: every
conv in a stage round-trips a full-resolution activation tensor through
HBM (stage1 at 608^2 input moves ~8 x 189 MB for 12 GFLOP of 64-channel
matmuls — the op-level profile in docs/PERF.md shows these fusions
dominating the forward). A whole stage is fused here into ONE kernel:
the input tile lands in VMEM once, every 1x1/3x3 conv + folded BatchNorm
affine + Mish runs on-chip (MXU dots over [rows*W, C] matrices), and only
the stage output is written back — ~2 passes of HBM traffic instead of
~8-20.

Eval-only (BatchNorm running stats are folded into the conv kernels as a
per-output-channel affine; training keeps the XLA path). Exact stage
topologies of reference darknet.py:84-138:

  csp0 (stage1):  base conv is applied OUTSIDE; this kernel computes
      a  = cba(x, part2_1_1)        # 1x1 C->C
      t  = cba(a, part2_1_2_0)      # 1x1 C->C/2
      u  = cba3(t, part2_1_2_1)     # 3x3 C/2->C
      x2 = cba(a + u, part2_2)      # 1x1 C->C
      x1 = cba(x, part1)            # 1x1 C->C
      out= cba(concat(x2, x1), transition)   # 1x1 2C->C

  csp (stage2+):
      h  = cba(x, part2_0)          # 1x1 C->C/2
      nb x [ p = cba(h, i_0); h = h + cba3(p, i_1) ]   # 1x1 + 3x3 residual
      x2 = cba(h, part2_2)          # 1x1 C/2->C/2
      x1 = cba(x, part1)            # 1x1 C->C/2
      out= cba(concat(x2, x1), transition)   # 1x1 C->C

Tiling: grid (batch, row-tiles). The input arrives as THREE BlockSpec
views — the tile's own th rows plus `halo`-row windows just above and
below it (index maps clamped at the image edges; requires halo | th) —
because Mosaic rejects manually-DMA'd memref slices whose trailing dim
(C=64 in stage1) is narrower than the 128-lane tile, while ordinary
pipelined input blocks relayout fine. The kernel assembles them into a
working buffer whose rows carry a zero "extension" of `halo` rows on each
side — exactly the 3x3 convs' zero padding at image borders, and never
read elsewhere (the halo-shrink argument: a chain of `halo` 3x3s
contaminates at most the outermost `halo` rows of the real window, which
sit outside the tile's output rows). Intermediates are computed on the
full window; only the final transition is sliced to the output rows.

Numerics: dots are input-dtype (bf16) with f32 accumulation; the folded
affine + Mish run in f32 — at least as accurate as the XLA path (bf16
BN/Mish), parity-tested against it elementwise (tests/test_csp_pallas.py)
and on chip (tools/check_csp_fused.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(x: jnp.ndarray) -> jnp.ndarray:
    """Algebraic Mish (see models/layers.mish) — f32 in-kernel."""
    e = jnp.exp(jnp.minimum(x, 20.0))
    a = e * (e + 2.0)
    return jnp.where(x > 20.0, x, x * a / (a + 2.0))


def _vmem_bytes(shape: Sequence[int], dtype) -> int:
    """Physical VMEM footprint: the lane (last) dim pads to 128, the
    sublane dim to the dtype's min tile."""
    sub = {2: 16, 4: 8}[jnp.dtype(dtype).itemsize]
    lanes = -(-shape[-1] // 128) * 128
    subl = -(-shape[-2] // sub) * sub
    n = 1
    for s in shape[:-2]:
        n *= s
    return n * subl * lanes * jnp.dtype(dtype).itemsize


def _default_budget() -> int:
    """VMEM planning budget for _pick_th (MB). Larger tiles cut redundant
    halo compute but risk Mosaic scoped-vmem OOM at compile time; the
    default was chosen by on-chip sweep (YOLOV4_CSP_VMEM_MB overrides)."""
    import os
    return int(os.environ.get("YOLOV4_CSP_VMEM_MB", "11")) * 2 ** 20


def _pick_th(h: int, w: int, c: int, c2: int, halo: int, num_blocks: int,
             dtype, weight_bytes: int, budget: int = 0):
    """Largest valid row-tile height fitting the VMEM budget, or None.

    Valid: th divides H, and halo | th (the halo BlockSpec index maps
    need element offsets that are multiples of the halo block height) —
    except th == H, where the halo views are never read."""
    budget = budget or _default_budget()
    divs = [d for d in range(h, 0, -1)
            if h % d == 0 and (d % halo == 0 or d == h)]
    for th in divs:
        p = th + 4 * halo
        cr = _chunk_rows(w)
        if num_blocks == 0:  # csp0: a at C + t at C/2 + wide
            est = (_vmem_bytes((p, w, c), dtype)
                   + _vmem_bytes((p, w, c2), dtype))
        else:                # csp: h, p at C/2 + wide
            est = 2 * _vmem_bytes((p, w, c2), dtype)
        est += _vmem_bytes((cr, w, 3 * c2), dtype)
        est += 2 * _vmem_bytes((th, w, c), dtype) + weight_bytes
        # the th + 2*halo input views are also double-buffered by Mosaic
        est += 2 * _vmem_bytes((th + 2 * halo, w, c), dtype)
        if est <= budget:
            return th
    return None


def _stage_weight_shapes(c: int, num_blocks: int, dtype):
    """(shape, dtype) of every VMEM-resident weight buffer, exactly
    mirroring the weights list fused_csp_stage builds: each conv kernel in
    the compute dtype plus its (1, co) float32 bias row (lane-padded to
    8x128, ~50-150 KB/stage in total — NOT negligible at a knife-edge
    budget). One shared source for the gate and the kernel, so they can
    never disagree on the footprint."""
    c2 = c // 2
    if num_blocks == 0:
        kernels = [(c, c), (c, c2), (3, 3 * c2, c), (c, c), (c, c),
                   (2 * c, c)]
    else:
        kernels = [(c, c2), (c, c2)]
        kernels += [(c2, c2), (3, 3 * c2, c2)] * num_blocks
        kernels += [(c2, c2), (c, c)]
    out = []
    for k in kernels:
        out.append((k, dtype))
        out.append(((1, k[-1]), jnp.float32))
    return out


def _weight_vmem_bytes(c: int, num_blocks: int, dtype) -> int:
    """Exact VMEM footprint of a stage's weight buffers (kernels + biases)."""
    return sum(_vmem_bytes(s, d)
               for s, d in _stage_weight_shapes(c, num_blocks, dtype))


def fused_csp_supported(shape, num_blocks: int, force_th: int = 0,
                        dtype=jnp.bfloat16) -> bool:
    """Whether fused_csp_stage can run for this input shape/topology/dtype.

    Must agree with fused_csp_stage's own _pick_th call (same dtype and
    the exact weight footprint), or a passing gate can still raise at
    trace time instead of falling back to the plain path."""
    _, h, w, c = shape
    halo = max(1, num_blocks)
    if force_th:
        return h % force_th == 0 and (force_th % halo == 0 or force_th == h)
    return _pick_th(h, w, c, c // 2, halo, num_blocks, dtype,
                    _weight_vmem_bytes(c, num_blocks, dtype)) is not None


def _chunk_rows(width: int) -> int:
    """Row sub-chunk for in-kernel compute: bounds live f32 accumulator
    values (VMEM 'stack') to ~1 MB regardless of tile height."""
    return max(1, 2048 // width)


def _pw(src_ref, dst_ref, rows0: int, n: int, w_ref, b_ref, width: int,
        dtype):
    """dst[rows] = mish(src[rows] @ w + b), chunked over rows."""
    cr = _chunk_rows(width)
    for a in range(0, n, cr):
        m = min(cr, n - a)
        r0 = rows0 + a
        acc = jnp.dot(src_ref[r0:r0 + m].reshape(m * width, -1), w_ref[...],
                      preferred_element_type=jnp.float32)
        y = _mish(acc + b_ref[0])
        dst_ref[r0:r0 + m] = y.reshape(m, width, -1).astype(dtype)


def _pw_view(src_ref, dst_ref, dst0: int, n: int, w_ref, b_ref,
             width: int, dtype):
    """Like _pw but reads a [1, n, W, C] BlockSpec input view, writing its
    n rows to dst rows [dst0, dst0+n)."""
    cr = _chunk_rows(width)
    for a in range(0, n, cr):
        m = min(cr, n - a)
        acc = jnp.dot(src_ref[0, a:a + m].reshape(m * width, -1), w_ref[...],
                      preferred_element_type=jnp.float32)
        y = _mish(acc + b_ref[0])
        dst_ref[dst0 + a:dst0 + a + m] = y.reshape(m, width, -1).astype(dtype)


def _conv3x3_rows(src_ref, wide_ref, rows0: int, n: int, w3_ref,
                  width: int, dtype):
    """3x3 same-pad conv over rows [rows0, rows0+n) of src (reads one halo
    row each side; width zero-padded in VMEM) -> f32 [n*W, co]. Keep n
    small (a row chunk) — the result is a live value.

    The three dx taps are packed along channels into ONE dot of K = 3*ci
    per dy row (w3_ref arrives pre-reshaped [3, 3*ci, co], dx-major) —
    the kernel is MXU-row-throughput-bound, and 3 wide dots pass 3x fewer
    rows through the systolic array than 9 narrow ones. The packing goes
    through the wide_ref scratch because Mosaic cannot lane-concatenate
    sublane-shifted vectors directly (stores relayout instead)."""
    ci = src_ref.shape[-1]
    acc = None
    for dy in range(3):
        sl = src_ref[rows0 + dy - 1: rows0 + dy - 1 + n]    # [n, W, ci]
        z = jnp.zeros((n, 1, ci), dtype)
        slp = jnp.concatenate([z, sl, z], axis=1)           # [n, W+2, ci]
        for dx in range(3):
            wide_ref[:n, :, dx * ci:(dx + 1) * ci] = slp[:, dx:dx + width]
        d = jnp.dot(wide_ref[:n].reshape(n * width, 3 * ci), w3_ref[dy],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _zero_oob(buf, *, th: int, halo: int, ext: int, width: int, cdim: int,
              dtype):
    """Zero the real-window rows that fall outside the image (the first/
    last tile's window extends `halo` rows past the image edge, and the
    pointwise ops write nonzero values there — a 3x3 consuming the
    buffer must see the conv's zero padding instead)."""
    j = pl.program_id(1)
    last = pl.num_programs(1) - 1
    z = jnp.zeros((halo, width, cdim), dtype)

    @pl.when(j == 0)
    def _top():
        buf[ext:ext + halo] = z

    @pl.when(j == last)
    def _bottom():
        buf[ext + halo + th:ext + 2 * halo + th] = z


def _csp0_kernel(x_up, x_main, x_dn, w211, b211, w2120, b2120, w3, b3,
                 w22, b22, w1, b1, wt, bt, out_ref,
                 a_buf, t_buf, wide_buf,
                 *, width: int, c: int, th: int, halo: int, ext: int,
                 dtype):
    r = th + 2 * halo

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        a_buf[...] = jnp.zeros_like(a_buf)
        t_buf[...] = jnp.zeros_like(t_buf)

    cr = _chunk_rows(width)

    # a = cba(x, part2_1_1) straight from the three input views (at image
    # edges the halo views hold clamped duplicates — harmless: every 3x3
    # input is zero-masked at out-of-image rows, and nothing else reads
    # them); t = cba(a, part2_1_2_0) over the full real window
    _pw_view(x_up, a_buf, ext, halo, w211, b211, width, dtype)
    _pw_view(x_main, a_buf, ext + halo, th, w211, b211, width, dtype)
    _pw_view(x_dn, a_buf, ext + halo + th, halo, w211, b211, width, dtype)
    _pw(a_buf, t_buf, ext, r, w2120, b2120, width, dtype)
    _zero_oob(t_buf, th=th, halo=halo, ext=ext, width=width,
              cdim=t_buf.shape[-1], dtype=dtype)
    # tail on the tile's output rows only (static: buffer rows ext+halo..):
    # s = a + cba3(t); x2 = cba(s); out = cba(concat(x2, x1(x))) fuse into
    # one chunked pass with no s buffer
    o0 = ext + halo
    for a in range(0, th, cr):
        m = min(cr, th - a)
        u = _mish(_conv3x3_rows(t_buf, wide_buf, o0 + a, m, w3, width,
                                dtype) + b3[0])
        s = (a_buf[o0 + a:o0 + a + m].astype(jnp.float32)
             .reshape(m * width, c) + u)
        x2 = _mish(jnp.dot(s.astype(dtype), w22[...],
                           preferred_element_type=jnp.float32) + b22[0])
        x1 = _mish(jnp.dot(x_main[0, a:a + m].reshape(m * width, c),
                           w1[...], preferred_element_type=jnp.float32)
                   + b1[0])
        cat = jnp.concatenate([x2, x1], axis=-1).astype(dtype)
        out = _mish(jnp.dot(cat, wt[...],
                            preferred_element_type=jnp.float32) + bt[0])
        out_ref[0, a:a + m] = out.reshape(m, width, c).astype(dtype)


def _csp_kernel(x_up, x_main, x_dn, *refs, width: int, c: int, c2: int,
                num_blocks: int, th: int, halo: int, ext: int, dtype):
    (w1, b1, w20, b20), wb = refs[:4], refs[4:4 + 4 * num_blocks]
    w22, b22, wt, bt = refs[4 + 4 * num_blocks:4 + 4 * num_blocks + 4]
    out_ref, h_buf, p_buf, wide_buf = refs[4 + 4 * num_blocks + 4:]
    r = th + 2 * halo

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        h_buf[...] = jnp.zeros_like(h_buf)
        p_buf[...] = jnp.zeros_like(p_buf)

    cr = _chunk_rows(width)

    # h = cba(x, part2_0) straight from the three input views (see
    # _csp0_kernel on why clamped edge duplicates are harmless)
    _pw_view(x_up, h_buf, ext, halo, w20, b20, width, dtype)
    _pw_view(x_main, h_buf, ext + halo, th, w20, b20, width, dtype)
    _pw_view(x_dn, h_buf, ext + halo + th, halo, w20, b20, width, dtype)
    for i in range(num_blocks):
        wi0, bi0, wi3, bi3 = wb[4 * i:4 * i + 4]
        _pw(h_buf, p_buf, ext, r, wi0, bi0, width, dtype)
        _zero_oob(p_buf, th=th, halo=halo, ext=ext, width=width, cdim=c2,
                  dtype=dtype)
        for a in range(0, r, cr):
            m = min(cr, r - a)
            q = _mish(_conv3x3_rows(p_buf, wide_buf, ext + a, m, wi3,
                                    width, dtype) + bi3[0])
            h_buf[ext + a:ext + a + m] = (
                h_buf[ext + a:ext + a + m]
                + q.reshape(m, width, c2).astype(dtype))
    o0 = ext + halo
    for a in range(0, th, cr):
        m = min(cr, th - a)
        x2 = _mish(jnp.dot(h_buf[o0 + a:o0 + a + m].reshape(m * width, c2),
                           w22[...], preferred_element_type=jnp.float32)
                   + b22[0])
        x1 = _mish(jnp.dot(x_main[0, a:a + m].reshape(m * width, c),
                           w1[...], preferred_element_type=jnp.float32)
                   + b1[0])
        cat = jnp.concatenate([x2, x1], axis=-1).astype(dtype)
        out = _mish(jnp.dot(cat, wt[...],
                            preferred_element_type=jnp.float32) + bt[0])
        out_ref[0, a:a + m] = out.reshape(m, width, c).astype(dtype)


def _as_1x1(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """[1,1,ci,co] folded kernel -> [ci, co] in compute dtype."""
    return w.reshape(w.shape[-2], w.shape[-1]).astype(dtype)


def _as_3x3(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """[3,3,ci,co] folded kernel -> [3, 3*ci, co] (dx-major rows), the
    layout _conv3x3_rows' dx-concatenated dots consume."""
    return w.reshape(3, 3 * w.shape[-2], w.shape[-1]).astype(dtype)


def _as_bias(b: jnp.ndarray) -> jnp.ndarray:
    return b.reshape(1, -1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_blocks", "interpret",
                                             "force_th"))
def fused_csp_stage(x: jnp.ndarray, folded: Dict[str, Tuple[jnp.ndarray,
                                                            jnp.ndarray]],
                    num_blocks: int = 0,
                    interpret: bool = False,
                    force_th: int = 0) -> jnp.ndarray:
    """Run a whole CSP stage body (everything after the base conv) fused.

    Args:
      x: [B, H, W, C] base-conv output (NHWC).
      folded: name -> (folded conv kernel [k,k,ci,co], bias [co]) with BN
        already folded in (see models.layers.FoldedConvBN). Names: csp0
        uses part1/part2_1_1/part2_1_2_0/part2_1_2_1/part2_2/transition;
        csp uses part1/part2_0/block{i}_0/block{i}_1/part2_2/transition.
      num_blocks: 0 selects the csp0 topology, else the generic CSP stage
        with that many residual blocks.

    Gate callers with :func:`fused_csp_supported`.
    """
    bsz, h, width, c = x.shape
    dtype = x.dtype
    c2 = c // 2
    halo = max(1, num_blocks)

    if num_blocks == 0:
        weights = [
            _as_1x1(folded["part2_1_1"][0], dtype),
            _as_bias(folded["part2_1_1"][1]),
            _as_1x1(folded["part2_1_2_0"][0], dtype),
            _as_bias(folded["part2_1_2_0"][1]),
            _as_3x3(folded["part2_1_2_1"][0], dtype),         # [3,3c2,c]
            _as_bias(folded["part2_1_2_1"][1]),
            _as_1x1(folded["part2_2"][0], dtype),
            _as_bias(folded["part2_2"][1]),
            _as_1x1(folded["part1"][0], dtype),
            _as_bias(folded["part1"][1]),
            _as_1x1(folded["transition"][0], dtype),          # [2c, c]
            _as_bias(folded["transition"][1]),
        ]
    else:
        weights = [
            _as_1x1(folded["part1"][0], dtype),
            _as_bias(folded["part1"][1]),
            _as_1x1(folded["part2_0"][0], dtype),
            _as_bias(folded["part2_0"][1]),
        ]
        for i in range(num_blocks):
            weights += [
                _as_1x1(folded[f"block{i}_0"][0], dtype),
                _as_bias(folded[f"block{i}_0"][1]),
                _as_3x3(folded[f"block{i}_1"][0], dtype),     # [3,3c2,c2]
                _as_bias(folded[f"block{i}_1"][1]),
            ]
        weights += [
            _as_1x1(folded["part2_2"][0], dtype),
            _as_bias(folded["part2_2"][1]),
            _as_1x1(folded["transition"][0], dtype),          # [c, c]
            _as_bias(folded["transition"][1]),
        ]

    weight_bytes = _weight_vmem_bytes(c, num_blocks, dtype)
    # the shared footprint must match the actual buffers (gate agreement)
    assert weight_bytes == sum(_vmem_bytes(w.shape, w.dtype)
                               for w in weights), "footprint drift"
    th = force_th or _pick_th(h, width, c, c2, halo, num_blocks, dtype,
                              weight_bytes)
    if th is None or h % th or (th % halo and th != h):
        raise ValueError(
            f"no valid row tile for H={h}, halo={halo} (th={th}) — gate "
            "with fused_csp_supported()")
    ext = halo
    p = th + 4 * halo

    if num_blocks == 0:
        kernel = functools.partial(_csp0_kernel, width=width, c=c,
                                   th=th, halo=halo, ext=ext, dtype=dtype)
        scratch = [
            pltpu.VMEM((p, width, c), dtype),    # a_buf
            pltpu.VMEM((p, width, c2), dtype),   # t_buf
            pltpu.VMEM((_chunk_rows(width), width, 3 * c2), dtype),
        ]
    else:
        kernel = functools.partial(_csp_kernel, width=width, c=c,
                                   c2=c2, num_blocks=num_blocks, th=th,
                                   halo=halo, ext=ext, dtype=dtype)
        scratch = [
            pltpu.VMEM((p, width, c2), dtype),   # h_buf
            pltpu.VMEM((p, width, c2), dtype),   # p_buf
            pltpu.VMEM((_chunk_rows(width), width, 3 * c2), dtype),
        ]

    # three views of x: the tile itself plus halo-row windows above/below
    # (block-index maps clamp at the edges; the kernel zero-fills there)
    tiles_per_halo = th // halo if th % halo == 0 else 1
    n_tiles = h // th
    x_specs = [
        pl.BlockSpec((1, halo, width, c),
                     lambda b, j: (b, jnp.maximum(j * tiles_per_halo - 1, 0),
                                   0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, width, c), lambda b, j: (b, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, halo, width, c),
                     lambda b, j: (b, jnp.minimum((j + 1) * tiles_per_halo,
                                                  h // halo - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, width, c), dtype),
        grid=(bsz, n_tiles),
        in_specs=x_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec((1, th, width, c),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, x, x, *weights)
