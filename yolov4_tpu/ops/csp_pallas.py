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


def _pick_th(h: int, w: int, c: int, c2: int, halo: int, num_blocks: int,
             dtype, weight_bytes: int, budget: int = 11 * 2 ** 20):
    """Largest valid row-tile height fitting the VMEM budget, or None.

    Valid: th divides H, and halo | th (the halo BlockSpec index maps
    need element offsets that are multiples of the halo block height) —
    except th == H, where the halo views are never read."""
    divs = [d for d in range(h, 0, -1)
            if h % d == 0 and (d % halo == 0 or d == h)]
    for th in divs:
        p = th + 4 * halo
        if num_blocks == 0:  # csp0: x, a, s at C + t at C/2
            est = (3 * _vmem_bytes((p, w, c), dtype)
                   + _vmem_bytes((p, w, c2), dtype))
        else:                # csp: x at C + h, p at C/2
            est = (_vmem_bytes((p, w, c), dtype)
                   + 2 * _vmem_bytes((p, w, c2), dtype))
        est += 2 * _vmem_bytes((th, w, c), dtype) + weight_bytes
        # the th + 2*halo input views are also double-buffered by Mosaic
        est += 2 * _vmem_bytes((th + 2 * halo, w, c), dtype)
        if est <= budget:
            return th
    return None


def fused_csp_supported(shape, num_blocks: int, force_th: int = 0) -> bool:
    """Whether fused_csp_stage can run for this input shape/topology."""
    _, h, w, c = shape
    halo = max(1, num_blocks)
    if force_th:
        return h % force_th == 0 and (force_th % halo == 0 or force_th == h)
    # weight bytes bounded by the largest supported stage (stage3 ~3 MB)
    return _pick_th(h, w, c, c // 2, halo, num_blocks, jnp.bfloat16,
                    3 * 2 ** 20) is not None


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


def _conv3x3_rows(src_ref, rows0: int, n: int, w3_ref, width: int, dtype):
    """3x3 same-pad conv over rows [rows0, rows0+n) of src (reads one halo
    row each side; width zero-padded in VMEM) -> f32 [n*W, co]. Keep n
    small (a row chunk) — the result is a live value."""
    ci = src_ref.shape[-1]
    acc = None
    for dy in range(3):
        sl = src_ref[rows0 + dy - 1: rows0 + dy - 1 + n]    # [n, W, ci]
        z = jnp.zeros((n, 1, ci), dtype)
        slp = jnp.concatenate([z, sl, z], axis=1)           # [n, W+2, ci]
        for dx in range(3):
            m = slp[:, dx:dx + width].reshape(n * width, ci)
            d = jnp.dot(m, w3_ref[dy, dx],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc


def _fill_input(x_up, x_main, x_dn, x_buf, *, th: int, halo: int, ext: int,
                width: int, c: int, dtype):
    """Assemble the real window [r0-halo, r0+th+halo) into x_buf rows
    [ext, ext+th+2*halo), zero-filling rows outside the image."""
    j = pl.program_id(1)
    last = pl.num_programs(1) - 1
    zero = jnp.zeros((halo, width, c), dtype)

    @pl.when(j > 0)
    def _up():
        x_buf[ext:ext + halo] = x_up[0]

    @pl.when(j == 0)
    def _up_zero():
        x_buf[ext:ext + halo] = zero

    x_buf[ext + halo:ext + halo + th] = x_main[0]

    @pl.when(j < last)
    def _dn():
        x_buf[ext + halo + th:ext + 2 * halo + th] = x_dn[0]

    @pl.when(j == last)
    def _dn_zero():
        x_buf[ext + halo + th:ext + 2 * halo + th] = zero


def _zero_oob(buf, *, th: int, halo: int, ext: int, width: int, cdim: int,
              dtype):
    """Zero the real-window rows that fall outside the image (the first/
    last tile's window extends `halo` rows past the image edge, and the
    pointwise ops write mish(bias) != 0 there — a 3x3 consuming the
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
                 x_buf, a_buf, t_buf, s_buf,
                 *, width: int, c: int, th: int, halo: int, ext: int,
                 dtype):
    r = th + 2 * halo

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        x_buf[...] = jnp.zeros_like(x_buf)
        a_buf[...] = jnp.zeros_like(a_buf)
        t_buf[...] = jnp.zeros_like(t_buf)
        s_buf[...] = jnp.zeros_like(s_buf)

    _fill_input(x_up, x_main, x_dn, x_buf, th=th, halo=halo, ext=ext,
                width=width, c=c, dtype=dtype)
    cr = _chunk_rows(width)

    # a = cba(x, part2_1_1); t = cba(a, part2_1_2_0)   (full real window)
    _pw(x_buf, a_buf, ext, r, w211, b211, width, dtype)
    _pw(a_buf, t_buf, ext, r, w2120, b2120, width, dtype)
    _zero_oob(t_buf, th=th, halo=halo, ext=ext, width=width,
              cdim=t_buf.shape[-1], dtype=dtype)
    # s = a + cba3(t)
    for a in range(0, r, cr):
        m = min(cr, r - a)
        u = _mish(_conv3x3_rows(t_buf, ext + a, m, w3, width, dtype)
                  + b3[0])
        s_buf[ext + a:ext + a + m] = (
            a_buf[ext + a:ext + a + m]
            + u.reshape(m, width, c).astype(dtype))
    # tail on the tile's output rows only (static: buffer rows ext+halo..)
    o0 = ext + halo
    for a in range(0, th, cr):
        m = min(cr, th - a)
        x2 = _mish(jnp.dot(s_buf[o0 + a:o0 + a + m].reshape(m * width, c),
                           w22[...], preferred_element_type=jnp.float32)
                   + b22[0])
        x1 = _mish(jnp.dot(x_buf[o0 + a:o0 + a + m].reshape(m * width, c),
                           w1[...], preferred_element_type=jnp.float32)
                   + b1[0])
        out = _mish(jnp.dot(x2.astype(dtype), wt[:c],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(x1.astype(dtype), wt[c:],
                              preferred_element_type=jnp.float32) + bt[0])
        out_ref[0, a:a + m] = out.reshape(m, width, c).astype(dtype)


def _csp_kernel(x_up, x_main, x_dn, *refs, width: int, c: int, c2: int,
                num_blocks: int, th: int, halo: int, ext: int, dtype):
    (w1, b1, w20, b20), wb = refs[:4], refs[4:4 + 4 * num_blocks]
    w22, b22, wt, bt = refs[4 + 4 * num_blocks:4 + 4 * num_blocks + 4]
    out_ref, x_buf, h_buf, p_buf = refs[4 + 4 * num_blocks + 4:]
    r = th + 2 * halo

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero():
        x_buf[...] = jnp.zeros_like(x_buf)
        h_buf[...] = jnp.zeros_like(h_buf)
        p_buf[...] = jnp.zeros_like(p_buf)

    _fill_input(x_up, x_main, x_dn, x_buf, th=th, halo=halo, ext=ext,
                width=width, c=c, dtype=dtype)
    cr = _chunk_rows(width)

    # h = cba(x, part2_0)
    _pw(x_buf, h_buf, ext, r, w20, b20, width, dtype)
    for i in range(num_blocks):
        wi0, bi0, wi3, bi3 = wb[4 * i:4 * i + 4]
        _pw(h_buf, p_buf, ext, r, wi0, bi0, width, dtype)
        _zero_oob(p_buf, th=th, halo=halo, ext=ext, width=width, cdim=c2,
                  dtype=dtype)
        for a in range(0, r, cr):
            m = min(cr, r - a)
            q = _mish(_conv3x3_rows(p_buf, ext + a, m, wi3, width, dtype)
                      + bi3[0])
            h_buf[ext + a:ext + a + m] = (
                h_buf[ext + a:ext + a + m]
                + q.reshape(m, width, c2).astype(dtype))
    o0 = ext + halo
    for a in range(0, th, cr):
        m = min(cr, th - a)
        x2 = _mish(jnp.dot(h_buf[o0 + a:o0 + a + m].reshape(m * width, c2),
                           w22[...], preferred_element_type=jnp.float32)
                   + b22[0])
        x1 = _mish(jnp.dot(x_buf[o0 + a:o0 + a + m].reshape(m * width, c),
                           w1[...], preferred_element_type=jnp.float32)
                   + b1[0])
        out = _mish(jnp.dot(x2.astype(dtype), wt[:c2],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(x1.astype(dtype), wt[c2:],
                              preferred_element_type=jnp.float32) + bt[0])
        out_ref[0, a:a + m] = out.reshape(m, width, c).astype(dtype)


def _as_1x1(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """[1,1,ci,co] folded kernel -> [ci, co] in compute dtype."""
    return w.reshape(w.shape[-2], w.shape[-1]).astype(dtype)


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
            folded["part2_1_2_1"][0].astype(dtype),           # [3,3,c2,c]
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
                folded[f"block{i}_1"][0].astype(dtype),       # [3,3,c2,c2]
                _as_bias(folded[f"block{i}_1"][1]),
            ]
        weights += [
            _as_1x1(folded["part2_2"][0], dtype),
            _as_bias(folded["part2_2"][1]),
            _as_1x1(folded["transition"][0], dtype),          # [c, c]
            _as_bias(folded["transition"][1]),
        ]

    weight_bytes = sum(_vmem_bytes(w.shape, w.dtype) for w in weights)
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
            pltpu.VMEM((p, width, c), dtype),    # x_buf
            pltpu.VMEM((p, width, c), dtype),    # a_buf
            pltpu.VMEM((p, width, c2), dtype),   # t_buf
            pltpu.VMEM((p, width, c), dtype),    # s_buf
        ]
    else:
        kernel = functools.partial(_csp_kernel, width=width, c=c,
                                   c2=c2, num_blocks=num_blocks, th=th,
                                   halo=halo, ext=ext, dtype=dtype)
        scratch = [
            pltpu.VMEM((p, width, c), dtype),    # x_buf
            pltpu.VMEM((p, width, c2), dtype),   # h_buf
            pltpu.VMEM((p, width, c2), dtype),   # p_buf
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
