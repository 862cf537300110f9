"""Fused Pallas CSP stage (ops/csp_pallas.py) vs the plain XLA path.

Runs in Pallas interpret mode on the CPU test backend; the same kernel
compiles natively on TPU (chip parity additionally covered by the full
converted-model test when MODEL.PALLAS_CSP is enabled there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.models.layers import (CSPDownSample, CSPDownSample0,
                                      FoldedConvBN)
from yolov4_tpu.ops.csp_pallas import fused_csp_stage


def _randomize(rng, tree):
    """Positive random values for every leaf (BN var must stay > 0)."""
    return jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.1, 1.0, a.shape), a.dtype), tree)


def _stage_pair(Mod, rng, **kw):
    plain = Mod(dtype=jnp.float32, fused=False, **kw)
    fused = Mod(dtype=jnp.float32, fused=True, **kw)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 8)), jnp.float32)
    v = plain.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert jax.tree.map(jnp.shape, v) == jax.tree.map(jnp.shape, v2), \
        "fused path must declare the identical parameter tree"
    return plain, fused, _randomize(rng, v), x


@pytest.mark.parametrize("Mod,kw", [
    (CSPDownSample0, dict(out_ch=16)),
    (CSPDownSample, dict(out_ch=16, num_blocks=2)),
    (CSPDownSample, dict(out_ch=16, num_blocks=4)),
])
def test_fused_stage_matches_plain(rng, Mod, kw):
    plain, fused, v, x = _stage_pair(Mod, rng, **kw)
    y0 = plain.apply(v, x, train=False)
    y1 = fused.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-6)


def test_fused_stage_train_falls_back(rng):
    """train=True must take the plain path (BN stats can't be folded)."""
    plain, fused, v, x = _stage_pair(CSPDownSample0, rng, out_ch=16)
    y0, m0 = plain.apply(v, x, train=True, mutable=["batch_stats"])
    y1, m1 = fused.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 m0, m1)


@pytest.mark.parametrize("num_blocks,th", [(0, 4), (0, 8), (2, 4), (4, 4),
                                           (3, 16)])
def test_fused_kernel_row_tiling(rng, num_blocks, th):
    """Small forced row tiles exercise the clamped DMA windows and the
    zero-extension halo logic at both image edges (whole-image tiles,
    which the auto th picks at these sizes, would not)."""
    c, h, w = 16, 16, 16
    c2 = c // 2
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)), jnp.float32)

    if num_blocks == 0:
        names = {"part1": (c, c, 1), "part2_1_1": (c, c, 1),
                 "part2_1_2_0": (c, c2, 1), "part2_1_2_1": (c2, c, 3),
                 "part2_2": (c, c, 1), "transition": (2 * c, c, 1)}
    else:
        names = {"part1": (c, c2, 1), "part2_0": (c, c2, 1),
                 "part2_2": (c2, c2, 1), "transition": (c, c, 1)}
        for i in range(num_blocks):
            names[f"block{i}_0"] = (c2, c2, 1)
            names[f"block{i}_1"] = (c2, c2, 3)

    folded = {}
    for name, (ci, co, k) in names.items():
        folded[name] = (
            jnp.asarray(rng.normal(0, 0.3, (k, k, ci, co)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.2, (co,)), jnp.float32))

    ref = fused_csp_stage(x, folded, num_blocks=num_blocks, interpret=True)
    tiled = fused_csp_stage(x, folded, num_blocks=num_blocks,
                            interpret=True, force_th=th)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_full_model_fused_matches_plain(rng):
    """Whole YOLOv4 eval forward with MODEL.PALLAS_CSP=True (stages 1-3
    fused, interpret mode on CPU) vs the default XLA path."""
    from yolov4_tpu.config import load_config
    from yolov4_tpu.models import build_model
    from yolov4_tpu.models.yolov4 import init_variables

    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    plain = build_model(cfg)
    cfg2 = load_config()
    cfg2["MODEL"]["COMPUTE_DTYPE"] = "float32"
    cfg2["MODEL"]["PALLAS_CSP"] = True
    fused = build_model(cfg2)

    v = init_variables(plain, jax.random.PRNGKey(0), 64)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    y0 = np.asarray(plain.apply(v, x, train=False))
    y1 = np.asarray(fused.apply(v, x, train=False))
    np.testing.assert_allclose(y1, y0, rtol=1e-4, atol=1e-5)


def test_folded_conv_bn_matches_conv_then_bn(rng):
    """FoldedConvBN's (kernel, bias) reproduce ConvBNAct eval math."""
    from yolov4_tpu.models.layers import ConvBNAct

    cin, cout = 8, 12
    x = jnp.asarray(rng.normal(0, 1, (2, 9, 9, cin)), jnp.float32)
    mod = ConvBNAct(cout, 3, 1, act="mish", dtype=jnp.float32)
    v = mod.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    v = _randomize(rng, v)

    y0 = mod.apply(v, x, train=False)

    fold = FoldedConvBN(cin, cout, 3)
    w, b = fold.apply(v)
    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    from yolov4_tpu.models.layers import mish
    np.testing.assert_allclose(np.asarray(mish(conv + b)), np.asarray(y0),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("size", [256, 320, 416, 512, 608])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_fused_gate_never_raises_at_trace_time(size, dtype):
    """The supported() gate and fused_csp_stage's internal tile search
    must agree for every size/dtype: a passing gate that still raises
    ValueError at trace time would crash the whole model apply instead
    of falling back (found in review for float32 at 512). eval_shape
    traces the full fused model without running it."""
    from yolov4_tpu.config import load_config
    from yolov4_tpu.models import build_model

    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = dtype
    cfg["MODEL"]["PALLAS_CSP"] = True
    model = build_model(cfg)

    x = jax.ShapeDtypeStruct((2, size, size, 3), jnp.float32)
    v = jax.eval_shape(
        lambda r, d: model.init({"params": r}, d, train=False),
        jax.ShapeDtypeStruct((2,), jnp.uint32), x)
    out = jax.eval_shape(
        lambda v, d: model.apply(v, d, train=False), v, x)
    n = sum(3 * (size // s) ** 2 for s in (8, 16, 32))
    assert out.shape == (2, n, 85)
