"""Lane packing (stage1 W-packing): exact equivalence with the plain path.

The wpack modes pack two image columns into the 128-lane channel dim for
the whole of stage1 (entry folded into stage1's base conv, exit into
stage2's base conv) with block-rearranged kernels and column-phase-tiled
BatchNorm. Like the s2d lowering this rearranges kernels, never the math —
identical params must give matching outputs, batch statistics, and
gradients. Measured 0.478x the plain stage1 op mix at 608/b16
(tools/exp_wpack.py; docs/PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.models.darknet import Backbone
from yolov4_tpu.models.layers import (_wpack_1x1_kernel, _wpack_3x3_kernel,
                                      ConvBNAct)


def wpack(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def wunpack(x):
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def _conv(x, w, stride=1):
    pad = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("ksize", [1, 3])
def test_wpack_kernel_equivalence(ksize):
    """Packed-kernel conv on a packed tensor == plain conv, any channels."""
    rng = np.random.default_rng(0)
    ci, co, hw = 16, 24, 12
    x = jnp.asarray(rng.standard_normal((2, hw, hw, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((ksize, ksize, ci, co)), jnp.float32)
    want = _conv(x, w)
    pk = _wpack_1x1_kernel(w) if ksize == 1 else _wpack_3x3_kernel(w)
    got = wunpack(_conv(wpack(x), pk))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["none", "fused"])
def test_backbone_wpack_matches_plain(mode):
    """Full backbone, wpack on vs off, shared params, both s2d modes."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    s2d = mode == "fused"
    plain = Backbone(s2d=s2d, wpack=False)
    packed = Backbone(s2d=s2d, wpack=True)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    shapes_p = jax.tree_util.tree_map(
        lambda a: a.shape, variables)
    shapes_w = jax.tree_util.tree_map(
        lambda a: a.shape, jax.jit(packed.init)(jax.random.PRNGKey(0), x))
    assert shapes_p == shapes_w  # checkpoint compatibility

    p3, p4, p5 = jax.jit(plain.apply)(variables, x)
    w3, w4, w5 = jax.jit(packed.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(w3), np.asarray(p3), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(w4), np.asarray(p4), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(w5), np.asarray(p5), rtol=2e-4, atol=2e-4)


def test_backbone_wpack_train_stats_match():
    """Train mode: outputs AND updated batch statistics match (the tiled
    BN reduces over column phases — the same element sets)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    plain = Backbone(s2d=True, wpack=False)
    packed = Backbone(s2d=True, wpack=True)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)

    run_p = jax.jit(lambda v, x: plain.apply(v, x, train=True,
                                             mutable=["batch_stats"]))
    run_w = jax.jit(lambda v, x: packed.apply(v, x, train=True,
                                              mutable=["batch_stats"]))
    (p3, _, _), pv = run_p(variables, x)
    (w3, _, _), wv = run_w(variables, x)
    np.testing.assert_allclose(np.asarray(w3), np.asarray(p3),
                               rtol=2e-4, atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        pv["batch_stats"], wv["batch_stats"])


def test_wpack_gradients_match():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    plain = Backbone(s2d=True, wpack=False)
    packed = Backbone(s2d=True, wpack=True)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(1), x)

    def loss(mod):
        def f(params):
            (o3, o4, o5), _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return (jnp.sum(o3 ** 2) + jnp.sum(o4 ** 2)
                    + jnp.sum(o5 ** 2)) / o3.size
        return f

    g_ref = jax.jit(jax.grad(loss(plain)))(variables["params"])
    g_new = jax.jit(jax.grad(loss(packed)))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4),
        g_ref, g_new)


def test_full_model_wpack_matches():
    """YOLOv4 end to end (decode included), wpack vs plain, eval mode."""
    from yolov4_tpu.config import load_config
    from yolov4_tpu.models import build_model
    from yolov4_tpu.models.yolov4 import init_variables

    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    plain = build_model(cfg)
    cfg["MODEL"]["WPACK"] = True
    packed = build_model(cfg)
    variables = init_variables(plain, jax.random.PRNGKey(0), 64)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    a = jax.jit(plain.apply, static_argnames="train")(variables, x, train=False)
    b = jax.jit(packed.apply, static_argnames="train")(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-4, atol=2e-4)


def test_wpack_odd_guard():
    """Inputs whose stage-1 dims are odd silently fall back to plain."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 36, 36, 3)), jnp.float32)
    # 36/2 = 18 even -> packs; 34/2 = 17 odd -> guard trips, still correct
    for hw in (36, 34):
        x = jnp.asarray(rng.standard_normal((1, hw, hw, 3)), jnp.float32)
        plain = Backbone(s2d=False, wpack=False)
        packed = Backbone(s2d=False, wpack=True)
        variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
        p = jax.jit(plain.apply)(variables, x)
        w = jax.jit(packed.apply)(variables, x)
        for a, b in zip(p, w):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)


def test_wpack_spans_match_plain():
    """Explicit spans: "stage1" (stage1 only) and "stage12" both match
    the plain backbone; a %4-but-not-%8 input silently falls back to the
    stage1-only span (stage2 packing needs input %8)."""
    rng = np.random.default_rng(5)
    for size, span in ((64, "stage1"), (64, "stage12"), (36, "stage12")):
        x = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
        plain = Backbone(s2d=True, wpack=False)
        packed = Backbone(s2d=True, wpack=span)
        variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
        p = jax.jit(plain.apply)(variables, x)
        w = jax.jit(packed.apply)(variables, x)
        for a, b in zip(p, w):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)


def test_predictor_s2d_wire_matches_planar():
    """The s2d wire upload path produces the same detections as the
    planar+device-transpose path (same model, same weights)."""
    import numpy as np

    from yolov4_tpu.config import load_config
    from yolov4_tpu.engine.predictor import Predictor
    from yolov4_tpu.models.yolov4 import init_variables
    from yolov4_tpu.models import build_model

    size, b = 64, 2
    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    cfg["TEST"].update(PRE_NMS_TOPK=128, MAX_DETS=20)
    variables = init_variables(build_model(cfg), jax.random.PRNGKey(0), size)

    p_wire = Predictor(cfg, variables=variables, img_size=size, batch_size=b,
                       conf_thre=0.01, nms_thre=0.5)
    assert p_wire._s2d_wire
    cfg2 = load_config()
    cfg2["MODEL"]["COMPUTE_DTYPE"] = "float32"
    cfg2["TEST"].update(PRE_NMS_TOPK=128, MAX_DETS=20, S2D_WIRE=False)
    p_plain = Predictor(cfg2, variables=variables, img_size=size,
                        batch_size=b, conf_thre=0.01, nms_thre=0.5)
    assert not p_plain._s2d_wire

    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (b, size, size, 3)).astype(np.uint8)
    dw, vw = p_wire(imgs)
    dp, vp = p_plain(imgs)
    np.testing.assert_array_equal(vw, vp)
    np.testing.assert_allclose(dw, dp, rtol=1e-5, atol=1e-4)
