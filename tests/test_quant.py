"""Int8 serving quantization (MODEL.QUANT "int8"; layers._quant_conv).

The quant path is an OPT-IN serving mode, not reference-exact: eval-time
convs in backbone stages 3-5 + neck + head hidden layers run s8xs8->s32
with BN folded, per-output-channel weight scales, and dynamic per-tensor
activation scales. These tests pin the mechanics:

  * single-layer quantization error is bounded by the scale quantum,
  * the parameter/batch-stat tree is byte-identical to the plain model
    (checkpoints shared),
  * the train path is untouched (bit-identical outputs + stats updates),
  * the full model runs and stays finite.

Accuracy on a TRAINED model is measured on hardware by
tools/overfit_smoke.py --quant-eval (random-init nets are too
ill-conditioned for meaningful end-to-end error bounds — BN-scale init
~N(0,0.01) underflows activations to exact zeros by stage 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.config import load_config
from yolov4_tpu.models import build_model
from yolov4_tpu.models.layers import ConvBNAct
from yolov4_tpu.models.yolov4 import init_variables


def _variables_for(module, x, rng=0):
    return module.init({"params": jax.random.PRNGKey(rng)}, x, train=False)


def _realistic_bn(variables, seed=1):
    """Replace BN params/stats with trained-model-like magnitudes."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    rng = np.random.default_rng(seed)
    for k in list(flat):
        if k[-1] == "scale":
            flat[k] = jnp.asarray(
                1.0 + 0.1 * rng.standard_normal(flat[k].shape), jnp.float32)
        elif k[-1] == "var":
            flat[k] = jnp.asarray(
                np.abs(1.0 + 0.2 * rng.standard_normal(flat[k].shape)) + 0.1,
                jnp.float32)
        elif k[-1] == "mean":
            flat[k] = jnp.asarray(
                0.1 * rng.standard_normal(flat[k].shape), jnp.float32)
    return flax.traverse_util.unflatten_dict(flat)


@pytest.mark.parametrize("ksize,stride", [(1, 1), (3, 1), (3, 2)])
def test_single_layer_error_bound(ksize, stride):
    """One quantized ConvBNAct stays within the quantization quantum of
    the plain layer: |err| <= sx*sw_c * K/2-ish per output element; we
    assert a conservative relative bound on well-scaled data."""
    rng = np.random.default_rng(0)
    ci, co, hw = 32, 48, 16
    x = jnp.asarray(rng.standard_normal((2, hw, hw, ci)), jnp.float32)

    plain = ConvBNAct(co, ksize, stride, act="leaky_relu")
    quant = ConvBNAct(co, ksize, stride, act="leaky_relu", quant=True)
    v = _realistic_bn(_variables_for(plain, x))

    yp = np.asarray(plain.apply(v, x, train=False), np.float32)
    yq = np.asarray(quant.apply(v, x, train=False), np.float32)
    # error relative to the layer's activation scale
    denom = max(np.abs(yp).max(), 1e-6)
    rel = np.abs(yp - yq).max() / denom
    assert rel < 0.05, rel
    # and well-correlated
    c = np.corrcoef(yp.ravel(), yq.ravel())[0, 1]
    assert c > 0.999, c


def test_param_tree_identical():
    cfgq = load_config()
    cfgq["MODEL"]["QUANT"] = "int8"
    cfgq["MODEL"].update(WIDTH=0.25, DEPTH=0.25)
    cfgp = load_config()
    cfgp["MODEL"].update(WIDTH=0.25, DEPTH=0.25)
    mq, mp = build_model(cfgq), build_model(cfgp)
    vq = init_variables(mq, jax.random.PRNGKey(0), 64)
    vp = init_variables(mp, jax.random.PRNGKey(0), 64)
    eq = jax.tree.map(lambda a, b: bool((a == b).all()), vq, vp)
    assert all(jax.tree.leaves(eq))


def test_train_path_untouched():
    """QUANT int8 must not change training numerics: same loss-relevant
    outputs and same batch-stat updates, bit for bit."""
    cfgq = load_config()
    cfgq["MODEL"]["QUANT"] = "int8"
    cfgq["MODEL"].update(WIDTH=0.25, DEPTH=0.25)
    cfgp = load_config()
    cfgp["MODEL"].update(WIDTH=0.25, DEPTH=0.25)
    mq, mp = build_model(cfgq), build_model(cfgp)
    v = init_variables(mp, jax.random.PRNGKey(0), 64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)

    oq, sq = mq.apply(v, x, train=True, mutable=["batch_stats"])
    op, sp = mp.apply(v, x, train=True, mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(oq), jax.tree.leaves(op)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(sq), jax.tree.leaves(sp)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_static_scales_match_dynamic_on_calibration_batch():
    """Scales recorded from batch X (mutable=['quant'] calibration) make
    the int8_static layer reproduce the dynamic int8 layer bit-for-bit on
    X — the static path's correctness reduces to the dynamic path's."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    dyn = ConvBNAct(48, 3, 1, act="leaky_relu", quant="int8")
    sta = ConvBNAct(48, 3, 1, act="leaky_relu", quant="int8_static")
    v = _realistic_bn(_variables_for(dyn, x))

    y_dyn = np.asarray(dyn.apply(v, x, train=False))
    # calibration pass records the abs-max into the "quant" collection
    _, upd = dyn.apply(v, x, train=False, mutable=["quant"])
    amax = float(jax.tree.leaves(upd["quant"])[0])
    assert amax == float(jnp.max(jnp.abs(x)))
    y_sta = np.asarray(sta.apply({**v, **upd}, x, train=False))
    assert np.array_equal(y_dyn, y_sta)


def test_predictor_auto_calibration():
    """int8_static Predictor calibrates on its first batch and serves;
    detections agree with the dynamic-int8 Predictor on that batch.

    Agreement, not equality: the calibration program and the serving
    program are separate XLA compilations, whose conv reduction orders
    may differ by ulps on CPU — the recorded scales then sit an ulp off
    the dynamic ones and near-tied low-rank detections can swap. The
    bit-exact static==dynamic property is pinned at layer level
    (test_static_scales_match_dynamic_on_calibration_batch), where one
    traced computation feeds both."""
    from yolov4_tpu.engine.predictor import Predictor

    def make(quant):
        cfg = load_config()
        cfg["MODEL"].update(QUANT=quant, WIDTH=0.25, DEPTH=0.25)
        cfg["TEST"].update(IMGSIZE=64, PRE_NMS_TOPK=64, MAX_DETS=10)
        return cfg

    rng = np.random.default_rng(0)
    imgs = rng.random((2, 64, 64, 3)).astype(np.float32)

    base = build_model(make("none"))
    v = init_variables(base, jax.random.PRNGKey(0), 64)
    v = _realistic_bn(v, seed=2)

    pd = Predictor(make("int8"), variables=v, img_size=64, batch_size=2)
    ps = Predictor(make("int8_static"), variables=v, img_size=64,
                   batch_size=2)
    det_d, val_d = pd(imgs)
    det_s, val_s = ps(imgs)  # auto-calibrates on this batch
    assert ps._quant_ready
    assert "quant" in ps.variables
    assert val_d.sum() == val_s.sum()
    # the confident head of each image's detections agrees
    for b in range(det_d.shape[0]):
        np.testing.assert_allclose(det_s[b, :3], det_d[b, :3], atol=1e-2)


def test_static_recalibrates_after_variables_reassignment():
    """Trainer.evaluate() reassigns predictor.variables with fresh train
    state (no "quant" collection) before EVERY validation; an int8_static
    predictor must then re-calibrate on its next batch instead of
    dispatching with a sticky ready flag and no scales (flax would raise
    on the immutable "quant" collection) or with scales describing the
    previous epoch's weights."""
    from yolov4_tpu.engine.predictor import Predictor

    cfg = load_config()
    cfg["MODEL"].update(QUANT="int8_static", WIDTH=0.25, DEPTH=0.25)
    cfg["TEST"].update(IMGSIZE=64, PRE_NMS_TOPK=64, MAX_DETS=10)

    base = build_model(dict(cfg, MODEL={**cfg["MODEL"], "QUANT": "none"}))
    v = _realistic_bn(init_variables(base, jax.random.PRNGKey(0), 64))

    pred = Predictor(cfg, variables=v, img_size=64, batch_size=2)
    imgs = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    pred(imgs)  # auto-calibrates
    assert pred._quant_ready and "quant" in pred.variables
    scale0 = float(jax.tree.leaves(pred.variables["quant"])[0])

    # epoch boundary: fresh (here: perturbed) train state, no quant
    v2 = jax.tree.map(lambda x: x * 1.5, v)
    pred.variables = {"params": v2["params"],
                      "batch_stats": v2["batch_stats"]}
    assert not pred._quant_ready
    det, valid = pred(imgs)  # must re-calibrate, not crash
    assert pred._quant_ready and "quant" in pred.variables
    scale1 = float(jax.tree.leaves(pred.variables["quant"])[0])
    assert scale1 != scale0, "scales must describe the NEW weights"
    # (box values themselves are garbage — a 1.5x-scaled random net
    # overflows exp(wh) — the contract under test is the recalibration)
    assert det.shape == (2, 10, 7) and valid.shape == (2, 10)


def _span_cfg(wpack, quant, span):
    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.5, DEPTH=0.5, WPACK=wpack, QUANT=quant,
                        QUANT_SPAN=span)
    return cfg


def test_caller_calibration_is_kept():
    """A fresh Predictor built from variables that already CARRY a
    calibrated "quant" collection (e.g. captured from a previously
    calibrated predictor for deployment) must serve with those scales —
    not silently strip them and auto-recalibrate on whatever single live
    batch arrives first."""
    from yolov4_tpu.engine.predictor import Predictor

    cfg = load_config()
    cfg["MODEL"].update(QUANT="int8_static", WIDTH=0.25, DEPTH=0.25)
    cfg["TEST"].update(IMGSIZE=64, PRE_NMS_TOPK=64, MAX_DETS=10)

    base = build_model(dict(cfg, MODEL={**cfg["MODEL"], "QUANT": "none"}))
    v = _realistic_bn(init_variables(base, jax.random.PRNGKey(0), 64))
    pred = Predictor(cfg, variables=v, img_size=64, batch_size=2)
    rep = np.random.default_rng(1).random((2, 64, 64, 3)).astype(np.float32)
    pred.calibrate(rep)  # deliberate, representative calibration
    calibrated = pred.variables

    # ...but the compile-only SEED scales warmup() records before
    # calibration are never published via .variables, so a predictor
    # rebuilt from a warmed-but-uncalibrated predictor's variables still
    # auto-calibrates (degenerate zero-image scales must never be
    # mistaken for calibration)
    seed_pred = Predictor(cfg, variables=v, img_size=64, batch_size=2)
    seed_pred.warmup(dtype=np.float32)
    assert "quant" not in seed_pred.variables
    assert seed_pred._quant_seed is not None
    assert not seed_pred._quant_ready
    pred_from_seed = Predictor(cfg, variables=seed_pred.variables,
                               img_size=64, batch_size=2)
    assert not pred_from_seed._quant_ready, \
        "zero-seed scales must not be served as calibration"

    pred2 = Predictor(cfg, variables=calibrated, img_size=64, batch_size=2)
    assert pred2._quant_ready and "quant" in pred2.variables
    other = np.random.default_rng(2).random((2, 64, 64, 3)).astype(np.float32)
    det, valid = pred2(other)  # must NOT recalibrate on this batch
    s_kept = jax.tree.leaves(pred2.variables["quant"])
    s_orig = jax.tree.leaves(calibrated["quant"])
    for a, b in zip(s_kept, s_orig):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the two predictors agree bit-for-bit on the same input
    det1, valid1 = pred(other)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det1))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid1))


def test_full_span_quantizes_stage12():
    """QUANT_SPAN 'full' must actually add int8 conv sites for
    stage1/stage2 over 'late' (guards against the span knob silently
    doing nothing): counted as i8 mentions in the lowered HLO."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    base = build_model(_span_cfg(False, "none", "late"))
    v = init_variables(base, jax.random.PRNGKey(0), 64)

    def i8_sites(cfg):
        m = build_model(cfg)
        txt = jax.jit(
            lambda vv, xx: m.apply(vv, xx, train=False)).lower(v, x).as_text()
        # StableHLO spells the dtype inside tensor types: "tensor<...xi8>"
        return txt.count("xi8>") + txt.count("<i8>")

    none = i8_sites(_span_cfg(False, "none", "full"))
    late = i8_sites(_span_cfg(False, "int8", "late"))
    full = i8_sites(_span_cfg(False, "int8", "full"))
    full_packed = i8_sites(_span_cfg("stage12", "int8", "full"))
    assert none == 0
    assert full > late > 0
    assert full_packed > late


def _wpack(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def _wunpack(x):
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


@pytest.mark.parametrize("ksize", [1, 3])
def test_wpack_quant_layer_bit_identical(ksize):
    """Lane-packed int8 layer == unpacked int8 layer BITWISE on the same
    values: BN folds into the original kernel before rearrangement
    (per-packed-channel scales equal the original scales tiled), the
    per-tensor activation abs-max is an exact reduction over the same
    element set, integer accumulation is exact over the extra zero
    blocks, and the f32 dequant arithmetic is elementwise identical.

    Pinned at LAYER level deliberately: at model level the surrounding
    bf16 convs are separate XLA programs whose reduction orders differ
    by ulps, and a bf16 ulp (~0.4% rel) legitimately flips int8 rounding
    decisions downstream (same reason test_predictor_auto_calibration
    asserts agreement, not equality)."""
    from yolov4_tpu.models.layers import _WPackConvBN

    rng = np.random.default_rng(0)
    ci, co, hw = 32, 32, 12
    x = jnp.asarray(rng.standard_normal((2, hw, hw, ci)), jnp.float32)
    plain = ConvBNAct(co, ksize, 1, act="mish", quant="int8")
    packed = _WPackConvBN(ci, co, ksize, act="mish", quant="int8")
    v = _realistic_bn(_variables_for(plain, x))
    yu = np.asarray(plain.apply(v, x, train=False))
    yp = np.asarray(packed.apply(v, _wpack(x), train=False))
    np.testing.assert_array_equal(_wunpack(yp), yu)


def test_wpack_quant_concat_layer_bit_identical():
    """The transition conv's concat form: _WPackConvBN(concat_ca) on
    concat([A_packed, B_packed]) == plain 1x1 int8 on concat([A, B]),
    bitwise (same exact-arithmetic argument as above)."""
    from yolov4_tpu.models.layers import _WPackConvBN

    rng = np.random.default_rng(2)
    ca, cb, co, hw = 32, 16, 48, 12
    a = jnp.asarray(rng.standard_normal((2, hw, hw, ca)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, hw, hw, cb)), jnp.float32)
    xu = jnp.concatenate([a, b], axis=-1)
    xp = jnp.concatenate([_wpack(a), _wpack(b)], axis=-1)
    plain = ConvBNAct(co, 1, 1, act="mish", quant="int8")
    packed = _WPackConvBN(ca + cb, co, 1, act="mish", quant="int8",
                          concat_ca=ca)
    v = _realistic_bn(_variables_for(plain, xu))
    yu = np.asarray(plain.apply(v, xu, train=False))
    yp = np.asarray(packed.apply(v, xp, train=False))
    np.testing.assert_array_equal(_wunpack(yp), yu)


def test_wpack_static_matches_dynamic_layer():
    """Packed int8_static with scales calibrated on batch X reproduces
    packed dynamic int8 on X bit-for-bit (the packed twin of
    test_static_scales_match_dynamic_on_calibration_batch)."""
    from yolov4_tpu.models.layers import _WPackConvBN

    rng = np.random.default_rng(1)
    ci, co, hw = 32, 32, 12
    xp = _wpack(jnp.asarray(rng.standard_normal((2, hw, hw, ci)),
                            jnp.float32))
    dyn = _WPackConvBN(ci, co, 3, act="mish", quant="int8")
    sta = _WPackConvBN(ci, co, 3, act="mish", quant="int8_static")
    v = _realistic_bn(dyn.init({"params": jax.random.PRNGKey(0)}, xp,
                               train=False))
    y_dyn = np.asarray(dyn.apply(v, xp, train=False))
    _, upd = dyn.apply(v, xp, train=False, mutable=["quant"])
    assert jax.tree.leaves(upd["quant"])
    y_sta = np.asarray(sta.apply({**v, **upd}, xp, train=False))
    np.testing.assert_array_equal(y_dyn, y_sta)


def test_wpack_int8_model_agrees_with_unpacked():
    """Full-span packed vs unpacked int8 at MODEL level: agreement, not
    equality (bf16 cross-program ulps flip int8 roundings — see the
    layer-level tests for the bitwise pin). Guards the stage wiring:
    a bias-tiling or scale-layout bug would corrupt scores massively."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    mu = build_model(_span_cfg(False, "int8", "full"))
    mp = build_model(_span_cfg("stage12", "int8", "full"))
    v = _realistic_bn(init_variables(mu, jax.random.PRNGKey(0), 64))
    yu = np.asarray(mu.apply(v, x, train=False), np.float32)
    yp = np.asarray(mp.apply(v, x, train=False), np.float32)
    # sigmoid-space scores (obj + classes) agree tightly
    np.testing.assert_allclose(yu[..., 4:], yp[..., 4:], atol=0.05)
    # box geometry: bulk agreement (exp(wh) amplifies rounding flips on
    # a random-init net, so pin the median, not the max)
    assert np.median(np.abs(yu[..., :4] - yp[..., :4])) < 0.5
    assert np.corrcoef(yu.ravel(), yp.ravel())[0, 1] > 0.999


def test_full_span_train_path_untouched():
    """Full-span quant must leave training numerics alone, packed and
    unpacked alike (stage1/2 quant branches are eval-only): each quant
    model's train outputs are BIT-identical to the same-layout non-quant
    model's (packed-vs-unpacked train equivalence itself is covered at
    its own tolerance by tests/test_wpack.py)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    v = init_variables(build_model(_span_cfg(False, "none", "late")),
                       jax.random.PRNGKey(0), 64)
    for wpack in (False, "stage12"):
        mb = build_model(_span_cfg(wpack, "none", "late"))
        mq = build_model(_span_cfg(wpack, "int8", "full"))
        ob, sb = mb.apply(v, x, train=True, mutable=["batch_stats"])
        oq, sq = mq.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(jax.tree.leaves(oq), jax.tree.leaves(ob)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(sq), jax.tree.leaves(sb)):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_full_model_runs_finite():
    """Quantized eval forward runs end to end and stays finite (with
    conditioned BN stats; random-scale nets can legitimately overflow)."""
    cfg = load_config()
    cfg["MODEL"]["QUANT"] = "int8"
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25)
    model = build_model(cfg)
    v = init_variables(model, jax.random.PRNGKey(0), 64)
    # leave init BN (tiny activations) — checks the all-zero edge case
    # does not produce NaNs through the dynamic scales
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                    jnp.float32)
    out = np.asarray(model.apply(v, x, train=False), np.float32)
    assert out.shape[0] == 2 and out.shape[-1] == 85
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# Direct-u8 int8 stem (QUANT_SPAN "full"): the stem consumes uint8 wire
# bytes as SHIFTED s8 activations — conv(x_u8/255, wq*sw) ==
# (sw/255)*(conv(x_u8-128, wq) + 128*sum(wq)) exactly, with the conv's
# zero padding represented as -128 in the shifted domain. Activation
# quantization is therefore EXACT (uint8 pixels are 8-bit values); only
# the weights are quantized, like every other int8 layer.
# ---------------------------------------------------------------------------


def _stem_pair(dtype=jnp.float32):
    from yolov4_tpu.models.layers import space_to_depth

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    x_s2d = jnp.asarray(space_to_depth(jnp.asarray(img)))
    quant = ConvBNAct(32, 3, 1, act="mish", dtype=dtype,
                      s2d="stride1_keep", quant="int8")
    plain = ConvBNAct(32, 3, 1, act="mish", dtype=dtype,
                      s2d="stride1_keep", quant="none")
    v = _realistic_bn(plain.init(
        {"params": jax.random.PRNGKey(3)}, jnp.zeros_like(x_s2d, jnp.float32),
        train=False, input_s2d=True))
    return img, x_s2d, quant, plain, v


def test_u8_stem_exact_integer_identity():
    """The u8 stem equals the f32 conv with the SAME quantized kernel:
    activation quantization contributes NO error (the only difference vs
    an f32 reference with quantized weights is f32 rounding)."""
    from yolov4_tpu.models.layers import (_BNFold, _ConvKernel,
                                          _quant_weights_folded,
                                          _s2d_stride1_kernel)

    img, x_s2d, quant, plain, v = _stem_pair()
    y_u8 = np.asarray(quant.apply(v, x_s2d, train=False, input_s2d=True),
                      np.float32)

    # reference: f32 conv on the normalized image with the folded,
    # quantized-then-dequantized kernel
    kernel = np.asarray(v["params"]["conv"]["kernel"], np.float32)
    scale = np.asarray(v["params"]["norm"]["scale"], np.float32)
    bias = np.asarray(v["params"]["norm"]["bias"], np.float32)
    mean = np.asarray(v["batch_stats"]["norm"]["mean"], np.float32)
    var = np.asarray(v["batch_stats"]["norm"]["var"], np.float32)
    s = scale / np.sqrt(var + 1e-5)
    b = bias - mean * s
    wf = _s2d_stride1_kernel(jnp.asarray(kernel * s))
    wq, sw = _quant_weights_folded(wf)
    wdq = jnp.asarray(wq, jnp.float32) * sw
    xf = jnp.asarray(np.asarray(x_s2d, np.float32) / 255.0)
    y = jax.lax.conv_general_dilated(
        xf, wdq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(y + np.tile(b, 4), np.float32)
    ref = ref * np.tanh(np.log1p(np.exp(ref)))  # mish
    np.testing.assert_allclose(y_u8, ref, rtol=2e-4, atol=2e-5)


def test_u8_stem_error_bounded_vs_plain():
    """Weight quantization is the only approximation: the u8 stem tracks
    the unquantized bf16 stem within the usual int8 layer bound."""
    img, x_s2d, quant, plain, v = _stem_pair(jnp.bfloat16)
    y_q = np.asarray(quant.apply(v, x_s2d, train=False, input_s2d=True),
                     np.float32)
    xf = jnp.asarray(np.asarray(x_s2d, np.float32) / 255.0)
    y_p = np.asarray(plain.apply(v, xf, train=False, input_s2d=True),
                     np.float32)
    rel = np.abs(y_q - y_p).max() / max(np.abs(y_p).max(), 1e-6)
    assert rel < 0.05, rel
    assert np.corrcoef(y_q.ravel(), y_p.ravel())[0, 1] > 0.999


def test_u8_stem_static_matches_dynamic():
    """Calibrated (int8_static) stem == dynamic int8 stem bit-for-bit
    (the stored wq/sw equal the on-the-fly ones; no activation scale is
    involved at all — u8 input is exact)."""
    img, x_s2d, quant, plain, v = _stem_pair()
    sta = ConvBNAct(32, 3, 1, act="mish", dtype=jnp.float32,
                    s2d="stride1_keep", quant="int8_static")
    y_dyn = np.asarray(quant.apply(v, x_s2d, train=False, input_s2d=True))
    _, upd = quant.apply(v, x_s2d, train=False, input_s2d=True,
                         mutable=["quant"])
    y_sta = np.asarray(sta.apply({**v, **upd}, x_s2d, train=False,
                                 input_s2d=True))
    assert np.array_equal(y_dyn, y_sta)


def test_u8_stem_wire_layouts_bit_identical():
    """NHWC uint8 input (planar wire) and s2d-wire uint8 input lower to
    the same integer program: outputs are bit-identical."""
    from yolov4_tpu.models.layers import space_to_depth

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    cfg = _span_cfg(False, "int8", "full")
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, QUANT_STEM=True)
    m = build_model(cfg)
    v = init_variables(m, jax.random.PRNGKey(0), 64)
    x_s2d = jnp.asarray(space_to_depth(jnp.asarray(img)))
    out_s2d = np.asarray(
        m.apply(v, x_s2d, train=False, input_s2d=True), np.float32)
    out_nhwc = np.asarray(
        m.apply(v, jnp.asarray(img), train=False), np.float32)
    assert np.array_equal(out_s2d, out_nhwc)


def test_u8_model_agrees_with_f32_input():
    """Full int8/full-span model on uint8 input (quantized stem) agrees
    with the same model on the normalized f32 input (bf16 stem): the only
    difference is the stem's weight quantization."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    cfg = _span_cfg(False, "int8", "full")
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, QUANT_STEM=True)
    m = build_model(cfg)
    v = init_variables(m, jax.random.PRNGKey(0), 64)
    v = _realistic_bn(v)
    out_u8 = np.asarray(m.apply(v, jnp.asarray(img), train=False),
                        np.float32)
    out_f32 = np.asarray(
        m.apply(v, jnp.asarray(img.astype(np.float32) / 255.0),
                train=False), np.float32)
    assert np.isfinite(out_u8).all()
    assert np.corrcoef(out_u8.ravel(), out_f32.ravel())[0, 1] > 0.99


def test_u8_input_on_nonquant_model_normalizes():
    """uint8 input through a NON-quantized model must behave exactly as a
    pre-normalized f32 input (the backbone normalizes at entry) — guards
    the fallback that keeps u8 wire packing always safe."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25)
    m = build_model(cfg)
    v = init_variables(m, jax.random.PRNGKey(0), 64)
    out_u8 = np.asarray(m.apply(v, jnp.asarray(img), train=False),
                        np.float32)
    out_f32 = np.asarray(
        m.apply(v, jnp.asarray(img.astype(np.float32) / 255.0),
                train=False), np.float32)
    assert np.array_equal(out_u8, out_f32)


def test_quant_chain_bit_identical():
    """int8_static link chaining (MODEL.QUANT_CHAIN) == the unchained
    program bit-for-bit, packed and unpacked: the links only move WHERE
    the quantize happens (producer epilogue vs consumer input) — same
    tensor, same calibrated scale, same arithmetic. The chained program
    must also carry MORE quant variables (the link scales)."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)

    def run(chain, wpack):
        cfg = _span_cfg(wpack, "int8_static", "full")
        cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, QUANT_CHAIN=chain)
        m = build_model(cfg)
        v = init_variables(m, jax.random.PRNGKey(0), 64)
        v = _realistic_bn({k: t for k, t in v.items() if k != "quant"})
        _, upd = m.apply(v, img, train=False, mutable=["quant"])
        out = m.apply({**v, **upd}, img, train=False)
        return np.asarray(out, np.float32), upd

    for wpack in (False, "stage12"):
        a, qa = run(True, wpack)
        b, qb = run(False, wpack)
        assert np.array_equal(a, b), (wpack, np.max(np.abs(a - b)))
        assert len(jax.tree.leaves(qa)) > len(jax.tree.leaves(qb))


def test_u8_stem_float_calibration_then_u8_dispatch():
    """Calibrating a QUANT_STEM predictor with FLOAT images must still
    record the stem's quant variables: the float path keeps the bf16
    stem, so without the predictor-side u8 conversion the next uint8
    dispatch would hit the immutable quant collection missing the stem's
    wq/sw/amax (crash found in review)."""
    from yolov4_tpu.engine.predictor import Predictor

    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, QUANT="int8_static",
                        QUANT_SPAN="full", QUANT_STEM=True)
    cfg["TEST"]["IMGSIZE"] = 64
    pred = Predictor(cfg, batch_size=1)
    rng = np.random.default_rng(0)
    pred.calibrate(rng.random((1, 64, 64, 3)).astype(np.float32))
    dets, n_valid = pred(
        (rng.random((1, 64, 64, 3)) * 255).astype(np.uint8))
    assert np.all(np.isfinite(np.asarray(dets, np.float32)))


def test_chained_qtensor_survives_bf16_fallback():
    """A chained QTensor reaching a bf16-only conv form (the odd-size
    "stride2" guard) must dequantize and continue, not crash: unfused s2d
    + full span + chaining + odd input exercises exactly that fallback
    (AttributeError found in review)."""
    from yolov4_tpu.models.darknet import Backbone

    m = Backbone(s2d="unfused", quant="int8_static", quant_span="full",
                 quant_chain=True, wpack=False)
    x = jnp.asarray(np.random.default_rng(0).random((1, 65, 65, 3)),
                    jnp.float32)
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, train=False))()
    _, upd = m.apply(v, x, train=False, mutable=["quant"])
    outs = m.apply({**{k: t for k, t in v.items() if k != "quant"},
                    "quant": upd["quant"]}, x, train=False)
    assert [tuple(o.shape) for o in outs] == [
        (1, 9, 9, 256), (1, 5, 5, 512), (1, 3, 3, 1024)]
    assert all(np.all(np.isfinite(np.asarray(o, np.float32))) for o in outs)
