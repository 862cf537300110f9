"""Model structure/shape tests (no reference needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.config import load_config
from yolov4_tpu.models import build_model
from yolov4_tpu.models.decode import decode_layer, masked_anchors
from yolov4_tpu.models.yolov4 import init_variables


@pytest.fixture(scope="module")
def small_model_and_vars():
    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), img_size=64)
    return model, variables


def test_eval_output_shape(small_model_and_vars):
    model, variables = small_model_and_vars
    x = jnp.zeros((2, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    # N = 3 * (8^2 + 4^2 + 2^2) = 252
    assert out.shape == (2, 252, 85)
    out_np = np.asarray(out)
    # obj/cls sigmoided into (0,1)
    assert (out_np[..., 4:] >= 0).all() and (out_np[..., 4:] <= 1).all()


def test_train_output_structure(small_model_and_vars):
    model, variables = small_model_and_vars
    x = jnp.zeros((2, 64, 64, 3))
    outs, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert isinstance(outs, list) and len(outs) == 3
    for layer_no, (o, f) in enumerate(zip(outs, (8, 4, 2))):
        assert o["layer_no"] == layer_no
        assert o["output"].shape == (2, 3, f, f, 85)
        assert o["pred"].shape == (2, 3, f, f, 4)
    assert "batch_stats" in mutated


def test_raw_head_outputs(small_model_and_vars):
    model, variables = small_model_and_vars
    x = jnp.zeros((1, 64, 64, 3))
    raws = model.apply(variables, x, train=False, decode=False)
    assert [r.shape for r in raws] == [
        (1, 8, 8, 255), (1, 4, 4, 255), (1, 2, 2, 255)]


def test_split_head_matches_fused(small_model_and_vars):
    """MODEL.SPLIT_HEAD (per-anchor output-conv slices + transpose-free
    decode) must produce the fused path's predictions exactly, from the
    same parameter tree."""
    model, variables = small_model_and_vars
    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    cfg["MODEL"]["SPLIT_HEAD"] = True
    split = build_model(cfg)
    shapes = jax.tree_util.tree_map(lambda a: a.shape, variables)
    assert shapes == jax.tree_util.tree_map(
        lambda a: a.shape,
        init_variables(split, jax.random.PRNGKey(0), img_size=64))

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    fused = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(split.apply(variables, x, train=False))
    np.testing.assert_array_equal(got, fused)
    # train path is byte-identical code (split applies at eval only)
    o0, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    o1, _ = split.apply(variables, x, train=True, mutable=["batch_stats"])
    for a, b in zip(o0, o1):
        np.testing.assert_array_equal(np.asarray(a["output"]),
                                      np.asarray(b["output"]))


def test_decode_grid_offsets():
    """Decoded xy at zero logits must be cell_center + 0.5 within each cell."""
    f = 4
    raw = jnp.zeros((1, f, f, 255))
    anc = jnp.asarray(masked_anchors([[12, 16]] * 9, [[0, 1, 2], [3, 4, 5], [6, 7, 8]], 0))
    out = np.asarray(decode_layer(raw, anc, 0, training=False))
    boxes = out[0, :, :4].reshape(3, f, f, 4)
    # sigmoid(0) = 0.5 -> bx = (0.5 + col) * stride
    for j in range(f):
        for i in range(f):
            np.testing.assert_allclose(boxes[0, j, i, 0], (0.5 + i) * 8, rtol=1e-6)
            np.testing.assert_allclose(boxes[0, j, i, 1], (0.5 + j) * 8, rtol=1e-6)
    # wh = exp(0) * anchor = anchor (in pixels after *stride)
    np.testing.assert_allclose(boxes[0, :, :, 2], 12.0, rtol=1e-6)
    np.testing.assert_allclose(boxes[0, :, :, 3], 16.0, rtol=1e-6)


def test_param_count_matches_reference_scale(small_model_and_vars):
    """Reference YOLOv4 has ~64M parameters; structural drift would move this."""
    _, variables = small_model_and_vars
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 60e6 < n_params < 68e6, n_params


def test_bf16_compute_path():
    cfg = load_config()
    assert cfg["MODEL"]["COMPUTE_DTYPE"] == "bfloat16"
    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), img_size=32)
    # params stay f32
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(variables["params"]))
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    # decode always promotes to f32 for box math
    assert out.dtype == jnp.float32


def test_maxpool_custom_vjp_matches_xla_gradient():
    """maxpool_same's hand-written backward (shifted equality masks; the
    select_and_scatter lowering it replaces cost 17% of the train step)
    must match XLA's native pooling gradient wherever ties don't occur —
    continuous random floats make ties impossible."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from yolov4_tpu.models.neck import maxpool_same

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 19, 19, 8)), jnp.float32)

    def ref_pool(x, size):
        pad = size // 2
        return nn.max_pool(x, (size, size), (1, 1), [(pad, pad), (pad, pad)])

    for size in (5, 9, 13):
        np.testing.assert_array_equal(
            np.asarray(maxpool_same(x, size)), np.asarray(ref_pool(x, size)))
        g_new = jax.grad(lambda v: (maxpool_same(v, size) ** 2).sum())(x)
        g_ref = jax.grad(lambda v: (ref_pool(v, size) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-6, atol=1e-6)


def test_maxpool_vjp_splits_ties_and_conserves_mass():
    """On exact ties the custom backward splits each window's gradient
    equally among its maxima (a valid subgradient): total gradient mass
    equals the number of windows for a sum-loss, even with heavy ties."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolov4_tpu.models.neck import maxpool_same

    x = jnp.ones((1, 7, 7, 2), jnp.float32)  # all-ties everywhere
    g = jax.grad(lambda v: maxpool_same(v, 5).sum())(x)
    # each of the 49*2 windows distributes exactly 1.0 of gradient in
    # total (the all-ties gradient without splitting would sum to
    # 49*2*window_elements instead)
    np.testing.assert_allclose(float(np.asarray(g).sum()), 7 * 7 * 2,
                               rtol=1e-6)
