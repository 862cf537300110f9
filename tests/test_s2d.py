"""Space-to-depth conv lowering: exact equivalence with the standard path.

The s2d modes rearrange the kernel, never the math — with identical params
the outputs must match the plain conv to float32 accumulation noise, for
every phase alignment and at the image borders (same-padding equivalence
is the subtle part: the zero block row covers exactly the rows the
original padding provides, and the never-tapped (A=-1, r=0) kernel slot
stays zero).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.models.layers import ConvBNAct
from yolov4_tpu.models.darknet import Backbone


def _compare(mode, stride, cin, cout, hw, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.float32)
    ref_m = ConvBNAct(cout, 3, stride, act="mish", s2d="none")
    new_m = ConvBNAct(cout, 3, stride, act="mish", s2d=mode)
    variables = ref_m.init(jax.random.PRNGKey(seed), x)
    ref = ref_m.apply(variables, x)
    new = new_m.apply(variables, x)  # same param tree by construction
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [8, 16, 32])
def test_stride1_equivalence(hw):
    _compare("stride1", 1, 3, 32, hw, 0)


@pytest.mark.parametrize("hw", [8, 16, 32])
def test_stride2_equivalence(hw):
    _compare("stride2", 2, 32, 64, hw, 1)


def test_stride2_equivalence_stage2_channels():
    _compare("stride2", 2, 64, 128, 16, 2)


def test_odd_size_fallback():
    """Odd spatial input routes through the standard conv, same params."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 15, 15, 3)), jnp.float32)
    ref_m = ConvBNAct(32, 3, 1, act="mish", s2d="none")
    new_m = ConvBNAct(32, 3, 1, act="mish", s2d="stride1")
    variables = ref_m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(new_m.apply(variables, x)),
                               np.asarray(ref_m.apply(variables, x)),
                               rtol=1e-5, atol=1e-5)


def test_backbone_s2d_matches_plain():
    """Full backbone with and without s2d lowering, shared params."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    plain = Backbone(s2d=False)
    fused = Backbone(s2d=True)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    p3, p4, p5 = jax.jit(plain.apply)(variables, x)
    f3, f4, f5 = jax.jit(fused.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(f3), np.asarray(p3), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f4), np.asarray(p4), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f5), np.asarray(p5), rtol=2e-4, atol=2e-4)


def test_backbone_s2d_param_trees_identical():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v_plain = jax.jit(Backbone(s2d=False).init)(jax.random.PRNGKey(0), x)
    v_fused = jax.jit(Backbone(s2d=True).init)(jax.random.PRNGKey(0), x)
    flat_p = jax.tree_util.tree_map(lambda a: a.shape, v_plain)
    flat_f = jax.tree_util.tree_map(lambda a: a.shape, v_fused)
    assert flat_p == flat_f


def test_s2d_gradients_match():
    """Training path: gradients through the lowering match the plain conv."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    ref_m = ConvBNAct(64, 3, 2, act="mish", s2d="none")
    new_m = ConvBNAct(64, 3, 2, act="mish", s2d="stride2")
    variables = ref_m.init(jax.random.PRNGKey(0), x)

    def loss(mod):
        def f(params):
            out, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return f

    g_ref = jax.grad(loss(ref_m))(variables["params"])
    g_new = jax.grad(loss(new_m))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
        g_ref, g_new)


def test_fused_keep_pre_chain_matches_plain():
    """stride1_keep -> stride2_pre chain (no reshuffle copies) vs the plain
    stem+downsample pair, shared params, eval mode."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    class Pair(ConvBNAct.__bases__[0]):  # nn.Module
        mode: str = "none"

        @__import__("flax").linen.compact
        def __call__(self, x, train=False):
            stem_map = {"none": "none", "fused": "stride1_keep"}
            base_map = {"none": "none", "fused": "stride2_pre"}
            x = ConvBNAct(32, 3, 1, act="mish",
                          s2d=stem_map[self.mode], name="stem")(x, train)
            return ConvBNAct(64, 3, 2, act="mish",
                             s2d=base_map[self.mode], name="base")(x, train)

    plain = Pair(mode="none")
    fused = Pair(mode="fused")
    variables = plain.init(jax.random.PRNGKey(0), x)
    # identical param trees by construction
    shapes_p = jax.tree_util.tree_map(lambda a: a.shape, variables)
    shapes_f = jax.tree_util.tree_map(
        lambda a: a.shape, fused.init(jax.random.PRNGKey(0), x))
    assert shapes_p == shapes_f
    ref = plain.apply(variables, x)
    got = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # train mode: outputs AND updated batch statistics must match (the
    # tiled BN reduces over phases — same element sets as full-res BN)
    ref_t, ref_vars = plain.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    got_t, got_vars = fused.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               rtol=2e-5, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        ref_vars["batch_stats"], got_vars["batch_stats"])


def test_fused_gradients_match_plain():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    from flax import linen as fnn

    class Pair(fnn.Module):
        mode: str = "none"

        @fnn.compact
        def __call__(self, x, train=False):
            stem_map = {"none": "none", "fused": "stride1_keep"}
            base_map = {"none": "none", "fused": "stride2_pre"}
            x = ConvBNAct(32, 3, 1, act="mish",
                          s2d=stem_map[self.mode], name="stem")(x, train)
            return ConvBNAct(64, 3, 2, act="mish",
                             s2d=base_map[self.mode], name="base")(x, train)

    plain, fused = Pair(mode="none"), Pair(mode="fused")
    variables = plain.init(jax.random.PRNGKey(1), x)

    def loss(mod):
        def f(params):
            out, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return f

    g_ref = jax.grad(loss(plain))(variables["params"])
    g_new = jax.grad(loss(fused))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4),
        g_ref, g_new)
