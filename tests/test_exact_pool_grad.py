"""MODEL.EXACT_POOL_GRAD: torch-exact max-pool tie gradients.

The default SPP max-pool backward (models/neck.maxpool_same) splits each
window's gradient equally among tied maxima (a valid subgradient chosen
for speed — docs/PARITY.md). torch's select_and_scatter /
max_pool2d_with_indices instead routes the WHOLE gradient to the FIRST
maximal position in row-major window order (reference: every
nn.MaxPool2d in yolo/model/yolov4.py:50-74 backwards through ATen).
``maxpool_same_exact`` reproduces that routing; these tests pin it
against torch itself on tie-heavy inputs.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from yolov4_tpu.models.neck import maxpool_same, maxpool_same_exact


def _torch_pool_grad(x_np: np.ndarray, g_np: np.ndarray, size: int):
    """Forward + input-gradient of torch MaxPool2d(size, 1, size//2).

    x_np, g_np: NHWC float32. Returns (y_nhwc, dx_nhwc)."""
    xt = torch.tensor(np.transpose(x_np, (0, 3, 1, 2)), requires_grad=True)
    yt = torch.nn.functional.max_pool2d(
        xt, kernel_size=size, stride=1, padding=size // 2)
    yt.backward(torch.tensor(np.transpose(g_np, (0, 3, 1, 2))))
    y = np.transpose(yt.detach().numpy(), (0, 2, 3, 1))
    dx = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))
    return y, dx


def _tie_heavy(rng, shape, levels=4):
    """Floats quantized to a few levels so tied window maxima are common."""
    return (rng.integers(0, levels, shape).astype(np.float32)
            / (levels - 1))


@pytest.mark.parametrize("size", [5, 9, 13])
def test_exact_pool_grad_matches_torch_on_ties(size):
    rng = np.random.default_rng(0)
    x = _tie_heavy(rng, (2, 13, 13, 8))
    g = rng.standard_normal((2, 13, 13, 8)).astype(np.float32)

    y_t, dx_t = _torch_pool_grad(x, g, size)

    fwd = lambda x_: jnp.vdot(maxpool_same_exact(x_, size), jnp.asarray(g))
    y_j = maxpool_same_exact(jnp.asarray(x), size)
    dx_j = jax.grad(fwd)(jnp.asarray(x))

    np.testing.assert_array_equal(np.asarray(y_j), y_t)
    np.testing.assert_array_equal(np.asarray(dx_j), dx_t)


def test_exact_pool_grad_matches_torch_continuous_input():
    # no ties: exact, default, and torch must all agree
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 19, 19, 16)).astype(np.float32)
    g = rng.standard_normal((1, 19, 19, 16)).astype(np.float32)
    _, dx_t = _torch_pool_grad(x, g, 5)
    dot = lambda pool: jax.grad(
        lambda x_: jnp.vdot(pool(x_, 5), jnp.asarray(g)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dot(maxpool_same_exact)), dx_t,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dot(maxpool_same)), dx_t,
                               rtol=1e-6, atol=1e-6)


def test_default_split_differs_but_conserves_mass_on_ties():
    # sanity that the test inputs actually exercise ties: the equal-split
    # default must DIFFER from torch per-element while total gradient
    # mass per window (and hence the sum) is conserved by both.
    rng = np.random.default_rng(2)
    x = np.ones((1, 9, 9, 1), np.float32)  # all tied
    g = rng.standard_normal((1, 9, 9, 1)).astype(np.float32)
    _, dx_t = _torch_pool_grad(x, g, 5)
    dx_split = np.asarray(jax.grad(
        lambda x_: jnp.vdot(maxpool_same(x_, 5), jnp.asarray(g)))(
        jnp.asarray(x)))
    dx_exact = np.asarray(jax.grad(
        lambda x_: jnp.vdot(maxpool_same_exact(x_, 5), jnp.asarray(g)))(
        jnp.asarray(x)))
    assert not np.allclose(dx_split, dx_t)
    np.testing.assert_array_equal(dx_exact, dx_t)
    np.testing.assert_allclose(dx_split.sum(), g.sum(), rtol=1e-5)
    np.testing.assert_allclose(dx_exact.sum(), g.sum(), rtol=1e-5)


def test_model_flag_plumbs_through_and_keeps_forward_identical():
    from yolov4_tpu.config import load_config
    from yolov4_tpu.models.yolov4 import build_model, init_variables

    cfg = load_config()
    cfg["MODEL"]["WIDTH"] = 0.25
    cfg["MODEL"]["DEPTH"] = 0.34
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    base = build_model(cfg)
    cfg["MODEL"]["EXACT_POOL_GRAD"] = True
    exact = build_model(cfg)
    assert exact.exact_pool_grad and not base.exact_pool_grad

    variables = init_variables(base, jax.random.PRNGKey(0), 64)
    x = jnp.asarray(np.random.default_rng(3)
                    .random((1, 64, 64, 3), np.float32))
    out_b = base.apply(variables, x, train=False)
    out_e = exact.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_e))
