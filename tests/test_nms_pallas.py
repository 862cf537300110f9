"""Pallas NMS kernel equivalence (interpret mode on CPU; the compiled
kernel is exercised on real TPU by bench/eval paths)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.ops.nms import greedy_nms_mask
from yolov4_tpu.ops.nms_pallas import greedy_nms_mask_pallas


@pytest.mark.parametrize("seed,k", [(0, 128), (1, 256)])
def test_pallas_matches_xla(seed, k):
    rng = np.random.default_rng(seed)
    b = 3
    tl = rng.uniform(0, 500, (b, k, 2))
    wh = rng.uniform(10, 150, (b, k, 2))
    boxes = jnp.asarray(np.concatenate([tl, tl + wh], -1).astype(np.float32))
    valid = jnp.asarray(rng.random((b, k)) > 0.15)
    want = np.asarray(greedy_nms_mask(boxes, valid, 0.45))
    got = np.asarray(greedy_nms_mask_pallas(boxes, valid, 0.45, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_chain_semantics():
    """A kills B; C overlaps only B -> C survives (greedy, not transitive)."""
    boxes = jnp.asarray(np.array([[
        [0, 0, 40, 40],
        [20, 0, 60, 40],    # IoU vs A = 1/3
        [40, 0, 80, 40],    # IoU vs B = 1/3, vs A = 0
    ] + [[1000 + 50 * i, 0, 1020 + 50 * i, 20] for i in range(125)]],
        np.float32))
    valid = jnp.ones((1, 128), bool)
    keep = np.asarray(greedy_nms_mask_pallas(boxes, valid, 0.3, interpret=True))
    assert keep[0, 0] and not keep[0, 1] and keep[0, 2]


def test_pallas_respects_valid_mask():
    boxes = jnp.asarray(
        np.tile(np.array([[0, 0, 10, 10]], np.float32), (1, 128, 1)))
    valid = jnp.zeros((1, 128), bool).at[0, 5].set(True)
    keep = np.asarray(greedy_nms_mask_pallas(boxes, valid, 0.5, interpret=True))
    # only the single valid (identical) box survives; invalid boxes neither
    # kept nor able to suppress
    assert keep[0, 5] and keep.sum() == 1
