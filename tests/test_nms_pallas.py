"""Pallas block-sequential NMS kernel: exact equality with the XLA path
(ops/nms.greedy_nms_mask) and the independent host greedy oracle.

Runs in interpret mode on CPU; on-chip equality at K=2048/B=16 and the
measured ~2x speedup are recorded in docs/PERF.md.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yolov4_tpu import native
from yolov4_tpu.ops.nms import greedy_nms_mask
from yolov4_tpu.ops.nms_pallas import greedy_nms_mask_pallas


def _case(seed, b, k, valid_p=0.85, spread=300.0, wh_hi=150.0):
    r = np.random.default_rng(seed)
    c = r.uniform(0, spread, (b, k, 2)).astype(np.float32)
    wh = r.uniform(15, wh_hi, (b, k, 2)).astype(np.float32)
    boxes = np.concatenate([c, c + wh], -1)
    valid = r.random((b, k)) < valid_p
    return boxes, valid


@pytest.mark.parametrize("block", [128, 256, 512])
def test_matches_xla_path(block):
    for seed in range(3):
        boxes, valid = _case(seed, 2, 1024)
        want = np.asarray(greedy_nms_mask(
            jnp.asarray(boxes), jnp.asarray(valid), 0.45))
        got = np.asarray(greedy_nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(valid), 0.45,
            block=block, interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"seed {seed}")


def test_matches_host_oracle_dense_chains():
    """Dense overlaps (deep suppression chains) vs the independent C/host
    greedy implementation."""
    boxes, valid = _case(11, 3, 512, valid_p=0.95, spread=150.0, wh_hi=200.0)
    got = np.asarray(greedy_nms_mask_pallas(
        jnp.asarray(boxes), jnp.asarray(valid), 0.4,
        block=128, interpret=True))
    for i in range(boxes.shape[0]):
        want = native.greedy_nms_host(boxes[i], valid[i], 0.4)
        np.testing.assert_array_equal(got[i], want, err_msg=f"batch {i}")


def test_batch_scratch_isolation():
    """The keep/tile scratch persists across grid steps — batch b's
    decisions must not leak into batch b+1 (stale-row regression test:
    an uninitialized tile once NaN-poisoned the first batch)."""
    boxes, valid = _case(5, 4, 256)
    got = np.asarray(greedy_nms_mask_pallas(
        jnp.asarray(boxes), jnp.asarray(valid), 0.5,
        block=128, interpret=True))
    for i in range(4):
        solo = np.asarray(greedy_nms_mask_pallas(
            jnp.asarray(boxes[i:i + 1]), jnp.asarray(valid[i:i + 1]), 0.5,
            block=128, interpret=True))
        np.testing.assert_array_equal(got[i], solo[0], err_msg=f"batch {i}")


def test_all_invalid_and_degenerate():
    boxes = np.zeros((1, 256, 4), np.float32)  # degenerate zero-area boxes
    valid = np.zeros((1, 256), bool)
    got = np.asarray(greedy_nms_mask_pallas(
        jnp.asarray(boxes), jnp.asarray(valid), 0.4,
        block=128, interpret=True))
    assert not got.any()
    valid[:, :10] = True
    got = np.asarray(greedy_nms_mask_pallas(
        jnp.asarray(boxes), jnp.asarray(valid), 0.4,
        block=128, interpret=True))
    want = np.asarray(greedy_nms_mask(
        jnp.asarray(boxes), jnp.asarray(valid), 0.4))
    np.testing.assert_array_equal(got, want)
