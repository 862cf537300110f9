"""Numerical parity vs the reference PyTorch implementation.

These tests import the reference repo (read-only at /root/reference),
build its modules with random weights on CPU, convert the torch state_dict
through utils/torch_convert, and compare forward outputs elementwise.
They are skipped when the reference is not mounted; the rest of the suite
covers the same code paths with stored goldens / analytic checks.
"""

import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

if reference_available():
    sys.path.insert(0, REFERENCE_DIR)
    # the reference uses numpy aliases removed in numpy 2.0
    np.int = int
    np.alltrue = np.all

import jax.numpy as jnp  # noqa: E402


def _to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def _from_nhwc(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def _convert(tmod):
    from yolov4_tpu.utils.torch_convert import convert_state_dict
    conv = convert_state_dict({k: v.numpy() for k, v in tmod.state_dict().items()})
    variables = {"params": conv["params"]}
    if "batch_stats" in conv:
        variables["batch_stats"] = conv["batch_stats"]
    return variables


def _check_block(tmod, jmod, cin, size=16, atol=1e-5, batch=2):
    import torch
    tmod.eval()
    x = torch.randn(batch, cin, size, size)
    with torch.no_grad():
        ty = tmod(x).numpy()
    jy = _from_nhwc(jmod.apply(_convert(tmod), _to_nhwc(x), train=False))
    np.testing.assert_allclose(jy, ty, atol=atol, rtol=1e-4)


def test_conv_bn_act_parity():
    import torch
    from darknet.darknet import ConvBNAct as TConvBNAct
    from yolov4_tpu.models.layers import ConvBNAct
    torch.manual_seed(0)
    _check_block(TConvBNAct(3, 8, 3, 1, act="mish"), ConvBNAct(8, 3, 1, act="mish"), 3)
    _check_block(TConvBNAct(3, 8, 3, 2, act="leaky_relu"),
                 ConvBNAct(8, 3, 2, act="leaky_relu"), 3)
    _check_block(TConvBNAct(3, 8, 1, 1, bias=True, bn=False, act="linear"),
                 ConvBNAct(8, 1, 1, bias=True, bn=False, act="linear"), 3)
    _check_block(TConvBNAct(4, 8, 3, 1, act="relu"), ConvBNAct(8, 3, 1, act="relu"), 4)


def test_csp_blocks_parity():
    import torch
    from darknet.darknet import CSPDownSample0 as TCSP0, CSPDownSample as TCSP, ResBlock as TRes
    from yolov4_tpu.models.layers import CSPDownSample0, CSPDownSample, ResBlock
    torch.manual_seed(1)
    _check_block(TCSP0(8, 16, 3, 2, act="mish"), CSPDownSample0(16, 3, 2, act="mish"), 8)
    _check_block(TCSP(16, 32, 3, 2, num_blocks=2, act="mish"),
                 CSPDownSample(32, 3, 2, num_blocks=2, act="mish"), 16)
    _check_block(TRes(8, num_blocks=3, act="mish"), ResBlock(8, num_blocks=3, act="mish"), 8)


def test_spp_parity():
    import torch
    from yolo.model.yolov4 import SPPBlock as TSPP
    from yolov4_tpu.models.neck import SPPBlock
    torch.manual_seed(2)
    _check_block(TSPP(), SPPBlock(legacy_pools=True), 1024, size=8, batch=1, atol=5e-5)


def test_upsample_parity():
    import torch
    from yolo.model.yolov4 import Upsample as TUp
    from yolov4_tpu.models.neck import upsample2x_nearest
    x = torch.randn(2, 4, 5, 5)
    tup = TUp()
    tup.train()
    want_train = tup(x, (2, 4, 10, 10)).numpy()
    tup.eval()
    want_eval = tup(x, (2, 4, 10, 10)).numpy()
    got = _from_nhwc(upsample2x_nearest(_to_nhwc(x)))
    np.testing.assert_allclose(got, want_train, atol=1e-6)
    np.testing.assert_allclose(got, want_eval, atol=1e-6)


def test_decode_layer_parity():
    """YOLOLayer train/eval decode (reference yololayer.py:88-166)."""
    import torch
    from yolo.model.yololayer import YOLOLayer
    from yolov4_tpu.models.decode import decode_layer, masked_anchors

    cfg = {
        "ANCHORS": [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55],
                    [72, 146], [142, 110], [192, 243], [459, 401]],
        "ANCHOR_MASK": [[0, 1, 2], [3, 4, 5], [6, 7, 8]],
        "N_CLASSES": 80,
    }
    torch.manual_seed(3)
    for layer_no, fsize in [(0, 8), (1, 4), (2, 2)]:
        raw = torch.randn(2, 255, fsize, fsize)
        layer = YOLOLayer(cfg, layer_no=layer_no, device=None)

        layer.train()
        want = layer(raw.clone())
        raw_nhwc = _to_nhwc(raw)
        anc = jnp.asarray(masked_anchors(cfg["ANCHORS"], cfg["ANCHOR_MASK"], layer_no))
        got = decode_layer(raw_nhwc, anc, layer_no, training=True)
        np.testing.assert_allclose(np.asarray(got["output"]),
                                   want["output"].detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["pred"]),
                                   want["pred"].detach().numpy(), atol=1e-4, rtol=1e-5)

        layer.eval()
        want_eval = layer(raw.clone()).detach().numpy()
        got_eval = np.asarray(decode_layer(raw_nhwc, anc, layer_no, training=False))
        np.testing.assert_allclose(got_eval, want_eval, atol=1e-3, rtol=1e-5)


def _random_labels(rng, batch, k, n_valid, size, n_classes=80):
    labels = np.zeros((batch, k, 5), np.float32)
    for b in range(batch):
        n = n_valid[b]
        labels[b, :n, 0] = rng.uniform(5, size - 5, n)        # cx
        labels[b, :n, 1] = rng.uniform(5, size - 5, n)        # cy
        labels[b, :n, 2] = rng.uniform(2, size / 2, n)        # w
        labels[b, :n, 3] = rng.uniform(2, size / 2, n)        # h
        labels[b, :n, 4] = rng.integers(0, n_classes, n)
    return labels


def test_loss_parity(rng):
    """YOLOLoss vs reference on model-shaped random inputs (yololoss.py:94-443)."""
    import torch
    from yolo.model.yololayer import YOLOLayer
    from yolo.model.yololoss import YOLOLoss as TLoss
    from yolov4_tpu.models.decode import decode_layer, masked_anchors
    from yolov4_tpu.ops.loss import YOLOLoss

    cfg = {
        "ANCHORS": [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55],
                    [72, 146], [142, 110], [192, 243], [459, 401]],
        "ANCHOR_MASK": [[0, 1, 2], [3, 4, 5], [6, 7, 8]],
        "N_CLASSES": 80,
    }
    size = 64  # strides 8/16/32 -> fsize 8/4/2
    batch = 2
    torch.manual_seed(4)

    t_outputs, j_outputs = [], []
    for layer_no, fsize in [(0, 8), (1, 4), (2, 2)]:
        raw = torch.randn(batch, 255, fsize, fsize)
        layer = YOLOLayer(cfg, layer_no=layer_no, device=None)
        layer.train()
        t_outputs.append(layer(raw.clone()))
        anc = jnp.asarray(masked_anchors(cfg["ANCHORS"], cfg["ANCHOR_MASK"], layer_no))
        j_outputs.append(decode_layer(_to_nhwc(raw), anc, layer_no, training=True))

    # several label configurations incl. an image with zero labels
    for n_valid in ([3, 5], [0, 4], [60, 1]):
        labels = _random_labels(rng, batch, 60, n_valid, size)
        t_loss = TLoss(cfg, ignore_thresh=0.7, device=None)(
            [{k: (v.clone() if hasattr(v, "clone") else v) for k, v in o.items()}
             for o in t_outputs],
            {"padded_labels": torch.from_numpy(labels)},
        ).item()
        j_loss = float(YOLOLoss(cfg, ignore_thresh=0.7)(
            j_outputs, {"padded_labels": jnp.asarray(labels)}))
        np.testing.assert_allclose(j_loss, t_loss, rtol=2e-4)


@pytest.mark.slow
def test_full_model_parity():
    """Full YOLOv4 eval forward, converted reference weights, 64x64 input."""
    import torch
    from yolo.model.yolov4 import YOLOv4 as TYOLOv4
    from yolov4_tpu.config import load_config
    from yolov4_tpu.models import build_model

    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    cfg["MODEL"]["BACKBONE_PRETRAINED"] = None

    torch.manual_seed(5)
    tmodel = TYOLOv4(dict(cfg["MODEL"], BACKBONE_PRETRAINED=None), device=None)
    tmodel.eval()
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want = tmodel(x).numpy()

    jmodel = build_model(cfg)
    variables = _convert(tmodel)
    got = np.asarray(jmodel.apply(variables, _to_nhwc(x), train=False))
    assert got.shape == want.shape
    # boxes are in pixels (magnitude ~64), conf/cls in (0,1)
    np.testing.assert_allclose(got[..., :4], want[..., :4], atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got[..., 4:], want[..., 4:], atol=1e-5)
