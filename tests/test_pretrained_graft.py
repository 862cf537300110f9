"""Classifier-checkpoint -> detector backbone graft (BACKBONE_PRETRAINED).

The pretrain app exists to produce backbone weights the detector consumes
(reference yolov4.py:295-302 strict-loads `backbone.*` from the darknet
checkpoint); this pins the native-checkpoint path of
utils/checkpoint.load_pretrained_backbone end to end: pretrainer save ->
detector init graft -> forward."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov4_tpu.config import load_config
from yolov4_tpu.models import build_model
from yolov4_tpu.models.yolov4 import init_variables
from yolov4_tpu.utils import checkpoint as ckpt_lib


def _detector_cfg():
    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, COMPUTE_DTYPE="float32",
                        BACKBONE_PRETRAINED=None)
    cfg["TRAIN"]["IMGSIZE"] = 64
    cfg["TEST"].update(IMGSIZE=64, PRE_NMS_TOPK=64, MAX_DETS=10)
    return cfg


@pytest.fixture(scope="module")
def classifier_ckpt(tmp_path_factory):
    """A saved classifier checkpoint at the detector's width/depth."""
    import jax.numpy as jnp
    from yolov4_tpu.models.darknet import CSPDarknet53

    out = str(tmp_path_factory.mktemp("cls_out"))
    model = CSPDarknet53(num_classes=10, dtype=jnp.float32, width=0.25,
                         depth=0.25)
    variables = jax.jit(
        lambda r, d: model.init({"params": r}, d, train=False))(
            jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3), jnp.float32))
    # perturb so grafted weights are distinguishable from any fresh init
    variables = jax.tree.map(lambda x: x + 0.25, variables)
    path = ckpt_lib.save_checkpoint(
        {"variables": variables, "opt_state": {},
         "meta": {"epoch": 3, "prec1": 50.0}},
        is_best=True, output_dir=out, meta={"epoch": 3})
    return path, variables


def test_graft_replaces_backbone_only(classifier_ckpt):
    path, cls_vars = classifier_ckpt
    cfg = _detector_cfg()
    model = build_model(cfg)
    fresh = init_variables(model, jax.random.PRNGKey(0), 64)
    grafted = ckpt_lib.load_pretrained_backbone(fresh, path)

    # backbone params == classifier backbone subtree, leaf for leaf
    for coll in ("params", "batch_stats"):
        got = jax.tree.leaves(grafted[coll]["backbone"])
        want = jax.tree.leaves(cls_vars[coll]["backbone"])
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # everything OUTSIDE the backbone is untouched
    for key in grafted["params"]:
        if key == "backbone":
            continue
        got = jax.tree.leaves(grafted["params"][key])
        want = jax.tree.leaves(fresh["params"][key])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # the grafted detector still runs
    out = model.apply(grafted, np.zeros((1, 64, 64, 3), np.float32),
                      train=False)
    assert np.asarray(out).shape[0] == 1


def test_graft_rejects_incompatible_shapes(classifier_ckpt, tmp_path):
    """A checkpoint at a different width must fail loudly, not load
    garbage (the reference strict-load would throw too)."""
    import jax.numpy as jnp
    from yolov4_tpu.models.darknet import CSPDarknet53

    model = CSPDarknet53(num_classes=10, dtype=jnp.float32, width=0.5,
                         depth=0.25)
    variables = jax.jit(
        lambda r, d: model.init({"params": r}, d, train=False))(
            jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32))
    path = ckpt_lib.save_checkpoint(
        {"variables": variables, "opt_state": {}, "meta": {}},
        is_best=False, output_dir=str(tmp_path), meta=None)

    cfg = _detector_cfg()
    fresh = init_variables(build_model(cfg), jax.random.PRNGKey(0), 64)
    with pytest.raises((ValueError, AssertionError)):
        ckpt_lib.load_pretrained_backbone(fresh, path)


def test_trainer_applies_backbone_pretrained(classifier_ckpt, tmp_path):
    """Trainer init honors MODEL.BACKBONE_PRETRAINED (reference
    main_amp.py config key) on the native-checkpoint path."""
    from tests.fixtures import make_fake_coco
    from yolov4_tpu.engine.trainer import Trainer

    path, cls_vars = classifier_ckpt
    root = str(tmp_path / "coco")
    make_fake_coco(root, "val2017", n_images=2, seed=0)

    cfg = _detector_cfg()
    cfg["MODEL"]["BACKBONE_PRETRAINED"] = path
    cfg["TRAIN"].update(OUTPUT_DIR=str(tmp_path / "out"))
    cfg["TEST"]["BATCH_SIZE"] = 2
    cfg["DATA"]["WORKERS"] = 0
    trainer = Trainer(cfg, root, evaluate_only=True)
    got = jax.tree.leaves(trainer.state.params["backbone"])
    want = jax.tree.leaves(cls_vars["params"]["backbone"])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
