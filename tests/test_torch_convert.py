"""Torch<->JAX converter tests: key mapping and full roundtrips."""

import numpy as np
import pytest

from yolov4_tpu.utils.torch_convert import (convert_state_dict,
                                            export_state_dict,
                                            flax_path_to_torch_key,
                                            torch_key_to_path)


@pytest.mark.parametrize("torch_key,collection,path", [
    ("backbone.stem.conv.weight", "params",
     ("backbone", "stem", "conv", "kernel")),
    ("backbone.stem.norm.weight", "params",
     ("backbone", "stem", "norm", "scale")),
    ("backbone.stem.norm.running_mean", "batch_stats",
     ("backbone", "stem", "norm", "mean")),
    ("backbone.stage2.part2.1.module_list.0.0.conv.weight", "params",
     ("backbone", "stage2", "part2_1", "module_list_0_0", "conv", "kernel")),
    ("neck.spp.conv1.0.conv.weight", "params",
     ("neck", "spp", "conv1_0", "conv", "kernel")),
    ("head.yolo1.1.conv.bias", "params",
     ("head", "yolo1_1", "conv", "bias")),
    ("module.backbone.stem.conv.weight", "params",
     ("backbone", "stem", "conv", "kernel")),  # DDP prefix stripped
    ("classifier.weight", "params", ("classifier", "kernel")),
])
def test_forward_key_mapping(torch_key, collection, path):
    got_coll, got_path = torch_key_to_path(torch_key)
    assert (got_coll, got_path) == (collection, path)


def test_num_batches_tracked_dropped():
    coll, _ = torch_key_to_path("backbone.stem.norm.num_batches_tracked")
    assert coll == ""


@pytest.mark.parametrize("collection,path,torch_key", [
    ("params", ("backbone", "stage1", "part2_1_1", "conv", "kernel"),
     "backbone.stage1.part2_1_1.conv.weight"),
    ("params", ("backbone", "stage1", "part2_1_2_0", "norm", "scale"),
     "backbone.stage1.part2_1_2.0.norm.weight"),
    ("params", ("backbone", "stage1", "part2_2", "conv", "kernel"),
     "backbone.stage1.part2_2.conv.weight"),
    ("params", ("backbone", "stage2", "part2_2", "conv", "kernel"),
     "backbone.stage2.part2.2.conv.weight"),  # Sequential outside stage1
    ("params", ("backbone", "stage2", "part2_1", "module_list_1_0", "conv",
                "kernel"),
     "backbone.stage2.part2.1.module_list.1.0.conv.weight"),
    ("batch_stats", ("neck", "fpn", "module2_3", "norm", "var"),
     "neck.fpn.module2.3.norm.running_var"),
])
def test_reverse_key_mapping(collection, path, torch_key):
    assert flax_path_to_torch_key(collection, path) == torch_key


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


@pytest.mark.parametrize("model_kind", ["detector", "classifier"])
def test_full_roundtrip(model_kind):
    """export -> convert recovers the exact variable tree for real models."""
    import jax
    from yolov4_tpu.config import load_config
    from yolov4_tpu.models import CSPDarknet53, build_model
    from yolov4_tpu.models.yolov4 import init_variables

    if model_kind == "detector":
        cfg = load_config()
        cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
        model = build_model(cfg)
    else:
        model = CSPDarknet53(num_classes=10)
    variables = init_variables(model, jax.random.PRNGKey(0), 64)

    sd = export_state_dict(variables)
    back = convert_state_dict(sd)

    want = {("params",) + k: v for k, v in _flatten(variables["params"]).items()}
    want.update({("batch_stats",) + k: v
                 for k, v in _flatten(variables["batch_stats"]).items()})
    got = {("params",) + k: v for k, v in _flatten(back["params"]).items()}
    got.update({("batch_stats",) + k: v
                for k, v in _flatten(back["batch_stats"]).items()})

    assert set(got) == set(want)
    for key in want:
        np.testing.assert_array_equal(got[key], want[key], err_msg=str(key))


def test_check_compatible_rejects_collections_both_directions():
    """Strict load fails with a NAMED error for collections the checkpoint
    is missing AND for collections the model doesn't have (the latter used
    to escape as a bare KeyError)."""
    from yolov4_tpu.utils.torch_convert import check_compatible

    variables = {"params": {"w": np.zeros((2,))},
                 "batch_stats": {"m": np.zeros((2,))}}
    with pytest.raises(ValueError, match="batch_stats"):
        check_compatible({"params": {"w": np.zeros((2,))}}, variables)
    full = {"params": {"w": np.zeros((2,))},
            "batch_stats": {"m": np.zeros((2,))}}
    with pytest.raises(ValueError, match="unexpected"):
        check_compatible(dict(full, bogus={"x": np.zeros((1,))}), variables)
    check_compatible(full, variables)  # exact match passes


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/reference"),
    reason="reference repo not mounted")
def test_exported_keys_match_reference_model():
    """Exported state_dict keys == the reference torch model's keys."""
    import sys
    sys.path.insert(0, "/root/reference")
    np.int = int
    np.alltrue = np.all
    import jax
    import torch
    from yolo.model.yolov4 import YOLOv4 as TYOLOv4
    from yolov4_tpu.config import load_config
    from yolov4_tpu.models import build_model
    from yolov4_tpu.models.yolov4 import init_variables

    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    tmodel = TYOLOv4(dict(cfg["MODEL"], BACKBONE_PRETRAINED=None), device=None)
    want_keys = {k for k in tmodel.state_dict()
                 if not k.endswith("num_batches_tracked")}

    variables = init_variables(build_model(cfg), jax.random.PRNGKey(0), 64)
    got_keys = set(export_state_dict(variables))
    assert got_keys == want_keys
