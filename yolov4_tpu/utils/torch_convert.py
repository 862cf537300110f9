"""Torch checkpoint -> JAX pytree converter.

Loads the reference's ``.pth.tar`` checkpoints (both the YOLOv4 trainer's
``{epoch, state_dict, ...}`` dicts, main_amp.py:220-229, and the darknet
pretrainer's) into this framework's {params, batch_stats} pytrees.

The mapping is mechanical because flax module names mirror the reference's
module tree with torch Sequential indices flattened into the name
(torch ``neck.spp.conv1.0.conv.weight`` -> flax
``neck/spp/conv1_0/conv/kernel``):

  * digit path segments merge into the previous segment with ``_``,
  * conv ``weight`` [O, I, H, W] -> ``kernel`` [H, W, I, O],
  * linear ``weight`` [O, I] -> ``kernel`` [I, O],
  * batchnorm ``weight``/``bias`` -> ``scale``/``bias`` (params),
    ``running_mean``/``running_var`` -> ``mean``/``var`` (batch_stats),
  * ``num_batches_tracked`` is dropped,
  * a leading DDP ``module.`` prefix is stripped (reference
    main_amp.py:153-157).

torch is imported lazily (CPU build) and only needed to read ``.pth.tar``
files; converted numpy state_dicts work without torch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

Path = Tuple[str, ...]


def _merge_digits(segments) -> list:
    merged: list = []
    for seg in segments:
        if seg.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{seg}"
        else:
            merged.append(seg)
    return merged


def torch_key_to_path(key: str) -> Tuple[str, Path]:
    """Map a torch state_dict key to (collection, flax path).

    Returns collection '' for keys to drop (num_batches_tracked).
    """
    if key.startswith("module."):
        key = key[len("module."):]
    segments = key.split(".")
    param = segments[-1]
    module_path = _merge_digits(segments[:-1])

    if param == "num_batches_tracked":
        return "", ()
    if param == "running_mean":
        return "batch_stats", tuple(module_path) + ("mean",)
    if param == "running_var":
        return "batch_stats", tuple(module_path) + ("var",)

    leaf_module = module_path[-1] if module_path else ""
    if param == "weight":
        if leaf_module == "norm":
            return "params", tuple(module_path) + ("scale",)
        return "params", tuple(module_path) + ("kernel",)
    if param == "bias":
        return "params", tuple(module_path) + ("bias",)
    raise ValueError(f"unrecognised torch parameter: {key}")


def _convert_value(path: Path, value: np.ndarray) -> np.ndarray:
    value = np.asarray(value)
    if path[-1] == "kernel":
        if value.ndim == 4:      # conv OIHW -> HWIO
            return np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:      # linear [O, I] -> [I, O]
            return np.transpose(value, (1, 0))
    return value


def _set_path(tree: Dict[str, Any], path: Path, value: np.ndarray) -> None:
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = value


def convert_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """numpy/torch state_dict -> {'params': ..., 'batch_stats': ...}."""
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key, value in state_dict.items():
        if hasattr(value, "detach"):  # torch tensor without importing torch
            value = value.detach().cpu().numpy()
        collection, path = torch_key_to_path(key)
        if not collection:
            continue
        _set_path(out[collection], path, _convert_value(path, np.asarray(value)))
    if not out["batch_stats"]:
        del out["batch_stats"]
    return out


def load_pth_tar(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth.tar`` checkpoint file into a numpy state_dict.
    Accepts either a bare state_dict or the reference trainer's wrapper dict
    (utils.py:17-24)."""
    import torch  # lazy: only needed when actually reading torch files

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {
        k: v.detach().cpu().numpy()
        for k, v in state_dict.items()
        if hasattr(v, "detach")
    }


def extract_backbone(state_dict: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Filter a classifier checkpoint down to backbone weights, keyed
    relative to the backbone (reference yolov4.py:295-302)."""
    out = {}
    for key, value in state_dict.items():
        stripped = key[len("module."):] if key.startswith("module.") else key
        if stripped.startswith("backbone."):
            out[stripped[len("backbone."):]] = value
    return out


# torch attribute names that natively contain ``_<digit>`` (so their
# underscores must NOT be split back into Sequential indices). part2_* only
# behaves this way inside CSPDownSample0, i.e. under a 'stage1' parent
# (reference darknet/darknet.py:84-113); elsewhere part2 is a Sequential.
_STAGE1_ATOMICS = ("part2_1_2", "part2_1_1", "part2_2")
_GLOBAL_ATOMICS = ("module_list",)


def _split_module(module: str, in_stage1: bool) -> list:
    atomics = (_STAGE1_ATOMICS if in_stage1 else ()) + _GLOBAL_ATOMICS
    for atomic in atomics:
        if module == atomic:
            return [atomic]
        if module.startswith(atomic + "_"):
            rest = module[len(atomic) + 1:].split("_")
            assert all(seg.isdigit() for seg in rest), module
            return [atomic] + rest
    parts = module.split("_")
    tail: list = []
    while parts and parts[-1].isdigit():
        tail.insert(0, parts.pop())
    return (["_".join(parts)] if parts else []) + tail


def flax_path_to_torch_key(collection: str, path: Path) -> str:
    """Inverse of torch_key_to_path for this framework's module-name
    conventions (``neck/spp/conv1_0/conv/kernel`` ->
    ``neck.spp.conv1.0.conv.weight``)."""
    *modules, leaf = path
    segments: list = []
    in_stage1 = False
    for module in modules:
        segments.extend(_split_module(module, in_stage1))
        in_stage1 = in_stage1 or module == "stage1"
    if collection == "batch_stats":
        leaf_name = {"mean": "running_mean", "var": "running_var"}[leaf]
    else:
        leaf_name = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    return ".".join(segments + [leaf_name])


def export_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """{'params', 'batch_stats'} pytrees -> torch-layout numpy state_dict
    (conv kernels back to OIHW, linear back to [O, I]). The result round-
    trips through convert_state_dict and can be torch.save'd for users of
    the reference."""
    out: Dict[str, np.ndarray] = {}

    def walk(collection, tree, prefix: Path):
        for key, value in tree.items():
            if isinstance(value, Mapping):
                walk(collection, value, prefix + (key,))
                continue
            path = prefix + (key,)
            arr = np.asarray(value)
            if key == "kernel":
                if arr.ndim == 4:
                    arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
                elif arr.ndim == 2:
                    arr = np.transpose(arr, (1, 0))
            out[flax_path_to_torch_key(collection, path)] = arr

    for collection in ("params", "batch_stats"):
        if collection in variables:
            walk(collection, variables[collection], ())
    return out


def _tree_shapes(tree: Any, prefix: Path = ()) -> Dict[Path, Tuple[int, ...]]:
    shapes: Dict[Path, Tuple[int, ...]] = {}
    if isinstance(tree, Mapping):
        for key, value in tree.items():
            shapes.update(_tree_shapes(value, prefix + (key,)))
    else:
        shapes[prefix] = tuple(np.shape(tree))
    return shapes


def check_compatible(converted: Mapping[str, Any], variables: Mapping[str, Any],
                     subtree: Path = ()) -> None:
    """Raise if the converted tree does not exactly match the model's
    variable structure (strict load, like torch load_state_dict(strict=True))."""
    # strict means MISSING COLLECTIONS fail too: a params-only checkpoint
    # (convert_state_dict drops an empty batch_stats) would otherwise pass
    # and silently evaluate with fresh BN mean=0/var=1 — garbage AP with
    # no error, exactly what strict=True exists to prevent. Only the
    # collections checkpoints CARRY are required: model variables may
    # include runtime-only collections (e.g. int8_static's "quant" scales,
    # which come from calibration, never from a checkpoint).
    absent = [c for c in ("params", "batch_stats")
              if c in variables and c not in converted]
    if absent:
        raise ValueError(
            f"strict load failed: checkpoint has no {absent} collection(s) "
            f"(model expects {sorted(variables)}); a params-only torch "
            f"checkpoint is missing the BN running statistics")
    # the mirror-direction guard: a converted tree carrying a collection
    # the model doesn't have must fail as a strict-load message, not a
    # bare KeyError at variables[collection] below
    surplus = [c for c in converted if c not in variables]
    if surplus:
        raise ValueError(
            f"strict load failed: checkpoint carries unexpected "
            f"collection(s) {sorted(surplus)} (model has "
            f"{sorted(variables)})")
    for collection in converted:
        expected = variables[collection]
        for seg in subtree:
            expected = expected[seg]
        got = _tree_shapes(converted[collection])
        want = _tree_shapes(expected)
        missing = set(want) - set(got)
        unexpected = set(got) - set(want)
        if missing or unexpected:
            raise ValueError(
                f"[{collection}] strict load failed. missing={sorted(missing)[:5]} "
                f"unexpected={sorted(unexpected)[:5]} "
                f"(+{max(0, len(missing) + len(unexpected) - 10)} more)")
        mismatched = {p: (got[p], want[p]) for p in want if got[p] != want[p]}
        if mismatched:
            raise ValueError(f"[{collection}] shape mismatches: "
                             f"{dict(list(mismatched.items())[:5])}")


def merge_subtree(variables: Dict[str, Any], converted: Mapping[str, Any],
                  subtree: Path = ()) -> Dict[str, Any]:
    """Return a copy of ``variables`` with ``converted`` grafted in at
    ``subtree`` (e.g. ('backbone',) for pretrained-backbone load).

    Copies only the dict CONTAINERS, sharing the weight leaves: nothing
    in this codebase mutates leaves in place, and a deepcopy would
    materialize two extra full models (~250 MB each for YOLOv4, plus
    device round-trips for jitted-init arrays) at every startup graft."""
    def copy_dirs(node):
        if isinstance(node, Mapping):
            return {k: copy_dirs(v) for k, v in node.items()}
        return node

    out = {c: copy_dirs(t) for c, t in variables.items()}
    for collection, tree in converted.items():
        node = out[collection]
        for seg in subtree[:-1]:
            node = node[seg]
        if subtree:
            node[subtree[-1]] = copy_dirs(dict(tree))
        else:
            out[collection] = copy_dirs(dict(tree))
    return out
