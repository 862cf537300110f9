"""Checkpoint save / resume.

Replaces the reference's torch.save dict checkpoints (yolo/util/utils.py:
17-24, main_amp.py:215-229) with msgpack-serialized pytrees. Unlike the
reference — whose optimizer/scheduler restore is dead code
(main_amp.py:159-162, SURVEY discrepancy #7) — resume here restores the
full training state: params, batch_stats, optimizer state, epoch counters
and best metrics.

Also loads the reference's torch ``.pth.tar`` files transparently via
utils/torch_convert (checkpoint-loadable weight parity).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

CKPT_NAME = "checkpoint.ckpt"
BEST_NAME = "model_best.ckpt"
META_SUFFIX = ".meta.json"


def save_checkpoint(state: Dict[str, Any], is_best: bool,
                    output_dir: str = "./", filename: str = CKPT_NAME,
                    meta: Optional[Dict[str, Any]] = None) -> str:
    """Serialize a pytree bundle; copy to model_best on improvement
    (reference utils.py:17-24 semantics, AP50 criterion decided by caller)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, filename)

    def atomic_write(dst, write_fn):
        # EVERY artifact gets tmp+replace: a preemption mid-copy must not
        # leave a truncated model_best.ckpt (the file detect/serve/val
        # consume), which would stay corrupt until the NEXT improvement
        tmp = dst + ".tmp"
        write_fn(tmp)
        os.replace(tmp, dst)

    data = serialization.msgpack_serialize(
        serialization.to_state_dict(state), in_place=True)

    def write_blob(p, blob=data):
        with open(p, "wb") as f:
            f.write(blob)

    atomic_write(path, write_blob)
    if meta is not None:
        def write_meta(p):
            with open(p, "w") as f:
                json.dump(meta, f, indent=2, default=float)
        atomic_write(path + META_SUFFIX, write_meta)
    if is_best:
        best = os.path.join(output_dir, BEST_NAME)
        atomic_write(best, lambda p: shutil.copyfile(path, p))
        if meta is not None:
            atomic_write(best + META_SUFFIX,
                         lambda p: shutil.copyfile(path + META_SUFFIX, p))
    return path


def load_checkpoint_raw(path: str) -> Dict[str, Any]:
    """Load a checkpoint into nested plain dicts (no template needed)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_onto(template: Any, raw: Any) -> Any:
    """Map a raw nested-dict state onto a structured template (optax trees,
    dataclasses, ...)."""
    return serialization.from_state_dict(template, raw)


def load_variables(path: str) -> Dict[str, Any]:
    """Model variables {'params', 'batch_stats'} from either a native
    checkpoint or a reference torch .pth.tar (auto-detected)."""
    if path.endswith((".pth", ".pth.tar", ".pt")):
        from yolov4_tpu.utils import torch_convert

        state_dict = torch_convert.load_pth_tar(path)
        return torch_convert.convert_state_dict(state_dict)
    raw = load_checkpoint_raw(path)
    if "variables" in raw:
        return raw["variables"]
    if "params" in raw:
        return {k: raw[k] for k in ("params", "batch_stats") if k in raw}
    raise ValueError(f"unrecognised checkpoint layout: {list(raw)[:8]}")


def load_pretrained_backbone(variables: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Graft pretrained backbone weights into fresh detector variables
    (reference yolov4.py:295-302). Accepts torch classifier checkpoints or
    native ones."""
    from yolov4_tpu.utils import torch_convert

    if path.endswith((".pth", ".pth.tar", ".pt")):
        sd = torch_convert.extract_backbone(torch_convert.load_pth_tar(path))
        converted = torch_convert.convert_state_dict(sd)
    else:
        raw = load_checkpoint_raw(path)
        tree = raw.get("variables", raw)
        converted = {
            coll: tree[coll]["backbone"]
            for coll in ("params", "batch_stats") if coll in tree
        }
    torch_convert.check_compatible(converted, variables, subtree=("backbone",))
    return torch_convert.merge_subtree(variables, converted, subtree=("backbone",))
