"""Optimizers (reference yolo/optim/optimizers/:14-80) as optax transforms.

The learning rate is intentionally NOT baked into the transform: the train
step evaluates the schedule at the current micro-step and scales updates
itself, reproducing the reference's per-iteration warmup writes to
``param_group['lr']`` (lr_schedulers/build.py:17-27) independently of
gradient-accumulation cadence.

Weight-decay grouping matches ``filter_weight`` (optimizers/build.py:38-80):
kernels decay; biases are exempt when NO_BIAS; normalization scale/bias are
exempt when NO_NORM. As in the reference, ADAM ignores weight decay
entirely (build_adam takes no decay argument, optimizers/adam.py:14).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax


def decay_mask(params: Dict[str, Any], no_bias: bool = True,
               no_norm: bool = True) -> Dict[str, Any]:
    """Pytree of bools: True where weight decay applies.

    Layout facts used: conv/dense kernels live under a module named 'conv'
    or a Dense ('classifier'); BatchNorm params under 'norm' as
    scale/bias."""

    def walk(tree, in_norm):
        out = {}
        for key, value in tree.items():
            if isinstance(value, dict):
                out[key] = walk(value, in_norm or key == "norm")
            else:
                if in_norm or key == "scale":
                    out[key] = not no_norm
                elif key == "bias":
                    out[key] = not no_bias
                else:  # kernel
                    out[key] = True
        return out

    return walk(params, False)


def build_optimizer(cfg: Dict, params: Dict[str, Any]) -> optax.GradientTransformation:
    """LR-less update rule (reference optim/optimizers/build.py:18-35).

    The returned transform maps grads -> DESCENT updates of unit LR; the
    caller multiplies by -lr(step)."""
    opt_cfg = cfg["OPTIMIZER"]
    opt_type = opt_cfg["TYPE"]
    mask = decay_mask(params, bool(opt_cfg.get("NO_BIAS", True)),
                      bool(opt_cfg.get("NO_NORM", True)))

    if opt_type == "ADAM":
        # torch Adam defaults: betas (0.9, 0.999), eps 1e-8, no weight decay
        return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    if opt_type == "SGD":
        momentum = float(opt_cfg["MOMENTUM"])
        weight_decay = float(opt_cfg["DECAY"])
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.trace(decay=momentum, nesterov=False),
        )
    raise ValueError(f"{opt_type} does not support.")
