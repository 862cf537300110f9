"""Learning-rate schedules (reference yolo/optim/lr_schedulers/build.py).

One pure function of the GLOBAL micro-step reproduces the reference's
two-level scheme exactly:

  * per-iteration linear warmup for epoch < WARMUP_EPOCH:
      lr = base * (1 + step + epoch*len_epoch) / (WARMUP_EPOCH*len_epoch)
    (lr_schedulers/build.py:17-27),
  * then an epoch-level scheduler stepped once per post-warmup epoch:
      - MultiStepLR with milestones shifted by -warmup (build.py:37-43):
        equivalent to gamma^(# original milestones <= epoch),
      - CosineAnnealingLR over (MAX_EPOCHS - warmup) epochs (build.py:44-50).

jnp-traceable: usable inside a jitted train step.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np


def build_lr_schedule(cfg: Dict, len_epoch: int) -> Callable:
    """Returns lr(global_step) -> float32 scalar (traceable)."""
    base_lr = float(cfg["OPTIMIZER"]["LR"])
    sched = cfg["LR_SCHEDULER"]
    is_warmup = bool(sched.get("IS_WARMUP", False))
    warmup_epoch = int(sched.get("WARMUP_EPOCH", 0)) if is_warmup else 0
    sched_type = sched["TYPE"]

    if sched_type == "MultiStepLR":
        milestones = np.asarray(sorted(int(m) for m in sched["MILESTONES"]))
        gamma = float(sched["GAMMA"])

        def post_warmup_lr(epoch):
            # torch MultiStepLR(bisect_right): the milestone epoch itself
            # already uses the decayed LR
            n = jnp.sum(epoch >= jnp.asarray(milestones))
            return base_lr * gamma ** n.astype(jnp.float32)

    elif sched_type == "CosineAnnealingLR":
        t_max = int(cfg["TRAIN"]["MAX_EPOCHS"]) - warmup_epoch
        if t_max <= 0:
            # fail at build time: t_max=0 makes the post-warmup LR 0/0
            # (NaN params with no error), negative t_max inverts the curve
            raise ValueError(
                f"CosineAnnealingLR needs MAX_EPOCHS > WARMUP_EPOCH "
                f"(got {cfg['TRAIN']['MAX_EPOCHS']} <= {warmup_epoch})")
        eta_min = float(sched["MINIMAL_LR"])

        def post_warmup_lr(epoch):
            k = (epoch - warmup_epoch).astype(jnp.float32)
            return eta_min + (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * k / t_max)) / 2

    else:
        raise ValueError(f"{sched_type} does not support.")

    warmup_total = warmup_epoch * len_epoch

    def schedule(global_step) -> jnp.ndarray:
        global_step = jnp.asarray(global_step)
        epoch = global_step // len_epoch
        warm = base_lr * (1.0 + global_step.astype(jnp.float32)) / max(warmup_total, 1)
        post = post_warmup_lr(epoch)
        if warmup_total == 0:
            return post
        return jnp.where(global_step < warmup_total, warm, post)

    return schedule
