"""Data-parallel training step: one compiled XLA program per step.

Replaces the reference's python train loop body (engine/build.py:55-69:
forward, loss, apex scaled backward, DDP allreduce, optimizer step) with a
``shard_map`` over the device mesh:

  * batch sharded on the 'data' axis; params/optimizer state replicated,
  * per-shard BatchNorm batch statistics (the reference trains with
    per-replica BN — sync_bn is parsed but never applied, SURVEY
    discrepancy #8); running stats are pmean'd so they stay replicated,
  * gradients pmean'd over ICI inside the program (XLA overlaps the
    reduction with backward compute, replacing DDP delay_allreduce),
  * gradient accumulation by state-carried sums with an optimizer update
    every ACCUMULATION_STEPS micro-steps (loss pre-divided by the step
    count, engine/build.py:61),
  * the LR schedule evaluated at the current micro-step inside the program
    (per-iteration warmup, reference lr_schedulers/build.py:17-27).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from yolov4_tpu.parallel.mesh import DATA_AXIS


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                 # global micro-step counter
    params: Any
    batch_stats: Any
    opt_state: Any
    accum_grads: Any                  # gradient accumulation buffer
    loss: jnp.ndarray                 # last step's (replica-mean) loss
    # opt-in parameter EMA (TRAIN.EMA_DECAY > 0): shadow weights updated
    # after every optimizer update, used for eval/best-checkpointing.
    # None when disabled (an empty pytree subtree — costs nothing).
    ema_params: Any = None


def create_train_state(variables: Dict[str, Any],
                       tx: optax.GradientTransformation,
                       ema: bool = False) -> TrainState:
    params = variables["params"]
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        accum_grads=zeros,
        loss=jnp.zeros((), jnp.float32),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def make_train_step(model, criterion, tx: optax.GradientTransformation,
                    lr_schedule: Callable, mesh: Mesh,
                    accumulation_steps: int = 1,
                    img_size: Optional[int] = None,
                    device_aug: Optional[Dict] = None,
                    aug_seed: int = 0,
                    skip_nonfinite: bool = False,
                    input_layout: str = "nhwc",
                    ema_decay: float = 0.0) -> Callable:
    """Returns jitted step(state, images, labels) -> state.

    images: [B_global, S, S, 3] float32 — or, when ``img_size`` is given,
    FLAT [B_global, S*S*3] float32/uint8 reshaped (and, for uint8,
    normalized by /255) on device. Flat transfer avoids the 3->128 lane
    padding tax on host->device copies. labels: [B_global, K, 5]. Both
    sharded on the leading axis across the mesh.

    input_layout: "nhwc" (flat planar NCHW semantics, reshaped+transposed
    on device) or "s2d" — the flat bytes are already in the
    space-to-depth stem's input order ([B, S/2, S/2, 12]; host packs via
    native.pack_s2d_f32), skipping the in-program 3-channel relayout
    copies (2.56 ms/step of the 608/b8 train trace). Requires the fused
    s2d stem.

    device_aug: when given (dict of augment_batch kwargs minus size), the
    step consumes raw mosaic canvases instead: images = flat planar uint8
    [B, 4*3*S*S], labels = member boxes [B, 4, K, 5] (xyxy+cls canvas px);
    augmentation (crop/flip/HSV/mosaic) runs inside this same program, with
    per-(step, shard) PRNG keys.
    """
    base_key = jax.random.PRNGKey(aug_seed)
    multi = mesh.devices.size > 1
    # On a 1-device mesh the collectives are identities and we jit the body
    # directly (see wrap_step); resolve them at trace time.
    pmean = (lambda x: jax.lax.pmean(x, DATA_AXIS)) if multi else (lambda x: x)
    shard_index = ((lambda: jax.lax.axis_index(DATA_AXIS)) if multi
                   else (lambda: jnp.int32(0)))

    def shard_body(state: TrainState, images, labels) -> TrainState:
        if device_aug is not None:
            from yolov4_tpu.data.device_aug import augment_batch_impl

            b = images.shape[0]
            canv = images.reshape(b, 4, 3, img_size, img_size)
            canv = jnp.transpose(canv, (0, 1, 3, 4, 2))  # [B, 4, S, S, 3]
            key = jax.random.fold_in(
                jax.random.fold_in(base_key, state.step), shard_index())
            images, labels = augment_batch_impl(
                key, canv, labels, size=img_size,
                max_labels=labels.shape[2], **device_aug)
        elif img_size is not None:
            if input_layout == "s2d":
                images = images.reshape(-1, img_size // 2, img_size // 2, 12)
            else:
                images = images.reshape(-1, img_size, img_size, 3)
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0

        # pass input_s2d only when active: test/tiny models need not
        # accept the kwarg unless the s2d wire layout is in use
        apply_kw = ({"input_s2d": True}
                    if input_layout == "s2d" and device_aug is None
                    and img_size is not None else {})

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"], **apply_kw)
            loss = criterion(outputs, {"padded_labels": labels})
            return loss / accumulation_steps, mutated["batch_stats"]

        (loss, new_batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # cross-replica reductions over ICI
        grads = pmean(grads)
        loss = pmean(loss)
        new_batch_stats = pmean(new_batch_stats)

        accum = jax.tree.map(jnp.add, state.accum_grads, grads)
        apply_now = (state.step + 1) % accumulation_steps == 0
        if skip_nonfinite:
            # robustness guard (not in the reference): drop a micro-batch
            # whose loss/grads went non-finite instead of poisoning params
            finite = jnp.isfinite(loss)
            for g in jax.tree.leaves(grads):
                finite = finite & jnp.all(jnp.isfinite(g))
            accum = jax.tree.map(
                lambda a, prev: jnp.where(finite, a, prev),
                accum, state.accum_grads)
            # BN running stats come from the same non-finite activations:
            # keep the previous stats too, or a momentum blend with NaN
            # stays NaN forever and every later eval (train=False uses
            # running stats) collapses even though params were protected
            new_batch_stats = jax.tree.map(
                lambda n, o: jnp.where(finite, n, o),
                new_batch_stats, state.batch_stats)
        lr = lr_schedule(state.step)

        def do_update(operand):
            accum, opt_state, params, ema = operand
            updates, new_opt_state = tx.update(accum, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            new_params = optax.apply_updates(params, updates)
            if ema_decay > 0.0:  # static: traced away when off
                d = jnp.float32(ema_decay)
                ema = jax.tree.map(
                    lambda e, p: (d * e + (1.0 - d) * p).astype(e.dtype),
                    ema, new_params)
            zeros = jax.tree.map(jnp.zeros_like, accum)
            return zeros, new_opt_state, new_params, ema

        def no_update(operand):
            return operand

        accum, opt_state, params, ema_params = jax.lax.cond(
            apply_now, do_update, no_update,
            (accum, state.opt_state, state.params, state.ema_params))

        return state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_batch_stats,
            opt_state=opt_state,
            accum_grads=accum,
            loss=loss * accumulation_steps,  # report the undivided loss
            ema_params=ema_params,
        )

    return wrap_step(shard_body, mesh)


def wrap_step(shard_body: Callable, mesh: Mesh) -> Callable:
    """jit a per-shard step body for the mesh.

    On a single-device mesh the body is jitted directly (pmean over a
    1-device axis is the identity, so semantics are unchanged) — through
    tunneled/experimental backends, shard_map was measured 150x slower than
    plain jit for the same body (state appears to round-trip off-device).
    Real multi-device meshes use shard_map with batch sharding.
    """
    if mesh.devices.size == 1:
        # body built with identity collectives (make_train_step's pmean
        # closure): jit directly.
        return jax.jit(shard_body, donate_argnums=(0,))

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
