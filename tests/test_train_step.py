"""Data-parallel train step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov4_tpu.config import load_config
from yolov4_tpu.models import build_model
from yolov4_tpu.models.yolov4 import init_variables
from yolov4_tpu.ops.loss import build_criterion, _bce_sum
from yolov4_tpu.optim import build_lr_schedule, build_optimizer
from yolov4_tpu.parallel import create_mesh, create_train_state, make_train_step
from yolov4_tpu.utils import checkpoint as ckpt_lib


class TinyDetector(__import__("flax").linen.Module):
    """Minimal stand-in with the detector's interface: 3 decoded scales.
    Keeps CPU compiles to seconds — the step logic is model-agnostic, and
    full-model training is covered by the TPU smoke in train.py."""

    n_classes: int = 80

    @__import__("flax").linen.compact
    def __call__(self, x, train=False):
        from flax import linen as nn
        from yolov4_tpu.models.decode import decode_all
        from yolov4_tpu.config import DEFAULTS

        out_ch = 3 * (5 + self.n_classes)
        raws = []
        for stride_pow in (3, 4, 5):  # strides 8/16/32
            h = nn.Conv(8, (3, 3), strides=(2 ** stride_pow,) * 2,
                        name=f"down{stride_pow}")(x)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"norm{stride_pow}")(h)
            h = nn.relu(h)
            raws.append(nn.Conv(out_ch, (1, 1), name=f"head{stride_pow}")(h))
        model_cfg = DEFAULTS["MODEL"]
        return decode_all(raws, model_cfg["ANCHORS"], model_cfg["ANCHOR_MASK"],
                          training=train)


def _setup(accum=1, img_size=64):
    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    model = TinyDetector()
    variables = init_variables(model, jax.random.PRNGKey(0), img_size)
    criterion = build_criterion(cfg)
    tx = build_optimizer(cfg, variables["params"])
    schedule = build_lr_schedule(cfg, len_epoch=10)
    mesh = create_mesh()
    step = make_train_step(model, criterion, tx, schedule, mesh,
                           accumulation_steps=accum)
    state = create_train_state(variables, tx)
    return step, state, mesh


def _batch(rng, b=8, img_size=64):
    imgs = rng.uniform(0, 1, (b, img_size, img_size, 3)).astype(np.float32)
    labels = np.zeros((b, 60, 5), np.float32)
    labels[:, 0] = [20, 30, 10, 12, 5]
    labels[:, 1] = [44, 12, 16, 20, 63]
    return imgs, labels


def test_bce_gradient_finite_at_masked_zeros():
    g = jax.grad(lambda p: _bce_sum(p, jnp.zeros(4)))(jnp.zeros(4))
    np.testing.assert_array_equal(np.asarray(g), 0.0)
    g1 = jax.grad(lambda p: _bce_sum(p, jnp.ones(4)))(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(g1), 0.0)


def test_bce_gradient_matches_torch():
    import torch
    p = np.random.default_rng(0).uniform(0.05, 0.95, (8,)).astype(np.float32)
    t = np.random.default_rng(1).uniform(0, 1, (8,)).astype(np.float32)
    tp = torch.tensor(p, requires_grad=True)
    loss = torch.nn.BCELoss(reduction="sum")(tp, torch.tensor(t))
    loss.backward()
    g = jax.grad(lambda p: _bce_sum(p, jnp.asarray(t)))(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(g), tp.grad.numpy(), rtol=1e-4)


def test_train_step_learns():
    rng = np.random.default_rng(0)
    step, state, _ = _setup(accum=1)
    imgs, labels = _batch(rng)
    losses = []
    for _ in range(6):
        state = step(state, imgs, labels)
        losses.append(float(state.loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6
    assert all(bool(jnp.isfinite(p).all()) for p in jax.tree.leaves(state.params))


def test_accumulation_updates_every_k():
    rng = np.random.default_rng(0)
    step, state, _ = _setup(accum=2)
    imgs, labels = _batch(rng)
    p0 = np.asarray(jax.tree.leaves(state.params)[0])
    state = step(state, imgs, labels)
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: no update
    # accumulated grads are non-zero
    assert np.abs(np.asarray(jax.tree.leaves(state.accum_grads)[0])).sum() > 0
    state = step(state, imgs, labels)
    p2 = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.abs(p2 - p0).sum() > 0      # second micro-step applies
    # buffer reset after apply
    assert np.abs(np.asarray(jax.tree.leaves(state.accum_grads)[0])).sum() == 0


def test_train_state_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    step, state, _ = _setup(accum=1)
    imgs, labels = _batch(rng)
    state = step(state, imgs, labels)

    bundle = {
        "variables": {"params": state.params, "batch_stats": state.batch_stats},
        "opt_state": state.opt_state,
        "meta": {"step": int(state.step), "epoch": 3, "best_ap50": 0.5},
    }
    path = ckpt_lib.save_checkpoint(bundle, is_best=True,
                                    output_dir=str(tmp_path),
                                    meta={"epoch": 3})
    raw = ckpt_lib.load_checkpoint_raw(path)
    assert raw["meta"]["epoch"] == 3

    # restore onto a fresh state template
    _, fresh, _ = _setup(accum=1)
    restored_opt = ckpt_lib.restore_onto(fresh.opt_state, raw["opt_state"])
    restored_params = ckpt_lib.restore_onto(fresh.params,
                                            raw["variables"]["params"])
    for a, b in zip(jax.tree.leaves(restored_params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored_opt),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # model_best copy exists
    assert (tmp_path / "model_best.ckpt").exists()


def test_batch_stats_updated_and_replicated():
    rng = np.random.default_rng(0)
    step, state, _ = _setup(accum=1)
    bs0 = np.asarray(jax.tree.leaves(state.batch_stats)[0])
    imgs, labels = _batch(rng)
    state = step(state, imgs, labels)
    bs1 = np.asarray(jax.tree.leaves(state.batch_stats)[0])
    assert np.abs(bs1 - bs0).sum() > 0


def test_skip_nonfinite_guard():
    """With skip_nonfinite, a NaN-producing micro-batch leaves params
    untouched; without it, params get poisoned."""
    rng = np.random.default_rng(0)
    from yolov4_tpu.optim import build_lr_schedule, build_optimizer
    from yolov4_tpu.parallel import create_mesh, create_train_state, make_train_step
    from yolov4_tpu.ops.loss import build_criterion

    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    model = TinyDetector()
    variables = init_variables(model, jax.random.PRNGKey(0), 64)
    criterion = build_criterion(cfg)
    tx = build_optimizer(cfg, variables["params"])
    schedule = build_lr_schedule(cfg, len_epoch=10)
    mesh = create_mesh()
    imgs, labels = _batch(rng)
    bad_imgs = imgs.copy()
    bad_imgs[0, 0, 0, 0] = np.nan  # NaN input -> NaN loss/grads

    step_guard = make_train_step(model, criterion, tx, schedule, mesh,
                                 skip_nonfinite=True)
    state = create_train_state(variables, tx)
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    bs0 = [np.asarray(t).copy() for t in jax.tree.leaves(state.batch_stats)]
    state = step_guard(state, bad_imgs, labels)
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)  # bad batch dropped
    # BN running stats must also be protected: a momentum blend with the
    # NaN batch stats would stay NaN forever and poison every later eval
    for before, after in zip(bs0, jax.tree.leaves(state.batch_stats)):
        np.testing.assert_array_equal(before, np.asarray(after))
    state = step_guard(state, imgs, labels)
    p2 = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.isfinite(p2).all() and np.abs(p2 - p0).sum() > 0
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree.leaves(state.batch_stats))


def test_s2d_wire_layout_matches_nhwc():
    """input_layout="s2d" (host-packed stem wire format) must produce the
    same step as flat-NHWC given the same underlying images."""
    rng = np.random.default_rng(3)
    from yolov4_tpu import native
    from yolov4_tpu.models import build_model
    from yolov4_tpu.optim import build_lr_schedule, build_optimizer
    from yolov4_tpu.parallel import (create_mesh, create_train_state,
                                     make_train_step)
    from yolov4_tpu.ops.loss import build_criterion

    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    s, b = 64, 8
    model = build_model(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0), s)
    criterion = build_criterion(cfg)
    tx = build_optimizer(cfg, variables["params"])
    schedule = build_lr_schedule(cfg, len_epoch=10)
    mesh = create_mesh()

    imgs = rng.random((b, s, s, 3)).astype(np.float32)
    labels = np.zeros((b, 60, 5), np.float32)
    labels[:, 0] = [20, 20, 24, 24, 3]
    flat_nhwc = jnp.asarray(imgs.reshape(b, -1))
    flat_s2d = jnp.asarray(native.pack_s2d_f32(imgs).reshape(b, -1))
    labels = jnp.asarray(labels)

    step_n = make_train_step(model, criterion, tx, schedule, mesh,
                             img_size=s, input_layout="nhwc")
    step_s = make_train_step(model, criterion, tx, schedule, mesh,
                             img_size=s, input_layout="s2d")
    # the step donates its state: give each run its own buffer copy
    copy = lambda tree: jax.tree.map(jnp.array, tree)
    st_n = step_n(create_train_state(copy(variables), tx), flat_nhwc, labels)
    st_s = step_s(create_train_state(copy(variables), tx), flat_s2d, labels)
    np.testing.assert_allclose(float(st_n.loss), float(st_s.loss),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5),
        st_n.params, st_s.params)


def _trainer_cfg(tmp_path, out_name, max_epochs):
    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, COMPUTE_DTYPE="float32",
                        BACKBONE_PRETRAINED=None)
    cfg["TRAIN"].update(IMGSIZE=64, MAX_EPOCHS=max_epochs,
                        OUTPUT_DIR=str(tmp_path / out_name))
    cfg["TEST"].update(IMGSIZE=64, BATCH_SIZE=2, PRE_NMS_TOPK=64, MAX_DETS=10)
    cfg["DATA"].update(WORKERS=0, BATCH_SIZE=1)
    cfg["AUGMENTATION"].update(IS_MOSAIC=False)
    return cfg


def test_resume_trajectory_matches_straight_run(tmp_path):
    """train-2-epochs straight == train-1 -> save -> NEW Trainer(resume) ->
    train-1: identical per-step loss trajectory and final params.

    This is the end-to-end proof behind 'fixes the reference's dead
    optimizer restore' (reference main_amp.py:159-162: the optimizer/
    scheduler restore is `hasattr(dict, 'optimizer')` — always False).
    It requires ALL of: params + BN stats + Adam moments + global step
    (per-iter warmup LR) restored, AND loader set_epoch determinism
    across the process boundary — any miss shows up as a diverged loss
    or params.
    """
    import json
    import os

    from tests.fixtures import make_fake_coco
    from yolov4_tpu.engine.trainer import Trainer

    root = str(tmp_path / "coco")
    make_fake_coco(root, "train2017", n_images=16, seed=0)
    make_fake_coco(root, "val2017", n_images=2, seed=1)

    def train_records(out_dir):
        path = os.path.join(out_dir, "metrics.jsonl")
        return [json.loads(l) for l in open(path)
                if json.loads(l)["kind"] == "train"]

    # straight-through: 2 epochs (16 imgs / local batch 8 = 2 steps/epoch)
    cfg_a = _trainer_cfg(tmp_path, "out_a", max_epochs=2)
    trainer_a = Trainer(cfg_a, root)
    trainer_a.print_freq = 1
    trainer_a.fit()
    rec_a = train_records(cfg_a["TRAIN"]["OUTPUT_DIR"])
    assert int(trainer_a.state.step) == 4

    # interrupted: 1 epoch, checkpoint written by fit()
    cfg_b = _trainer_cfg(tmp_path, "out_b", max_epochs=1)
    trainer_b = Trainer(cfg_b, root)
    trainer_b.print_freq = 1
    trainer_b.fit()
    ckpt = os.path.join(cfg_b["TRAIN"]["OUTPUT_DIR"], "checkpoint.ckpt")
    assert os.path.isfile(ckpt)

    # resumed: fresh process-equivalent (new Trainer), epochs [1, 2)
    cfg_c = _trainer_cfg(tmp_path, "out_c", max_epochs=2)
    trainer_c = Trainer(cfg_c, root, resume=ckpt)
    trainer_c.print_freq = 1
    assert trainer_c.start_epoch == 1
    assert int(trainer_c.state.step) == 2
    trainer_c.fit()
    rec_c = train_records(cfg_c["TRAIN"]["OUTPUT_DIR"])

    # loss trajectory: epoch-2 records of the straight run == resumed run
    # (same loader order via set_epoch(1), same warmup LR via restored
    # global step, same Adam moments via restored opt_state)
    a2 = [r for r in rec_a if r["epoch"] == 2]
    assert len(a2) == 2 and len(rec_c) == 2
    for ra, rc in zip(a2, rec_c):
        assert ra["step"] == rc["step"]
        np.testing.assert_allclose(ra["loss"], rc["loss"], rtol=1e-6)
        np.testing.assert_allclose(ra["lr"], rc["lr"], rtol=1e-9)

    # final params + BN stats identical
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        trainer_a.state.params, trainer_c.state.params)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        trainer_a.state.batch_stats, trainer_c.state.batch_stats)


def test_preemption_mid_epoch_resume(tmp_path):
    """Preemption-safe checkpointing (TRAIN.CHECKPOINT_EVERY_STEPS): kill
    the trainer MID-epoch, resume from the rolling checkpoint, and the
    remaining steps must reproduce the uninterrupted run exactly — loss
    trajectory, LR, final params and BN stats. Requires the mid_epoch
    meta (epoch + batch_index), the loader's start_batch alignment
    (indices AND per-batch augmentation seeds), and the restored global
    step/opt state. Beyond-reference: the reference can only checkpoint
    per epoch (and its optimizer restore is dead code)."""
    import json
    import os

    from tests.fixtures import make_fake_coco
    from yolov4_tpu.engine.trainer import Trainer

    root = str(tmp_path / "coco")
    make_fake_coco(root, "train2017", n_images=24, seed=0)  # 3 steps/epoch
    make_fake_coco(root, "val2017", n_images=2, seed=1)

    def train_records(out_dir):
        path = os.path.join(out_dir, "metrics.jsonl")
        return {json.loads(l)["step"]: json.loads(l) for l in open(path)
                if json.loads(l)["kind"] == "train"}

    # uninterrupted: 2 epochs x 3 steps
    cfg_a = _trainer_cfg(tmp_path, "pre_a", max_epochs=2)
    trainer_a = Trainer(cfg_a, root)
    trainer_a.print_freq = 1
    trainer_a.fit()
    rec_a = train_records(cfg_a["TRAIN"]["OUTPUT_DIR"])
    assert int(trainer_a.state.step) == 6

    # preempted DURING step 5 (epoch 2, batch 2): the rolling checkpoint
    # on disk is the mid-epoch save from step 4 (epoch 2, batch 1)
    cfg_b = _trainer_cfg(tmp_path, "pre_b", max_epochs=2)
    cfg_b["TRAIN"]["CHECKPOINT_EVERY_STEPS"] = 1
    trainer_b = Trainer(cfg_b, root)
    trainer_b.print_freq = 1
    real_step, calls = trainer_b.train_step, 0

    def preemptible(state, imgs, labels):
        nonlocal calls
        if calls == 4:
            raise RuntimeError("preempted")
        calls += 1
        return real_step(state, imgs, labels)

    trainer_b.train_step = preemptible
    with pytest.raises(RuntimeError, match="preempted"):
        trainer_b.fit()
    ckpt = os.path.join(cfg_b["TRAIN"]["OUTPUT_DIR"], "checkpoint.ckpt")
    meta = json.load(open(ckpt + ".meta.json"))
    assert meta["mid_epoch"] and meta["epoch"] == 1 \
        and meta["batch_index"] == 1 and meta["step"] == 4, meta

    # resumed: re-enters epoch 2 at batch 2, runs steps 5-6
    cfg_c = _trainer_cfg(tmp_path, "pre_c", max_epochs=2)
    trainer_c = Trainer(cfg_c, root, resume=ckpt)
    trainer_c.print_freq = 1
    assert trainer_c.start_epoch == 1 and trainer_c._resume_skip == 1
    assert int(trainer_c.state.step) == 4
    trainer_c.fit()
    rec_c = train_records(cfg_c["TRAIN"]["OUTPUT_DIR"])

    assert set(rec_c) == {5, 6}, sorted(rec_c)
    for s in (5, 6):
        np.testing.assert_allclose(rec_a[s]["loss"], rec_c[s]["loss"],
                                   rtol=1e-6)
        np.testing.assert_allclose(rec_a[s]["lr"], rec_c[s]["lr"], rtol=1e-9)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        trainer_a.state.params, trainer_c.state.params)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        trainer_a.state.batch_stats, trainer_c.state.batch_stats)


def test_trainer_writes_metrics_jsonl(tmp_path):
    """The trainer's JSONL scalar sink records train + eval scalars
    (machine-readable copy of the stdout log)."""
    import json
    import os

    from tests.fixtures import make_fake_coco
    from yolov4_tpu.config import load_config
    from yolov4_tpu.engine.trainer import Trainer

    root = str(tmp_path / "coco")
    make_fake_coco(root, "train2017", n_images=8, seed=0)
    make_fake_coco(root, "val2017", n_images=2, seed=1)
    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, COMPUTE_DTYPE="float32",
                        BACKBONE_PRETRAINED=None)
    cfg["TRAIN"].update(IMGSIZE=64, MAX_EPOCHS=1,
                        OUTPUT_DIR=str(tmp_path / "out"))
    cfg["TEST"].update(IMGSIZE=64, BATCH_SIZE=2, PRE_NMS_TOPK=64, MAX_DETS=10)
    # local batch = BATCH_SIZE * 8 virtual devices; 8 images = 1 batch
    cfg["DATA"].update(WORKERS=0, BATCH_SIZE=1)
    cfg["AUGMENTATION"].update(IS_MOSAIC=False)
    trainer = Trainer(cfg, root)
    trainer.print_freq = 1  # record every batch of the tiny epoch
    trainer.fit()

    path = os.path.join(str(tmp_path / "out"), "metrics.jsonl")
    assert os.path.isfile(path)
    records = [json.loads(l) for l in open(path)]
    kinds = {r["kind"] for r in records}
    assert kinds == {"train", "eval"}
    tr = next(r for r in records if r["kind"] == "train")
    assert {"ts", "epoch", "step", "loss", "lr", "img_s"} <= set(tr)
    ev = next(r for r in records if r["kind"] == "eval")
    assert {"ap", "ap50", "best_ap50"} <= set(ev)


# ---- opt-in knobs: parameter EMA + multi-scale buckets (round 5) ------


def _ema_setup(decay, accum=1):
    cfg = load_config()
    cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
    model = TinyDetector()
    variables = init_variables(model, jax.random.PRNGKey(0), 64)
    tx = build_optimizer(cfg, variables["params"])
    schedule = build_lr_schedule(cfg, len_epoch=10)
    mesh = create_mesh()
    step = make_train_step(model, build_criterion(cfg), tx, schedule, mesh,
                           accumulation_steps=accum, ema_decay=decay)
    state = create_train_state(variables, tx, ema=decay > 0)
    return step, state


def test_ema_tracks_weighted_average():
    """ema_{k} = d*ema_{k-1} + (1-d)*params_k after every optimizer
    update, seeded from the initial params."""
    d = 0.5
    step, state = _ema_setup(d)
    imgs, labels = _batch(np.random.default_rng(0))
    expect = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    for _ in range(3):
        state = step(state, imgs, labels)
        p = jax.tree.map(np.asarray, state.params)
        expect = jax.tree.map(lambda e, q: d * e + (1 - d) * q, expect, p)
    got = jax.tree.leaves(state.ema_params)
    want = jax.tree.leaves(expect)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-7)
    # EMA lags behind live params (it includes the init weights)
    diffs = [float(np.abs(np.asarray(e) - np.asarray(p)).max())
             for e, p in zip(jax.tree.leaves(state.ema_params),
                             jax.tree.leaves(state.params))]
    assert max(diffs) > 0


def test_ema_updates_only_on_optimizer_apply():
    """With accumulation, the shadow average moves only when the optimizer
    applies (micro-steps leave it untouched)."""
    step, state = _ema_setup(0.9, accum=2)
    imgs, labels = _batch(np.random.default_rng(0))
    e0 = [np.asarray(x).copy() for x in jax.tree.leaves(state.ema_params)]
    state = step(state, imgs, labels)  # micro-step: no apply
    e1 = [np.asarray(x) for x in jax.tree.leaves(state.ema_params)]
    for a, b in zip(e0, e1):
        np.testing.assert_array_equal(a, b)
    state = step(state, imgs, labels)  # apply
    moved = any(np.abs(a - np.asarray(b)).max() > 0
                for a, b in zip(e0, jax.tree.leaves(state.ema_params)))
    assert moved


def test_ema_off_keeps_none():
    step, state = _ema_setup(0.0)
    assert state.ema_params is None
    imgs, labels = _batch(np.random.default_rng(0))
    state = step(state, imgs, labels)
    assert state.ema_params is None


def test_ema_trainer_checkpoint_layout_and_resume(tmp_path):
    """EMA checkpoints serve what they scored: variables.params = the EMA
    tree (what evaluate() ran), raw_params = the training params; resume
    restores both; a non-EMA resume takes the raw tree."""
    import os

    from tests.fixtures import make_fake_coco
    from yolov4_tpu.engine.trainer import Trainer

    root = str(tmp_path / "coco")
    make_fake_coco(root, "train2017", n_images=8, seed=0)
    make_fake_coco(root, "val2017", n_images=2, seed=1)

    cfg = _trainer_cfg(tmp_path, "out_ema", max_epochs=1)
    cfg["TRAIN"]["EMA_DECAY"] = 0.8
    trainer = Trainer(cfg, root)
    trainer.fit()
    assert trainer.state.ema_params is not None

    ckpt = os.path.join(cfg["TRAIN"]["OUTPUT_DIR"], "checkpoint.ckpt")
    raw = ckpt_lib.load_checkpoint_raw(ckpt)
    assert "raw_params" in raw
    assert raw["meta"]["ema_decay"] == 0.8
    # variables.params == the EMA tree; raw_params == the training tree
    for a, b in zip(jax.tree.leaves(raw["variables"]["params"]),
                    jax.tree.leaves(trainer.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(raw["raw_params"]),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # load_variables (what val/detect/serve call) returns the EMA weights
    lv = ckpt_lib.load_variables(ckpt)
    for a, b in zip(jax.tree.leaves(lv["params"]),
                    jax.tree.leaves(trainer.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume with EMA on: both trees restored
    cfg2 = _trainer_cfg(tmp_path, "out_ema2", max_epochs=2)
    cfg2["TRAIN"]["EMA_DECAY"] = 0.8
    t2 = Trainer(cfg2, root, resume=ckpt)
    for a, b in zip(jax.tree.leaves(t2.state.params),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(t2.state.ema_params),
                    jax.tree.leaves(trainer.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume with EMA OFF: training continues from the raw tree
    cfg3 = _trainer_cfg(tmp_path, "out_ema3", max_epochs=2)
    t3 = Trainer(cfg3, root, resume=ckpt)
    assert t3.state.ema_params is None
    for a, b in zip(jax.tree.leaves(t3.state.params),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multiscale_trainer_buckets(tmp_path):
    """TRAIN.MULTISCALE: per-segment deterministic size draws, one
    compiled step per distinct size, loader batches arrive at the step's
    shape (the reference's dead RANDOM_RESIZE path, build.py:105-107)."""
    import json
    import os

    from tests.fixtures import make_fake_coco
    from yolov4_tpu.engine.trainer import Trainer

    root = str(tmp_path / "coco")
    make_fake_coco(root, "train2017", n_images=16, seed=0)
    make_fake_coco(root, "val2017", n_images=2, seed=1)

    cfg = _trainer_cfg(tmp_path, "out_ms", max_epochs=1)
    cfg["TRAIN"].update(MULTISCALE=[32, 64], MULTISCALE_EVERY=1)
    trainer = Trainer(cfg, root)
    trainer.print_freq = 1
    # the draw is deterministic and process-independent
    sizes = [trainer._ms_size_for(0, i) for i in range(2)]
    assert sizes == [trainer._ms_size_for(0, i) for i in range(2)]
    assert set(sizes) <= {32, 64}
    trainer.fit()
    # one compiled bucket per distinct size used (+ the base size built
    # at init)
    assert set(trainer._train_steps) >= set(sizes)
    records = [json.loads(l) for l in open(
        os.path.join(cfg["TRAIN"]["OUTPUT_DIR"], "metrics.jsonl"))]
    tr = [r for r in records if r["kind"] == "train"]
    assert len(tr) == 2 and all(np.isfinite(r["loss"]) for r in tr)
