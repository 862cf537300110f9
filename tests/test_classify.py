"""Classification app tests (data pipeline + LR schedule semantics)."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from yolov4_tpu.classify.data import (ImageFolderDataset, RandAugment,
                                      random_resized_crop, resize_center_crop)
from yolov4_tpu.classify.trainer import classifier_lr_schedule, smoothed_ce


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("imagenet"))
    rng = np.random.default_rng(0)
    for split, n in [("train", 3), ("val", 2)]:
        for cls in ("alpha", "beta"):
            d = os.path.join(root, split, cls)
            os.makedirs(d)
            for i in range(n):
                Image.fromarray(
                    rng.integers(0, 255, (70, 90, 3), np.uint8)).save(
                        os.path.join(d, f"{i}.jpg"))
    return root


def test_image_folder_dataset(image_root):
    ds = ImageFolderDataset(f"{image_root}/train", crop_size=64, is_train=True,
                            seed=0)
    assert len(ds) == 6
    assert ds.class_to_idx == {"alpha": 0, "beta": 1}
    img, target = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert target["label"] in (0, 1)

    val = ImageFolderDataset(f"{image_root}/val", crop_size=64, val_size=72,
                             is_train=False)
    img, _ = val[0]
    assert img.shape == (64, 64, 3)


def test_randaugment_all_ops():
    rng = random.Random(0)
    ra = RandAugment(num_ops=2, magnitude=9)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8))
    space = ra._space(64)
    for name, mag in space:
        out = ra._apply(img, name, mag, rng)
        assert out.size == img.size, name
    for _ in range(20):
        out = ra(img, rng)
        assert out.size == img.size


def test_geometry_helpers():
    img = Image.fromarray(np.zeros((100, 150, 3), np.uint8))
    out = random_resized_crop(img, 64, random.Random(0))
    assert out.size == (64, 64)
    out = resize_center_crop(img, 72, 64)
    assert out.size == (64, 64)


def test_classifier_lr_schedule_matches_reference_formula():
    """reference darknet/main_amp.py:518-546."""
    base, len_epoch = 0.05, 20
    sched = classifier_lr_schedule(base, len_epoch)

    def ref(epoch, step):
        if epoch < 60:
            f = 0
        elif epoch < 90:
            f = 1
        elif epoch < 110:
            f = 2
        else:
            f = 3
        lr = base * 0.1 ** f
        if epoch < 5:
            lr = lr * float(1 + step + epoch * len_epoch) / (5.0 * len_epoch)
        return lr

    for epoch in [0, 2, 4, 5, 30, 59, 60, 89, 90, 109, 110, 119]:
        for step in [0, 7, 19]:
            got = float(sched(epoch * len_epoch + step))
            assert got == pytest.approx(ref(epoch, step), rel=1e-6), (epoch, step)


def test_smoothed_ce_value():
    import jax.numpy as jnp
    logits = jnp.asarray([[10.0, -10.0]])
    labels = jnp.asarray([0])
    # smoothing 0.1 over 2 classes: target [0.95, 0.05]
    loss = float(smoothed_ce(logits, labels, 2, smoothing=0.1))
    import numpy as np
    logp = np.log(np.exp([10.0, -10.0]) / np.exp([10.0, -10.0]).sum())
    want = -(0.95 * logp[0] + 0.05 * logp[1])
    assert loss == pytest.approx(want, rel=1e-5)


@pytest.fixture(scope="module")
def trainer_root(tmp_path_factory):
    """Enough images that an 8-virtual-device local batch survives
    drop_last (the trainer's local batch is batch_size * n_local_devices)."""
    root = str(tmp_path_factory.mktemp("imagenet_big"))
    rng = np.random.default_rng(1)
    for split, n in [("train", 10), ("val", 5)]:
        for cls in ("alpha", "beta"):
            d = os.path.join(root, split, cls)
            os.makedirs(d)
            for i in range(n):
                Image.fromarray(
                    rng.integers(0, 255, (48, 56, 3), np.uint8)).save(
                        os.path.join(d, f"{i}.jpg"))
    return root


def test_trainer_wire_layouts_equivalent(trainer_root):
    """The flat wire transfer (s2d / planar packing, decode_cls_wire) is a
    pure transport change: one train step and one validation pass must
    produce identical numbers in every layout. (The s2d wire feeds the
    fused stem via input_s2d — byte reorder on host, zero relayout ops on
    device; the NHWC path packs the same values in-program.)"""
    from yolov4_tpu.classify.trainer import ClassifierTrainer

    results = {}
    for layout in ("nhwc", "planar", "s2d"):
        tr = ClassifierTrainer(
            trainer_root, batch_size=1, epochs=1, workers=0, crop_size=32,
            val_size=40, num_classes=2, seed=3, width=0.25, depth=0.25,
            output_dir="/tmp/cls_out_test", transfer_layout=layout)
        assert tr.layout == layout
        tr.train_loader.set_epoch(0)
        imgs, target = next(iter(tr.train_loader))
        u8, labels = tr._put(imgs, target["label"])
        state = tr.train_step(tr.state, u8, labels)
        tr.state = state
        results[layout] = (float(state.loss), tr.validate())
    base = results["nhwc"]
    for layout in ("planar", "s2d"):
        assert results[layout][0] == pytest.approx(base[0], rel=1e-6), layout
        assert results[layout][1] == base[1], layout


def test_cls_trainer_writes_metrics_jsonl(trainer_root, tmp_path):
    """The classifier trainer writes the same machine-readable scalar sink
    as the detection Trainer (OUTPUT_DIR/metrics.jsonl)."""
    import json

    from yolov4_tpu.classify.trainer import ClassifierTrainer

    out = str(tmp_path / "out")
    tr = ClassifierTrainer(
        trainer_root, batch_size=1, epochs=1, workers=0, crop_size=32,
        val_size=40, num_classes=2, seed=0, width=0.25, depth=0.25,
        output_dir=out, print_freq=1)
    tr.fit()
    path = os.path.join(out, "metrics.jsonl")
    assert os.path.isfile(path)
    records = [json.loads(line) for line in open(path)]
    kinds = {r["kind"] for r in records}
    assert kinds == {"train", "eval"}
    train_rec = next(r for r in records if r["kind"] == "train")
    assert {"ts", "epoch", "step", "loss", "lr", "img_s"} <= set(train_rec)
    ev = next(r for r in records if r["kind"] == "eval")
    assert {"prec1", "prec5", "best_prec1"} <= set(ev)
    # epoch is 1-based, the same convention as the detection trainer's
    # metrics.jsonl (one schema across both sinks)
    assert train_rec["epoch"] == 1 and ev["epoch"] == 1
    # best_prec1 in the record equals the attribute save() maintains
    assert ev["best_prec1"] == tr.best_prec1


@pytest.fixture(scope="module")
def striped_root(tmp_path_factory):
    """Two geometrically separable classes: horizontal vs vertical stripes
    (orientation survives RandAugment's photometric ops, unlike brightness
    or color cues)."""
    root = str(tmp_path_factory.mktemp("stripes"))
    rng = np.random.default_rng(7)
    for split, n in [("train", 32), ("val", 8)]:
        for cls in ("horizontal", "vertical"):
            d = os.path.join(root, split, cls)
            os.makedirs(d)
            for i in range(n):
                img = np.full((48, 48, 3), 40, np.uint8)
                phase = int(rng.integers(0, 8))
                idx = (np.arange(48) + phase) // 4 % 2 == 0
                if cls == "horizontal":
                    img[idx, :, :] = 215
                else:
                    img[:, idx, :] = 215
                img = np.clip(img.astype(np.int16)
                              + rng.integers(-25, 25, img.shape), 0,
                              255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(d, f"{i}.jpg"))
    return root


def test_cls_trainer_learns_held_out(striped_root, tmp_path):
    """End-to-end classification learning proof on HELD-OUT images
    (synthetic analogue of the detector's generalization smoke): the full
    production trainer (RandAugment pipeline, smoothed CE, Adam, warmup
    LR, best-prec1 checkpointing) must beat chance by a wide margin on
    images it never saw. Also exercises the --prof hook (reference
    darknet/main_amp.py:350-427): steps [10, 12) land in a trace."""
    from yolov4_tpu.classify.trainer import ClassifierTrainer

    out = str(tmp_path / "out")
    # config swept empirically on this exact environment: sync_bn is
    # REQUIRED at local batch 1 (global 8 over the virtual mesh) — without
    # it per-device BN stats see a single image and the model never beats
    # chance; lr 0.4 -> base_lr 0.4 * 8/256 = 0.0125 (5-epoch warmup)
    tr = ClassifierTrainer(
        striped_root, batch_size=1, epochs=8, workers=0, crop_size=32,
        val_size=40, num_classes=2, seed=0, width=0.25, depth=0.25,
        lr=0.4, sync_bn=True,
        output_dir=out, print_freq=4, profile_steps=2)
    best_prec1 = tr.fit()
    # chance = 50; the orientation cue is trivially separable
    assert best_prec1 >= 85.0, best_prec1
    # the profiler window produced an on-disk trace
    prof_dir = os.path.join(out, "profile")
    assert os.path.isdir(prof_dir) and len(os.listdir(prof_dir)) > 0
    # best checkpoint exists (backbone source for BACKBONE_PRETRAINED)
    assert os.path.isfile(os.path.join(out, "model_best.ckpt"))


def test_cls_preemption_mid_epoch_resume(striped_root, tmp_path):
    """Classifier analogue of the detection preemption proof: kill the
    trainer mid-epoch (checkpoint_every_steps=1), resume from the rolling
    mid-epoch checkpoint, and the remaining steps reproduce the
    uninterrupted run exactly (per-step loss, final params/BN stats)."""
    import json

    from yolov4_tpu.classify.trainer import ClassifierTrainer

    kw = dict(batch_size=1, epochs=2, workers=0, crop_size=32, val_size=40,
              num_classes=2, seed=0, width=0.25, depth=0.25, print_freq=1)
    # striped_root: 32 train/class = 64 imgs, global batch 8 -> 8 steps/ep

    def records(out):
        path = os.path.join(out, "metrics.jsonl")
        return {json.loads(l)["step"]: json.loads(l) for l in open(path)
                if json.loads(l)["kind"] == "train"}

    out_a = str(tmp_path / "a")
    tr_a = ClassifierTrainer(striped_root, output_dir=out_a, **kw)
    tr_a.fit()
    rec_a = records(out_a)
    assert int(tr_a.state.step) == 16

    # preempted DURING step 12 (epoch 2, batch 4): rolling ckpt = step 11
    out_b = str(tmp_path / "b")
    tr_b = ClassifierTrainer(striped_root, output_dir=out_b,
                             checkpoint_every_steps=1, **kw)
    real_step, calls = tr_b.train_step, 0

    def preemptible(state, u8, labels):
        nonlocal calls
        if calls == 11:
            raise RuntimeError("preempted")
        calls += 1
        return real_step(state, u8, labels)

    tr_b.train_step = preemptible
    with pytest.raises(RuntimeError, match="preempted"):
        tr_b.fit()
    ckpt = os.path.join(out_b, "checkpoint.ckpt")
    meta = json.load(open(ckpt + ".meta.json"))
    assert meta["mid_epoch"] and meta["epoch"] == 1 \
        and meta["batch_index"] == 3 and meta["step"] == 11, meta

    out_c = str(tmp_path / "c")
    tr_c = ClassifierTrainer(striped_root, output_dir=out_c, resume=ckpt,
                             **kw)
    assert tr_c.start_epoch == 1 and tr_c._resume_skip == 3
    assert int(tr_c.state.step) == 11
    tr_c.fit()
    rec_c = records(out_c)

    assert set(rec_c) == set(range(12, 17)), sorted(rec_c)
    for s in rec_c:
        np.testing.assert_allclose(rec_a[s]["loss"], rec_c[s]["loss"],
                                   rtol=1e-5)
    import jax
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        tr_a.state.params, tr_c.state.params)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        tr_a.state.batch_stats, tr_c.state.batch_stats)


def test_pack_decode_wire_roundtrip():
    """decode_cls_wire(pack_cls_wire(x)) reproduces the NHWC normalize
    exactly for every layout (values and positions)."""
    import jax.numpy as jnp
    from yolov4_tpu.classify.trainer import (decode_cls_wire,
                                             normalize_images, pack_cls_wire)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
    want = np.asarray(normalize_images(jnp.asarray(imgs)))
    for layout in ("nhwc", "planar"):
        flat = pack_cls_wire(imgs, layout)
        got = np.asarray(decode_cls_wire(jnp.asarray(flat), 8, layout))
        np.testing.assert_array_equal(got, want)
    # s2d stays in the stem layout: undo the space-to-depth to compare
    flat = pack_cls_wire(imgs, "s2d")
    got = np.asarray(decode_cls_wire(jnp.asarray(flat), 8, "s2d"))
    got = got.reshape(2, 4, 4, 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    got = got.reshape(2, 8, 8, 3)
    np.testing.assert_array_equal(got, want)
