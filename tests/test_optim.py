"""Optimizer / LR schedule tests — schedule parity vs actual torch
schedulers driven exactly as the reference main loop drives them
(main_amp.py:190-204, lr_schedulers/build.py:17-50)."""

import numpy as np
import pytest

from yolov4_tpu.config import load_config
from yolov4_tpu.optim import build_lr_schedule, build_optimizer
from yolov4_tpu.optim.optimizers import decay_mask


def _reference_lr_trace(cfg, len_epoch, max_epochs):
    """Simulate the reference's LR handling with real torch schedulers."""
    import torch

    base_lr = float(cfg["OPTIMIZER"]["LR"])
    sched_cfg = cfg["LR_SCHEDULER"]
    is_warmup = sched_cfg["IS_WARMUP"]
    warmup = int(sched_cfg["WARMUP_EPOCH"])

    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([param], lr=base_lr)
    if sched_cfg["TYPE"] == "MultiStepLR":
        milestones = [m - warmup for m in sched_cfg["MILESTONES"]] if is_warmup \
            else list(sched_cfg["MILESTONES"])
        sch = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=milestones, gamma=float(sched_cfg["GAMMA"]))
    else:
        t_max = max_epochs - warmup if is_warmup else max_epochs
        sch = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=t_max, eta_min=float(sched_cfg["MINIMAL_LR"]))

    lrs = []
    for epoch in range(max_epochs):
        for step in range(len_epoch):
            if is_warmup and epoch < warmup:
                lr = base_lr * float(1 + step + epoch * len_epoch) / (warmup * len_epoch)
                for group in opt.param_groups:
                    group["lr"] = lr
            lrs.append(opt.param_groups[0]["lr"])
        if not is_warmup or epoch >= warmup:
            sch.step()
    return np.asarray(lrs)


@pytest.mark.parametrize("sched_type", ["MultiStepLR", "CosineAnnealingLR"])
@pytest.mark.parametrize("is_warmup", [True, False])
def test_schedule_parity_vs_torch(sched_type, is_warmup):
    cfg = load_config()
    cfg["LR_SCHEDULER"]["TYPE"] = sched_type
    cfg["LR_SCHEDULER"]["IS_WARMUP"] = is_warmup
    cfg["LR_SCHEDULER"]["MILESTONES"] = [8, 12, 14]
    cfg["TRAIN"]["MAX_EPOCHS"] = 16
    len_epoch = 7

    want = _reference_lr_trace(cfg, len_epoch, 16)
    schedule = build_lr_schedule(cfg, len_epoch)
    got = np.array([float(schedule(s)) for s in range(16 * len_epoch)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_warmup_endpoints():
    cfg = load_config()  # warmup 5, lr 3e-4, milestones 50/70/80
    len_epoch = 100
    schedule = build_lr_schedule(cfg, len_epoch)
    assert float(schedule(0)) == pytest.approx(3e-4 / 500)
    assert float(schedule(499)) == pytest.approx(3e-4)
    assert float(schedule(500)) == pytest.approx(3e-4)       # post warmup
    assert float(schedule(50 * 100)) == pytest.approx(3e-5)  # epoch 50 decayed
    assert float(schedule(80 * 100)) == pytest.approx(3e-7)


def test_decay_mask_structure():
    params = {
        "backbone": {
            "stem": {
                "conv": {"kernel": np.zeros((3, 3, 3, 4))},
                "norm": {"scale": np.zeros(4), "bias": np.zeros(4)},
            },
        },
        "head": {"yolo1_1": {"conv": {"kernel": np.zeros((1, 1, 4, 8)),
                                      "bias": np.zeros(8)}}},
        "classifier": {"kernel": np.zeros((4, 10)), "bias": np.zeros(10)},
    }
    mask = decay_mask(params, no_bias=True, no_norm=True)
    assert mask["backbone"]["stem"]["conv"]["kernel"] is True
    assert mask["backbone"]["stem"]["norm"]["scale"] is False
    assert mask["backbone"]["stem"]["norm"]["bias"] is False
    assert mask["head"]["yolo1_1"]["conv"]["bias"] is False
    assert mask["classifier"]["kernel"] is True
    assert mask["classifier"]["bias"] is False

    mask_all = decay_mask(params, no_bias=False, no_norm=False)
    assert mask_all["backbone"]["stem"]["norm"]["scale"] is True
    assert mask_all["head"]["yolo1_1"]["conv"]["bias"] is True


def test_adam_matches_torch_step():
    """One optimizer step parity vs torch.optim.Adam."""
    import torch

    cfg = load_config()
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    g = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)
    lr = 3e-4

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([p], lr=lr)
    p.grad = torch.from_numpy(g.copy())
    opt.step()
    opt.zero_grad()
    p.grad = torch.from_numpy((2 * g).copy())
    opt.step()
    want = p.detach().numpy()

    import jax.numpy as jnp
    import optax
    params = {"conv": {"kernel": jnp.asarray(w0)}}
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    for gg in (g, 2 * g):
        grads = {"conv": {"kernel": jnp.asarray(gg)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = optax.tree_utils.tree_scale(-lr, updates)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["conv"]["kernel"]), want,
                               rtol=1e-5, atol=1e-7)
