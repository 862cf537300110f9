#!/usr/bin/env python3
"""Training CLI (reference main_amp.py surface).

Usage:
    python train.py COCO -c configs/yolov4_Tianxiaomo.cfg \
        [--resume outputs/.../checkpoint.ckpt] [-e] [--print-freq 10] \
        [--opt-level O0|O1] [--seed 0]

vs the reference (main_amp.py:34-58):
  * no torch.distributed.launch — one process per HOST, all local chips
    used automatically via the device mesh (multi-host: --coordinator),
  * --opt-level maps apex AMP levels onto the compute dtype: O0 -> float32,
    O1/O2/O3 -> bfloat16 (TPUs need no loss scaling),
  * --sync_bn is accepted for CLI parity; like the reference's YOLO path it
    is not applied (BN is per-replica; SURVEY discrepancy #8),
  * resume restores the optimizer/scheduler state for real.
"""

from __future__ import annotations

import argparse

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()


def parse_args():
    parser = argparse.ArgumentParser(description="TPU YOLOv4 Training")
    parser.add_argument("data", metavar="DIR", help="path to COCO dataset root")
    parser.add_argument("-c", "--cfg", type=str,
                        default="configs/yolov4_default.cfg")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint to resume from")
    parser.add_argument("-e", "--evaluate", action="store_true",
                        help="evaluate on val2017 and exit")
    parser.add_argument("--print-freq", type=int, default=10)
    parser.add_argument("--profile", type=int, default=0, metavar="N",
                        help="capture a jax.profiler trace of N steps "
                             "(reference --prof nvtx equivalent)")
    parser.add_argument("--opt-level", type=str, default=None,
                        choices=["O0", "O1", "O2", "O3"],
                        help="apex-style precision: O0=float32, O1+=bfloat16")
    parser.add_argument("--sync_bn", action="store_true",
                        help="accepted for parity; not applied (per-replica BN)")
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--channels-last", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="accepted for parity; NHWC is native on TPU "
                             "(disable with --no-channels-last)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port for multi-host jax.distributed")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    from yolov4_tpu.config import load_config
    from yolov4_tpu.engine.trainer import Trainer
    from yolov4_tpu.parallel.mesh import initialize_runtime
    from yolov4_tpu.utils.logging import setup_logging, get_logger

    initialize_runtime(args.coordinator)
    setup_logging(jax.process_index())
    logger = get_logger(__name__)

    cfg = load_config(args.cfg)
    if args.opt_level is not None:
        cfg["MODEL"]["COMPUTE_DTYPE"] = (
            "float32" if args.opt_level == "O0" else "bfloat16")
    if args.sync_bn:
        logger.warning("--sync_bn requested: not applied (per-replica BN, "
                       "matching the reference YOLO trainer)")
    if args.deterministic:
        # XLA TPU programs are deterministic for this workload; host-side
        # randomness (shuffling, augmentation) is already seed-derived.
        # This pins the base seed like the reference's torch.manual_seed
        # (main_amp.py:81-85).
        import random as _random

        import numpy as _np
        _random.seed(args.seed)
        _np.random.seed(args.seed)
        logger.info(f"deterministic mode: base seed {args.seed}")

    # re-init logging with the output dir now that cfg is loaded
    setup_logging(jax.process_index(), output_dir=cfg["TRAIN"]["OUTPUT_DIR"])
    logger.info(f"config: {args.cfg}, compute {cfg['MODEL']['COMPUTE_DTYPE']}")

    trainer = Trainer(cfg, args.data, resume=args.resume,
                      print_freq=args.print_freq, seed=args.seed,
                      profile_steps=args.profile,
                      evaluate_only=args.evaluate)
    return trainer.fit(evaluate_only=args.evaluate)


if __name__ == "__main__":
    main()
