#!/usr/bin/env python3
"""CSPDarknet53 ImageNet pretraining CLI
(reference darknet/main_amp.py surface).

Usage:
    python darknet_pretrain.py ./imagenet/ -b 128 --lr 0.1 --epochs 120 \
        [--resume CKPT] [-e] [--opt-level O1]

The best checkpoint (outputs/cspdarknet53/model_best.ckpt) plugs into
detector training via MODEL.BACKBONE_PRETRAINED.
"""

from __future__ import annotations

import argparse

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()


def parse_args():
    parser = argparse.ArgumentParser(
        description="TPU CSPDarknet53 ImageNet Training")
    parser.add_argument("data", metavar="DIR",
                        help="dataset root with train/ and val/ subdirs")
    parser.add_argument("-b", "--batch-size", type=int, default=128,
                        help="per-device batch size")
    parser.add_argument("--lr", "--learning-rate", type=float, default=0.1,
                        dest="lr", help="base LR, scaled by global_batch/256")
    parser.add_argument("--epochs", type=int, default=120)
    parser.add_argument("-j", "--workers", type=int, default=4)
    parser.add_argument("--crop-size", type=int, default=256)
    parser.add_argument("--val-size", type=int, default=288)
    parser.add_argument("--num-classes", type=int, default=1000)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("-e", "--evaluate", action="store_true")
    parser.add_argument("--print-freq", type=int, default=10)
    parser.add_argument("--opt-level", type=str, default="O1",
                        choices=["O0", "O1", "O2", "O3"])
    parser.add_argument("--sync_bn", action="store_true",
                        help="cross-replica BatchNorm statistics "
                             "(reference darknet/main_amp.py:147-150)")
    parser.add_argument("--output-dir", type=str,
                        default="./outputs/cspdarknet53")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--transfer-layout", type=str, default="s2d",
                        choices=["s2d", "planar", "nhwc"],
                        help="host->device image wire format (flat s2d/"
                             "planar packing avoids the NHWC lane-pad "
                             "transfer tax; nhwc = debug)")
    parser.add_argument("--prof", type=int, default=0, metavar="N",
                        help="capture a jax.profiler trace over N train "
                             "steps starting at step 10 (reference nvtx "
                             "window, darknet/main_amp.py:350-427); trace "
                             "lands in OUTPUT_DIR/profile")
    parser.add_argument("--checkpoint-every-steps", type=int, default=0,
                        metavar="N",
                        help="preemption-safe mid-epoch checkpointing: "
                             "roll the full state into checkpoint.ckpt "
                             "every N steps; resume re-enters the same "
                             "epoch at the next batch (0 = per-epoch "
                             "saves only)")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from yolov4_tpu.classify.trainer import ClassifierTrainer
    from yolov4_tpu.utils.logging import setup_logging

    setup_logging(jax.process_index(), output_dir=args.output_dir)
    dtype = jnp.float32 if args.opt_level == "O0" else jnp.bfloat16
    trainer = ClassifierTrainer(
        args.data, batch_size=args.batch_size, lr=args.lr, epochs=args.epochs,
        workers=args.workers, crop_size=args.crop_size, val_size=args.val_size,
        num_classes=args.num_classes, output_dir=args.output_dir,
        print_freq=args.print_freq, resume=args.resume, compute_dtype=dtype,
        seed=args.seed, sync_bn=args.sync_bn,
        transfer_layout=args.transfer_layout, profile_steps=args.prof,
        checkpoint_every_steps=args.checkpoint_every_steps)
    return trainer.fit(evaluate_only=args.evaluate)


if __name__ == "__main__":
    main()
