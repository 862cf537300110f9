#!/usr/bin/env python3
"""Detection serving CLI: dynamic-batching HTTP server on the compiled
TPU serving program.

Usage:
    python serve.py --cfg configs/yolov4_Tianxiaomo.cfg \
        --ckpt outputs/model_best.ckpt [--port 8000] [--sizes 608,416] \
        [--batch-size 16] [--max-wait-ms 8] [--quant int8_static] \
        [--conf-thre 0.25] [--nms-thre 0.45]

    curl -s -X POST --data-binary @bus.jpg \
        'http://127.0.0.1:8000/v1/detect?size=608'

No reference equivalent (deployment there is the per-image detect.py CLI);
see yolov4_tpu/serve/ for the runtime design. Checkpoints may be native
.ckpt or the reference's torch .pth.tar (auto-converted).
"""

from __future__ import annotations

import argparse

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

from yolov4_tpu.config import load_config
from yolov4_tpu.serve import ServingRuntime, make_server
from yolov4_tpu.utils import checkpoint as ckpt_lib
from yolov4_tpu.utils.logging import setup_logging, get_logger


def parse_args():
    parser = argparse.ArgumentParser(description="TPU YOLOv4 serving.")
    parser.add_argument("--cfg", type=str,
                        default="configs/yolov4_default.cfg")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint (.ckpt or reference .pth.tar)")
    parser.add_argument("--artifact", type=str, default=None,
                        help="comma-separated exported .y4x serving "
                             "artifacts (tools/export_serving.py) — serve "
                             "straight from the files, no model code/"
                             "config/checkpoint; overrides --cfg/--ckpt")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--sizes", type=str, default=None,
                        help="comma-separated input-size buckets, first is "
                             "the default (default: cfg TEST.IMGSIZE)")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--max-wait-ms", type=float, default=8.0,
                        help="max time a request waits for batchmates")
    parser.add_argument("--inflight", type=int, default=3,
                        help="dispatched-but-unfetched batch window")
    parser.add_argument("--request-timeout-s", type=float, default=120.0,
                        help="per-request server-side completion deadline")
    parser.add_argument("--mesh", action="store_true",
                        help="shard each serving batch over all local "
                             "devices (GSPMD-partitioned program; "
                             "batch-size is per process)")
    parser.add_argument("--conf-thre", type=float, default=0.25,
                        help="bucket detection threshold (requests may "
                             "raise it per call via ?conf=); default 0.25 "
                             "— a serving-appropriate cut, NOT the cfg "
                             "TEST.CONFTHRE AP-sweep threshold (0.005), "
                             "which floods responses with near-noise rows; "
                             "pass any negative value to opt into the cfg "
                             "eval threshold (match val.py output exactly)")
    parser.add_argument("--nms-thre", type=float, default=-0.1)
    parser.add_argument("--quant", choices=("none", "int8", "int8_static"),
                        default=None,
                        help="serving quantization (int8* faster, not "
                             "reference-exact)")
    return parser.parse_args()


def main():
    args = parse_args()
    setup_logging(0)
    logger = get_logger(__name__)
    if args.artifact:
        ignored = [name for name, val, default in (
            ("--ckpt", args.ckpt, None), ("--sizes", args.sizes, None),
            ("--quant", args.quant, None), ("--mesh", args.mesh, False),
            ("--batch-size", args.batch_size, 16),
            ("--conf-thre", args.conf_thre, 0.25),
            ("--nms-thre", args.nms_thre, -0.1),
        ) if val != default]
        if ignored:
            logger.warning(
                f"--artifact serves the baked program: {', '.join(ignored)} "
                f"have no effect (batch/size/thresholds/quant are fixed at "
                f"export time; re-export to change them)")
        paths = [p for p in args.artifact.split(",") if p]
        runtime = ServingRuntime.from_artifacts(
            paths, max_wait_ms=args.max_wait_ms, inflight=args.inflight,
            request_timeout_s=args.request_timeout_s)
        logger.info(f"serving {len(paths)} artifact bucket(s) "
                    f"{runtime.sizes} (baked weights + thresholds)")
    else:
        cfg = load_config(args.cfg)
        if args.quant is not None:
            cfg["MODEL"]["QUANT"] = args.quant
        # conf defaults to a serving cut (0.25); a NEGATIVE value opts
        # into the cfg TEST.CONFTHRE eval threshold (serve exactly what
        # val.py scored — at 0.005 that's near-noise rows up to max_dets
        # per image, an operator choice, not a default). nms falls back
        # to cfg TEST.NMSTHRE like the val/detect CLIs.
        conf_thre = (cfg["TEST"]["CONFTHRE"] if args.conf_thre < 0
                     else args.conf_thre)
        nms_thre = (cfg["TEST"]["NMSTHRE"] if args.nms_thre < 0
                    else args.nms_thre)
        sizes = ([int(s) for s in args.sizes.split(",")] if args.sizes
                 else [cfg["TEST"]["IMGSIZE"]])

        variables = None
        if args.ckpt:
            variables = ckpt_lib.load_variables(args.ckpt)
            logger.info(f"loaded checkpoint {args.ckpt}")
        else:
            logger.warning("no --ckpt given: serving RANDOM weights")

        mesh = None
        if args.mesh:
            from yolov4_tpu.parallel.mesh import create_mesh
            mesh = create_mesh()
        runtime = ServingRuntime(
            cfg, variables=variables, sizes=sizes,
            batch_size=args.batch_size, max_wait_ms=args.max_wait_ms,
            inflight=args.inflight, conf_thre=conf_thre,
            nms_thre=nms_thre, request_timeout_s=args.request_timeout_s,
            mesh=mesh)
        logger.info(f"warming {len(sizes)} bucket(s) {sizes} at batch "
                    f"{args.batch_size}, conf {conf_thre}, nms {nms_thre} "
                    f"(first compile of a new shape can take minutes; "
                    f"cached shapes are seconds)...")

    import signal

    def _term(signum, frame):  # containers stop with SIGTERM
        raise KeyboardInterrupt

    # installed BEFORE the warmup compile: an orchestrator SIGTERM during
    # the multi-minute first compile must take the graceful path too
    signal.signal(signal.SIGTERM, _term)
    srv = None
    try:
        runtime.start(warmup=True)
        srv = make_server(runtime, host=args.host, port=args.port)
        logger.info(f"serving on http://{args.host}:"
                    f"{srv.server_address[1]} — "
                    f"POST /v1/detect /v1/detect_raw, "
                    f"GET /healthz /metrics /stats /v1/config")
        srv.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
    finally:
        if srv is not None:
            srv.shutdown()
        runtime.close()


if __name__ == "__main__":
    main()
