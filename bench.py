#!/usr/bin/env python3
"""End-to-end inference benchmark (north star: preproc + model + NMS
images/sec/chip at 608x608, COCO eval protocol shapes).

Per batch, the measured pipeline is exactly what a serving loop does:
  host stretch-resize (cv2, thread pool) -> FLAT uint8 upload (flat avoids
  the 3->128 lane-padding transfer tax) -> on-device /255 normalize +
  YOLOv4 bf16 forward + anchor decode + class-wise NMS -> fixed-shape
  detections fetched to host.

Host preprocessing and uploads overlap device execution (async dispatch,
results fetched one batch behind).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput number (BASELINE.md), so
vs_baseline is null.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from yolov4_tpu.utils.jax_setup import setup_jax

setup_jax()

import cv2  # noqa: E402
import jax  # noqa: E402

from yolov4_tpu.config import load_config  # noqa: E402
from yolov4_tpu.engine.predictor import Predictor  # noqa: E402


def make_sources(n: int, seed: int = 0):
    """Synthetic 'decoded camera frames' of varied sizes (BGR uint8)."""
    rng = np.random.default_rng(seed)
    sizes = [(480, 640), (720, 1280), (576, 768), (1080, 810)]
    out = []
    for i in range(n):
        h, w = sizes[i % len(sizes)]
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        for _ in range(6):
            x, y = int(rng.integers(0, w - 60)), int(rng.integers(0, h - 60))
            cv2.rectangle(img, (x, y), (x + 50, y + 40),
                          tuple(int(c) for c in rng.integers(0, 255, 3)), -1)
        out.append(img)
    return out


def ensure_backend() -> bool:
    """Bounded grace window for `axon` tunnel outages (observed: hours-long).

    A dead tunnel doesn't error fast — backend init can HANG >10 min, and
    jax caches a failed init for the life of the process. So the FIRST
    device contact happens in a timeout-bounded SUBPROCESS probe; only
    after one succeeds does this process touch the backend. Returns False
    if no probe succeeds before the deadline (YOLOV4_BENCH_WAIT_S,
    default 600 s).

    The per-probe timeout (YOLOV4_BENCH_PROBE_S, default 540 s) must
    cover a COLD compile of the probe matmul through the remote-compile
    service (5-10 min for model programs, less for a 2x2 matmul, but a
    short timeout would kill a healthy-but-cold backend mid-compile
    forever — the cache entry is only written when the compile finishes).
    """
    import os
    import subprocess
    code = ("from yolov4_tpu.utils.jax_setup import setup_jax; setup_jax();"
            "import jax, jax.numpy as jnp, numpy as np;"
            "np.asarray(jnp.ones((2,2)) @ jnp.ones((2,2)))")
    deadline = time.time() + float(os.environ.get("YOLOV4_BENCH_WAIT_S", "600"))
    probe_s = float(os.environ.get("YOLOV4_BENCH_PROBE_S", "540"))
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run([sys.executable, "-c", code], check=True,
                           timeout=probe_s, capture_output=True)
            return True
        except Exception:
            if time.time() >= deadline:
                return False
            print(f"backend probe {attempt} failed; retrying in 30s "
                  f"({int(deadline - time.time())}s left)", file=sys.stderr)
            time.sleep(30)


# repo-root-anchored: the driver may invoke bench.py from any cwd, and the
# committed seed (+ updates from successful runs) must stay findable
import os as _os

LAST_RESULT_PATH = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "bench_last.json")


def emit_backend_down(img_size: int):
    """Tunnel still dead after the grace window: emit ONE honest JSON line.

    value=0 states the literal truth (a dead backend serves 0 img/s);
    backend_unavailable distinguishes it from a measured regression, and
    last_recorded carries the most recent SUCCESSFUL run's full result
    (stamped with its own time/source) so the scoreboard keeps the
    hardware-meaningful rates.
    """
    result = {
        "metric": f"coco_e2e_images_per_sec_per_chip_{img_size}",
        "value": 0.0,
        "unit": "images/sec",
        "vs_baseline": None,
        "backend_unavailable": True,
        "note": "axon tunnel down for the whole grace window; "
                "see docs/PERF.md for measured device-resident rates",
    }
    try:
        with open(LAST_RESULT_PATH) as f:
            result["last_recorded"] = json.load(f)
    except Exception:
        pass
    print(json.dumps(result))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--img-size", type=int, default=608)
    parser.add_argument("--batch-size", type=int, default=16)
    # 120 iters -> 12 measurement windows (~2-4 min): the shared tunnel
    # drifts 2-4x over minutes-long congestion episodes (observed 12-40
    # img/s across runs of identical programs), so the median needs to
    # sample a span longer than one episode
    parser.add_argument("--iters", type=int, default=120)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--conf-thre", type=float, default=0.005)
    parser.add_argument("--nms-thre", type=float, default=0.4)
    parser.add_argument("--preproc-threads", type=int, default=8)
    return parser.parse_args()


def main(args=None):
    args = args or parse_args()
    size, batch = args.img_size, args.batch_size

    cfg = load_config()
    predictor = Predictor(cfg, img_size=size, batch_size=batch,
                          conf_thre=args.conf_thre, nms_thre=args.nms_thre)

    sources = make_sources(64)
    pool = ThreadPoolExecutor(args.preproc_threads)

    def _resize(frame):
        return cv2.resize(frame[:, :, ::-1], (size, size),
                          interpolation=cv2.INTER_LINEAR)

    def preprocess_batch(i):
        chunk = [sources[(i * batch + j) % len(sources)] for j in range(batch)]
        return np.stack(list(pool.map(_resize, chunk)))

    # compile (uint8 variant) + warmup; always dispatch at least once so
    # --warmup 0 still compiles before the throwaway window (and the sync
    # below has a value to fetch — dispatch() may return 2 or 3 outputs
    # depending on the relevant-count config)
    for i in range(max(args.warmup, 1)):
        out = predictor.dispatch(preprocess_batch(i))
    np.asarray(out[0])

    # The shared-tunnel environment is noisy: measure several windows and
    # report the median (per-window rates go to stderr). Several batches
    # stay in flight so host preprocessing + tunnel uploads/fetches overlap
    # device execution (the tunnel adds 100s of ms of latency per transfer;
    # depth-1 pipelining left the chip idle between batches).
    from collections import deque

    def window(n_iters, depth=4):
        t0 = time.time()
        inflight = deque()
        for i in range(n_iters):
            inflight.append(predictor.dispatch(preprocess_batch(i)))
            if len(inflight) > depth:
                np.asarray(inflight.popleft()[1])
        while inflight:
            np.asarray(inflight.popleft()[1])
        return n_iters * batch / (time.time() - t0)

    windows = max(3, args.iters // 10)
    per_window = max(5, args.iters // windows)
    window(3)  # throwaway: tunnel/queue warm-up beyond program compile
    rates = [window(per_window) for _ in range(windows)]
    print(f"windows (img/s): {[round(r, 1) for r in rates]}", file=sys.stderr)
    images_per_sec = float(np.median(rates))
    result = {
        "metric": f"coco_e2e_images_per_sec_per_chip_{size}",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": None,
    }

    # --- device-resident rates (the hardware-meaningful numbers the shared
    # tunnel hides: e2e above is upload-bandwidth-bound and its windows
    # drift 2-4x with tunnel congestion; docs/PERF.md). Extra fields only —
    # the primary metric stays the honest end-to-end number.
    result.update(device_rates(predictor, preprocess_batch, batch, size))
    print(json.dumps(result))
    try:
        with open(LAST_RESULT_PATH, "w") as f:
            json.dump({"recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                    time.gmtime()),
                       "source": "bench.py successful run",
                       "result": result}, f, indent=1)
    except Exception as e:  # noqa: BLE001
        print(f"could not persist last result: {e!r}", file=sys.stderr)
    return result


def device_rates(predictor, preprocess_batch, batch, size):
    """Device-resident fwd+decode+NMS and train-step rates.

    The inference window reuses the EXACT program the e2e loop compiled
    (Predictor._run, uint8 flat input) with the input staged on device, so
    no transfer and no new compile is involved. The train step compiles the
    standard 608/b8 training program (persistent-cache warm in normal
    operation; YOLOV4_BENCH_TRAIN=0 skips it). Any failure degrades to
    null fields — the primary e2e metric is already computed.
    """
    import os

    import jax
    import jax.numpy as jnp

    extra = {"device_fwd_nms_img_s": None, "device_fwd_nms_ms_b%d" % batch: None,
             "train_step_ms_608_b8": None, "train_img_s_608_b8": None}
    try:
        from yolov4_tpu import native
        frame = preprocess_batch(0)
        pack = (native.pack_s2d_u8 if getattr(predictor, "_s2d_wire", False)
                else native.pack_planar_u8)
        flat = pack(frame).reshape(batch, -1)
        dev = jax.block_until_ready(jnp.asarray(flat))
        v, ct, nt = predictor.variables, predictor.conf_thre, predictor.nms_thre

        def dev_window(iters=20):
            # value-fetch sync: block_until_ready can return early on this
            # backend even for plain repeated dispatches (PERF.md rule #4)
            t0 = time.time()
            for _ in range(iters):
                out = predictor._run(v, dev, ct, nt)
            np.asarray(jax.tree.leaves(out)[0][0, 0, 0])
            return (time.time() - t0) / iters * 1000.0

        dev_window(3)
        ms = float(np.median([dev_window() for _ in range(5)]))
        extra["device_fwd_nms_ms_b%d" % batch] = round(ms, 2)
        extra["device_fwd_nms_img_s"] = round(batch / (ms / 1000.0), 1)
    except Exception as e:  # noqa: BLE001 — never endanger the primary metric
        print(f"device fwd+NMS measurement failed: {e!r}", file=sys.stderr)

    # int8_static serving preset rate (opt-in serving mode, PERF.md):
    # measured in a TIMEOUT-BOUNDED subprocess so a cold compilation
    # cache can never blow the driver's bench budget — on a cache-warm
    # box it adds ~2 min, on a cold one it's killed and the field stays
    # null. YOLOV4_BENCH_QUANT_S=0 skips it.
    extra["device_fwd_nms_int8_static_img_s"] = None
    try:
        # 900 s: the subprocess re-uploads the full weights (~250 MB),
        # which alone can take minutes when the shared tunnel is congested
        # (observed: the same cache-warm run takes 3.5 min quiet, >10 min
        # congested)
        quant_s = float(os.environ.get("YOLOV4_BENCH_QUANT_S", "900"))
    except ValueError:
        quant_s = 0.0  # malformed value = skip, never lose the e2e metric
    if quant_s > 0:
        import subprocess
        try:
            proc = subprocess.run(
                [sys.executable, "tools/bench_device.py", "--parts",
                 "serve", "--quant", "int8_static", "--json",
                 "--img-size", str(size), "--batch", str(batch),
                 "--conf-thre", str(predictor.conf_thre),
                 "--nms-thre", str(predictor.nms_thre)],
                cwd=_os.path.dirname(LAST_RESULT_PATH), timeout=quant_s,
                capture_output=True, text=True)
            if proc.returncode != 0:
                print(f"int8_static bench_device rc={proc.returncode}: "
                      f"{proc.stderr.strip()[-500:]}", file=sys.stderr)
            else:
                data = json.loads(proc.stdout.strip().splitlines()[-1])
                ms = next(iter(data["results"].values()))
                extra["device_fwd_nms_int8_static_img_s"] = round(
                    data["batch"] / (ms / 1000.0), 1)
        except Exception as e:  # noqa: BLE001
            print(f"int8_static measurement skipped: {e!r}", file=sys.stderr)

    if os.environ.get("YOLOV4_BENCH_TRAIN", "1") != "1":
        return extra
    try:
        from yolov4_tpu.config import load_config as _lc
        from yolov4_tpu.models import build_model
        from yolov4_tpu.models.yolov4 import init_variables
        from yolov4_tpu.ops.loss import build_criterion
        from yolov4_tpu.optim import build_lr_schedule, build_optimizer
        from yolov4_tpu.parallel import (create_mesh, create_train_state,
                                         make_train_step)

        s, tb = 608, 8
        cfg = _lc()
        model = build_model(cfg)
        variables = init_variables(model, jax.random.PRNGKey(0), s)
        tx = build_optimizer(cfg, variables["params"])
        # input_layout="s2d" = the Trainer's production default wire format
        step = make_train_step(model, build_criterion(cfg), tx,
                               build_lr_schedule(cfg, len_epoch=100),
                               create_mesh(jax.devices()[:1]), img_size=s,
                               input_layout="s2d")
        state = create_train_state(variables, tx)
        rng = np.random.default_rng(0)
        flat = jnp.asarray(rng.random((tb, s * s * 3)), jnp.float32)
        labels = np.zeros((tb, 60, 5), np.float32)
        labels[:, 0] = [100, 100, 40, 40, 3]
        labels = jnp.asarray(labels)

        # the step donates its state, and on this backend block_until_ready
        # over donated outputs can return before the device finishes (trace
        # showed 47.5 ms/step where full-state blocking measured 28).
        # FETCHING a param VALUE cannot lie: the optimizer writes it at the
        # very end of the step, and np.asarray must produce real data.
        leaves0 = jax.tree.leaves(state.params)
        small_leaf = min(range(len(leaves0)), key=lambda i: leaves0[i].size)

        def train_window(state, iters=10):
            t0 = time.time()
            for _ in range(iters):
                state = step(state, flat, labels)
            np.asarray(jax.tree.leaves(state.params)[small_leaf])
            return (time.time() - t0) / iters * 1000.0, state

        _, state = train_window(state, iters=2)  # compile + warm
        ms_w = []
        for _ in range(5):
            ms, state = train_window(state)
            ms_w.append(ms)
        ms = float(np.median(ms_w))
        extra["train_step_ms_608_b8"] = round(ms, 2)
        extra["train_img_s_608_b8"] = round(tb / (ms / 1000.0), 1)
    except Exception as e:  # noqa: BLE001
        print(f"train-step measurement failed: {e!r}", file=sys.stderr)
    return extra


if __name__ == "__main__":
    # parse BEFORE probing: --help must not probe the backend, and the
    # fallback metric name must reflect the requested size (incl. the
    # --img-size=N form)
    _args = parse_args()
    if ensure_backend():
        main(_args)
    else:
        emit_backend_down(_args.img_size)
