"""Subprocess worker for the 2-process multi-host test (run by
tests/test_multihost.py, one instance per process).

Exercises the code paths that only execute when jax.process_count() > 1 —
the reference's whole DDP runtime surface (main_amp.py:94-131):

  * jax.distributed.initialize over a localhost coordinator, CPU backend
    with gloo cross-process collectives, 4 virtual devices per process;
  * engine.evaluator._gather_rows (detection-row allgather) directly, with
    distinct per-process rows;
  * the full Trainer.fit flow: process-sharded loaders ->
    make_array_from_process_local_data train batches -> shard_map train
    step over the 2-process/8-device mesh (cross-process grad pmean) ->
    mesh-sharded Predictor eval -> validate() (gather, sync_global_devices
    barrier, COCOEvaluator on the primary, broadcast_one_to_all) ->
    rank-0 checkpoint.

Prints MHOK sentinel lines the pytest parses; any assert kills the worker
and fails the test via its exit code.
"""

import os
import sys

PID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = sys.argv[3]
DATA_ROOT = sys.argv[4]
OUT_DIR = sys.argv[5]
UNEVEN_ROOT = sys.argv[6] if len(sys.argv) > 6 else None

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    "--xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["YOLOV4_TPU_PLATFORM"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov4_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=NPROCS, process_id=PID)
assert jax.process_count() == NPROCS, jax.process_count()
assert len(jax.devices()) == 4 * NPROCS, jax.devices()

import numpy as np  # noqa: E402


def check_gather_rows():
    """_gather_rows with distinct per-process rows/ids -> both see the
    union (and unequal per-process counts exercise the padding path)."""
    from yolov4_tpu.engine.evaluator import _gather_rows

    rows = [{"image_id": 100 + PID, "category_id": 1 + PID,
             "bbox": [1.0 * PID, 2.0, 3.0, 4.0], "score": 0.5 + PID}]
    if PID == 0:  # unequal counts: exercises max-pad + per-process trim
        rows.append({"image_id": 77, "category_id": 3,
                     "bbox": [5.0, 6.0, 7.0, 8.0], "score": 0.25})
    ids = [100 + PID] + ([77] if PID == 0 else [])
    all_rows, all_ids = _gather_rows(rows, ids)
    assert sorted(all_ids) == [77, 100, 101], all_ids
    assert len(all_rows) == 3, all_rows
    got = {(r["image_id"], r["category_id"], round(r["score"], 3))
           for r in all_rows}
    assert got == {(100, 1, 0.5), (77, 3, 0.25), (101, 2, 1.5)}, got
    print(f"MHOK gather pid={PID} rows={len(all_rows)}", flush=True)


def run_trainer():
    from yolov4_tpu.config import load_config
    from yolov4_tpu.engine.trainer import Trainer

    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, COMPUTE_DTYPE="float32")
    cfg["DATA"].update(BATCH_SIZE=1, WORKERS=0)
    cfg["TRAIN"].update(IMGSIZE=64, MAX_EPOCHS=1, ACCUMULATION_STEPS=1,
                        OUTPUT_DIR=OUT_DIR)
    cfg["TEST"].update(IMGSIZE=64, BATCH_SIZE=4, PRE_NMS_TOPK=64,
                       MAX_DETS=10, CONFTHRE=0.005)

    trainer = Trainer(cfg, DATA_ROOT, seed=0)
    assert trainer.train_loader is not None
    n_local = len(trainer.train_loader)
    ap50_95, ap50 = trainer.fit()
    loss = float(trainer.state.loss)
    assert np.isfinite(loss), loss
    # broadcast_one_to_all: every process must hold the primary's stats
    print(f"MHOK fit pid={PID} batches={n_local} loss={loss:.4f} "
          f"ap50={ap50:.6f} ap={ap50_95:.6f}", flush=True)
    if PID == 0:
        ckpt = os.path.join(OUT_DIR, "checkpoint.ckpt")
        assert os.path.isfile(ckpt), ckpt
        print(f"MHOK ckpt pid=0 bytes={os.path.getsize(ckpt)}", flush=True)


def check_quant_calibrate():
    """int8_static auto-calibration over the 2-process mesh: the batch
    enters through the global input sharding, the calib program compiles
    under the coordinator lockstep, and the cross-process allgather-max
    leaves IDENTICAL scales on every process (each feeds different
    images here, so equality proves the reduction ran)."""
    from yolov4_tpu.config import load_config
    from yolov4_tpu.engine.predictor import Predictor
    from yolov4_tpu.parallel.mesh import create_mesh

    cfg = load_config()
    cfg["MODEL"].update(WIDTH=0.25, DEPTH=0.25, QUANT="int8_static")
    cfg["TEST"].update(IMGSIZE=64, PRE_NMS_TOPK=64, MAX_DETS=10)
    pred = Predictor(cfg, img_size=64, batch_size=4, mesh=create_mesh())
    imgs = np.random.default_rng(100 + PID).random(
        (4, 64, 64, 3)).astype(np.float32)
    det, valid = pred(imgs)  # dispatch -> multi-process auto-calibrate
    assert pred._quant_ready and "quant" in pred.variables
    assert det.shape[-1] == 7, det.shape
    scales = jax.tree.leaves(jax.device_get(pred.variables["quant"]))
    fp = float(sum(np.asarray(s, np.float64).sum() for s in scales))
    print(f"MHOK quant pid={PID} scalesum={fp:.9e}", flush=True)


def check_uneven_eval(root):
    """Sharded eval of a dataset whose size is NOT divisible by
    process_count (7 imgs / 2 procs): the per-process loaders wrap-pad, so
    one image is predicted on BOTH processes and validate() must dedup the
    wrapped copies. An oracle predictor (emits the GT boxes) makes the
    check non-vacuous: dedup working => AP exactly equals the
    single-process run the pytest side computes (~1.0); dedup broken =>
    the duplicate image double-counts its GTs / adds duplicate FPs and AP
    drops."""
    from tests.test_evaluator import DistinctScoreOracle, LoaderWithHook
    from yolov4_tpu.config import load_config
    from yolov4_tpu.data.coco import COCODataset
    from yolov4_tpu.data.pipeline import DataLoader
    from yolov4_tpu.data.transforms import Transform
    from yolov4_tpu.engine.evaluator import validate

    cfg = load_config()
    ds = COCODataset(root, "val2017", img_size=128, is_train=False,
                     transform=Transform(cfg, is_train=False))
    assert len(ds) % NPROCS != 0, (len(ds), NPROCS)
    loader = DataLoader(ds, batch_size=2, shuffle=False,
                        process_index=PID, process_count=NPROCS)
    pred = DistinctScoreOracle()
    ap, ap50 = validate(LoaderWithHook(loader, pred), pred, verbose=False)
    print(f"MHOK uneven pid={PID} n={len(ds)} ap={ap:.9f} ap50={ap50:.9f}",
          flush=True)


def check_classifier(root):
    """ClassifierTrainer over the 2-process mesh: validate() used to mix
    globally-replicated params into a plain single-process jit (crash),
    and the val loader was not process-sharded. Now each process scores
    its shard and the in-program sum reduces across the mesh. The val
    split is UNEVEN (5 imgs / 2 procs) so the wrap-pad dedup mask is
    exercised: with the model init seeded, the pre-train prec1/prec5 must
    exactly equal a single-process run the pytest side computes — a
    double-counted wrapped image would shift the counts."""
    import jax.numpy as jnp

    from yolov4_tpu.classify.trainer import ClassifierTrainer

    tr = ClassifierTrainer(
        root, batch_size=1, epochs=1, workers=0, crop_size=16, val_size=20,
        num_classes=2, seed=0, width=0.25, depth=0.25, sync_bn=True,
        compute_dtype=jnp.float32, print_freq=100,
        output_dir=os.path.join(OUT_DIR, f"cls{PID}"))
    assert len(tr.val_ds) % NPROCS != 0, (len(tr.val_ds), NPROCS)
    prec1, prec5 = tr.validate()  # untrained: seeded-init oracle
    print(f"MHOK clseval pid={PID} prec1={prec1:.9f} prec5={prec5:.9f}",
          flush=True)
    best = tr.fit()  # full epoch: sharded train -> sharded eval -> save
    loss = float(tr.state.loss)
    assert np.isfinite(loss), loss
    print(f"MHOK clsfit pid={PID} best={best:.9f} loss={loss:.6f}",
          flush=True)


check_gather_rows()
check_quant_calibrate()
if UNEVEN_ROOT:
    check_uneven_eval(UNEVEN_ROOT)
CLS_ROOT = sys.argv[7] if len(sys.argv) > 7 else None
if CLS_ROOT:
    check_classifier(CLS_ROOT)
run_trainer()
print(f"MHOK done pid={PID}", flush=True)
