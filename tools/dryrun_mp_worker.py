"""Subprocess worker for __graft_entry__.dryrun_multichip's multi-process
phase (one instance per process).

The reference's production mode is multi-PROCESS data parallelism
(torch.distributed.launch --nproc_per_node=4, main_amp.py:94-131), so the
driver artifact must exercise cross-process collectives, not just a
single-process multi-device mesh. Each worker brings up gloo CPU
collectives over a localhost coordinator, joins the global 'data' mesh,
runs one shard_map train step (cross-process grad pmean) fed via
make_array_from_process_local_data, a mesh-sharded GSPMD eval (fwd+NMS),
and a rank-0 checkpoint that every process then reads back.

Usage: dryrun_mp_worker.py PID NPROCS PORT DEVICES_PER_PROC OUT_DIR
Prints MPDRY sentinel lines the parent parses; any assert kills the
worker and fails the phase via its exit code.
"""

import os
import sys

PID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = sys.argv[3]
DEV_PER_PROC = int(sys.argv[4])
OUT_DIR = sys.argv[5]

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={DEV_PER_PROC} "
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
assert len(jax.devices()) == DEV_PER_PROC * NPROCS, jax.devices()

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from yolov4_tpu.config import load_config  # noqa: E402
from yolov4_tpu.engine.predictor import Predictor  # noqa: E402
from yolov4_tpu.models import build_model  # noqa: E402
from yolov4_tpu.models.yolov4 import init_variables  # noqa: E402
from yolov4_tpu.ops.loss import build_criterion  # noqa: E402
from yolov4_tpu.optim import build_lr_schedule, build_optimizer  # noqa: E402
from yolov4_tpu.parallel import (create_mesh, create_train_state,  # noqa: E402
                                 make_train_step)
from yolov4_tpu.parallel.mesh import DATA_AXIS, coordinator_lockstep  # noqa: E402
from yolov4_tpu.utils import checkpoint as ckpt_lib  # noqa: E402

n_global = DEV_PER_PROC * NPROCS

cfg = load_config()
cfg["MODEL"]["COMPUTE_DTYPE"] = "float32"
if os.environ.get("YOLOV4_DRYRUN_FULL") != "1":
    cfg["MODEL"]["WIDTH"] = 0.25
    cfg["MODEL"]["DEPTH"] = 0.25
model = build_model(cfg)
variables = init_variables(model, jax.random.PRNGKey(0), 64)
criterion = build_criterion(cfg)
tx = build_optimizer(cfg, variables["params"])
schedule = build_lr_schedule(cfg, len_epoch=10)
mesh = create_mesh()  # ALL global devices across both processes
assert mesh.devices.size == n_global, mesh.devices.size
step = make_train_step(model, criterion, tx, schedule, mesh,
                       accumulation_steps=1)
state = create_train_state(variables, tx)

sharding = NamedSharding(mesh, P(DATA_AXIS))
rng = np.random.default_rng(100 + PID)  # DIFFERENT data per process
local_imgs = rng.uniform(0, 1, (DEV_PER_PROC, 64, 64, 3)).astype(np.float32)
local_labels = np.zeros((DEV_PER_PROC, 60, 5), np.float32)
local_labels[:, 0] = [20, 30, 10, 12, 5]
imgs = jax.make_array_from_process_local_data(sharding, local_imgs)
labels = jax.make_array_from_process_local_data(sharding, local_labels)

# gloo's communicator context has a hardcoded ~30 s key-exchange timeout
# on FIRST collective execution; bring compiles into lockstep first
# COMPILE FIRST, then lockstep, then dispatch (coordinator_lockstep's
# contract): on a 1-CPU host the two workers' compiles run serialized,
# so a pre-compile lockstep leaves the whole (possibly minutes-long)
# compile INSIDE gloo's hardcoded ~30 s first-collective key-exchange
# window — observed "Gloo context initialization failed:
# DEADLINE_EXCEEDED" right after a full-width single-process phase.
# The .lower().compile() populates the persistent cache, so the step()
# call's own compile is a seconds-fast reload on every process.
step.lower(state, imgs, labels).compile()
coordinator_lockstep("dryrun_mp_train_compile")
state = step(state, imgs, labels)
loss = float(state.loss)
assert np.isfinite(loss), loss
print(f"MPDRY step pid={PID} loss={loss:.6f}", flush=True)

cfg["TEST"]["IMGSIZE"] = 64
cfg["TEST"]["PRE_NMS_TOPK"] = 64
cfg["TEST"]["MAX_DETS"] = 10
predictor = Predictor(
    cfg, variables={"params": state.params,
                    "batch_stats": state.batch_stats},
    img_size=64, batch_size=DEV_PER_PROC, mesh=mesh)
det, valid = predictor(local_imgs)
assert det.shape == (DEV_PER_PROC, 10, 7), det.shape
print(f"MPDRY eval pid={PID} rows={int(valid.sum())}", flush=True)

# rank-0 checkpoint, then every process reads it back (barrier first so
# non-primary processes can't race the write)
if jax.process_index() == 0:
    ckpt_lib.save_checkpoint(
        {"variables": {"params": state.params,
                       "batch_stats": state.batch_stats},
         "opt_state": state.opt_state},
        is_best=False, output_dir=OUT_DIR)
coordinator_lockstep("dryrun_mp_ckpt")
raw = ckpt_lib.load_checkpoint_raw(os.path.join(OUT_DIR, "checkpoint.ckpt"))
assert "variables" in raw and "opt_state" in raw, list(raw)
print(f"MPDRY done pid={PID}", flush=True)
