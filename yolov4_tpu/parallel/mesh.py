"""Device mesh construction.

The reference's only parallelism is NCCL data parallelism via apex DDP
(main_amp.py:94-131). The TPU-native equivalent is a 1-D ``jax.sharding.
Mesh`` over all chips with the batch sharded on the 'data' axis; gradient
averaging is an XLA ``pmean`` over ICI inside the compiled step (no process
groups, no explicit allreduce calls). For multi-host pods, call
``jax.distributed.initialize()`` once at program start (initialize_runtime)
and every process builds the same global mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_runtime(coordinator: Optional[str] = None) -> None:
    """Multi-host bring-up (torch.distributed.init_process_group
    equivalent). No-op single-host."""
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)


def create_mesh(devices: Optional[Sequence] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def coordinator_lockstep(name: str, timeout_s: int = 1200) -> None:
    """Bring all processes into lockstep via the coordinator's KV-store
    barrier (NOT a device collective; the timeout is explicit and long).

    XLA:CPU's gloo backend creates a communicator context the first time a
    compiled program's collective executes, with a HARDCODED ~30 s
    key-exchange timeout. Two processes compiling the same program
    concurrently on slow/contended hosts can reach that first execution
    >30 s apart, and the whole job dies with "Gloo context initialization
    failed: DEADLINE_EXCEEDED". Calling this between COMPILING a
    collective program and first DISPATCHING it shrinks the skew to
    barrier-exit jitter. No-op single-process, and a plain device-sync
    fallback if no coordinator client exists."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # initialized some other way; best effort
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"lockstep_{name}")
        return
    client.wait_at_barrier(f"yolov4_lockstep_{name}", timeout_s * 1000)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding for input arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
