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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding for input arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
