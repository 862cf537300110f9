"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest first), so the
environment variables are set at module import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# On a 1-CPU host the 8 virtual devices execute nearly serially, so they
# can reach a collective's rendezvous more than 40 s (XLA's default hard
# limit) apart — XLA then LOG(FATAL)s the whole process from
# AllGatherThunk. Raise the limit; correctness is unaffected.
if "collective_call_terminate_timeout" not in _flags:
    _flags += " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
os.environ["XLA_FLAGS"] = _flags

os.environ.setdefault("YOLOV4_TPU_PLATFORM", "cpu")

# setup_jax: forces the CPU platform (the TPU plugin ignores
# JAX_PLATFORMS=cpu from the env) and enables the persistent compilation
# cache under a per-machine CPU subdirectory, so suite reruns on the same
# box skip recompiles (the full suite is compile-dominated).
from yolov4_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
