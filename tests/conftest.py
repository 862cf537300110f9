"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest first), so the
environment variables are set at module import time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin ignores JAX_PLATFORMS=cpu from the env;
# forcing via config works.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
