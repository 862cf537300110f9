"""Process-level JAX runtime setup shared by all CLIs and the benchmark.

Enables the persistent XLA compilation cache: first-time compiles of the
full detector go through a remote-compile service in some TPU environments
(minutes); cached reloads take seconds.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def setup_jax(cache_dir: str | None = None, enable_x64: bool = False) -> None:
    # Must run BEFORE jax initializes: on a 1-CPU host, virtual multi-device
    # CPU runs (xla_force_host_platform_device_count, e.g. the driver's
    # multichip dryrun) execute the per-device programs nearly serially, and
    # XLA LOG(FATAL)s the process if devices reach a collective rendezvous
    # more than 40 s (its default hard limit) apart.
    flags = os.environ.get("XLA_FLAGS", "")
    if ("xla_force_host_platform_device_count" in flags
            and "collective_call_terminate_timeout" not in flags):
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_cpu_collective_call_terminate_timeout_seconds=3600")

    import jax

    # The environment's TPU plugin ignores JAX_PLATFORMS from the env; this
    # honored escape hatch forces a backend (e.g. YOLOV4_TPU_PLATFORM=cpu
    # for smoke tests on hosts whose chips are busy). JAX_PLATFORMS=cpu is
    # also re-asserted through the config so that host-only dryruns (e.g.
    # the driver's virtual multi-chip check) actually land on CPU.
    platform = os.environ.get("YOLOV4_TPU_PLATFORM")
    if not platform and os.environ.get("JAX_PLATFORMS") == "cpu":
        platform = "cpu"
    if platform:
        jax.config.update("jax_platforms", platform)

    if enable_x64:  # was a silently-ignored parameter before
        jax.config.update("jax_enable_x64", True)

    cache_dir = cache_dir or os.environ.get("YOLOV4_TPU_JAX_CACHE", _DEFAULT_CACHE)
    # XLA:CPU AOT executables are host-machine-specific (loading an entry
    # compiled on a different box spams machine-feature-mismatch errors and
    # risks SIGILL), and this environment moves between hosts across rounds
    # — so CPU-platform runs cache under a per-machine subdirectory. TPU
    # executables target the chip, not the host; they stay shared.
    if platform == "cpu" or "xla_force_host_platform_device_count" in flags:
        cache_dir = os.path.join(cache_dir, f"cpu-{_machine_key()}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it


def _machine_key() -> str:
    """Short fingerprint of the host CPU's feature set."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform as _platform

    return hashlib.sha1(_platform.processor().encode()).hexdigest()[:12]
