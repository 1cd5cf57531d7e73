"""Test configuration: force CPU with 8 virtual devices, full precision.

Tests never require real TPU hardware; sharding tests use a virtual 8-device
CPU mesh (xla_force_host_platform_device_count). Matmul precision is pinned
to 'highest' so float32 parity checks against the torch oracle are exact to
~1e-5 instead of bf16 noise.
"""

import os

# NOTE: the image's sitecustomize pre-imports jax and pins
# jax_platforms="axon,cpu" (the tunneled TPU), so plain env vars are
# ignored by the time conftest runs; force the CPU backend through
# jax.config instead. XLA_FLAGS is still read lazily at CPU-client
# creation, so the virtual device count env works.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 8 virtual devices share this image's ONE physical core, so devices
    # reach a collective minutes apart; the default 20s/40s rendezvous
    # timeouts abort the whole process (SIGABRT in rendezvous.cc) on any
    # cross-device collective (e.g. the train step's batch-roll permute).
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

# Persistent XLA compilation cache: the CPU backend serializes executables,
# so repeated suite runs skip the (single-core, minutes-long) compiles.
from devc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
