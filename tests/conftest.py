"""Test configuration: force an 8-device virtual CPU backend.

Multi-chip sharding logic (pointcloudregistration_tpu/parallel/*) is tested on
a single host using XLA's virtual-device trick — the standard JAX technique
for exercising pjit/shard_map collectives without a pod (SURVEY.md §4e).

Note: this environment presets JAX_PLATFORMS=axon (TPU tunnel) via
sitecustomize, so the env var alone is not enough — we must also override the
config after importing jax, before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled-program memory after each test module.

    A full one-process run accumulates 150+ jitted XLA programs; on the
    8-virtual-device CPU backend that pressure ended round 2's suite with a
    hard segfault inside backend_compile at ~test 143. Dropping the
    per-module caches keeps the process bounded so one pytest command runs
    the whole suite.
    """
    yield
    jax.clear_caches()
