"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

TPU hardware is single-chip in CI; multi-chip sharding is validated on
virtual CPU devices (the driver separately dry-runs the multichip path).

The axon sitecustomize sets ``jax_platforms = "axon,cpu"`` via jax.config
(which overrides the JAX_PLATFORMS env var), so the config must be forced
back to cpu here, before any backend is initialised — otherwise every test
dispatches to the remote TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A full single-process run compiles 500+ XLA:CPU programs (several
    of them large while_loop pipelines); holding them all live has
    produced process-state-dependent segfaults deep into the run (the
    crashing executable passes in isolation every time).  The persistent
    on-disk compile cache makes the re-tracing cheap."""
    yield
    jax.clear_caches()
