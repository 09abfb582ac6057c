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
