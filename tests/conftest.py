"""Test configuration: force the CPU backend with 8 virtual devices.

The multi-chip sharding paths are exercised on a virtual CPU mesh, and unit
tests must not dispatch every op over the axon TPU tunnel. The environment
pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon, so plain env-var
edits are too late — use jax.config, which takes effect until the backend
is first touched.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
