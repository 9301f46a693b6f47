"""Test configuration: force CPU platform with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU behavior is
exercised separately by bench.py and the driver's compile checks.

Note: this environment's sitecustomize force-registers a remote TPU
backend (JAX_PLATFORMS=axon) in every interpreter, overriding the
JAX_PLATFORMS env var — so the platform must be pinned via jax.config
*after* import, before any computation. Compiles that accidentally route
through the remote-TPU tunnel take minutes instead of seconds.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
