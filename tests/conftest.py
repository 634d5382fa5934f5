"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding paths (trinity_tpu.parallel) are tested on a virtual
CPU mesh, per SURVEY.md §4(c). The axon TPU plugin ignores the JAX_PLATFORMS
environment variable, so the backend is forced via jax.config before any
backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
