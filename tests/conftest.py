"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding paths (trinity_tpu.parallel) are tested on a virtual
CPU mesh, per SURVEY.md §4(c). The axon TPU plugin ignores the JAX_PLATFORMS
environment variable, so the backend is forced via jax.config before any
backend initialization.
"""

import os
import resource

# XLA:CPU compiles big interpret-mode Pallas programs on the calling
# thread; LLVM's recursive passes have segfaulted late in the suite with
# the default 8 MiB stack (observed at two different tests). The main
# thread's stack grows up to RLIMIT_STACK on Linux, so raise it.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 << 20
if _soft != resource.RLIM_INFINITY and _soft < _want:
    new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (new, _hard))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU has segfaulted compiling a (per-module innocuous) program
    late in the full suite — an accumulated-JIT-state crash, reproducible
    only with hundreds of prior compilations in one process. Dropping the
    compiled-program caches between modules bounds that state; modules
    recompile their own programs anyway."""
    yield
    jax.clear_caches()
