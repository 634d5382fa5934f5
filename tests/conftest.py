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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test, excluded from the quick tier "
        '(`-m "not slow"`, ~5 min; full suite ~30 min — see CLAUDE.md)',
    )


# Quick-tier exclusions, chosen from measured `--durations` of the full
# suite on this 1-core host (VERDICT r3 item 9). Every excluded module has
# quick siblings covering the same component; the full suite remains the
# pre-round-end gate. "*" = whole module; otherwise test-name prefixes.
_SLOW = {}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        names = _SLOW.get(os.path.basename(str(item.fspath)))
        if names and (
            "*" in names or any(item.name.startswith(n) for n in names)
        ):
            item.add_marker(_pytest.mark.slow)
