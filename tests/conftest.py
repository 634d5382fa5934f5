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
        '(`-m "not slow"`, ~10 min; full suite ~39 min — see CLAUDE.md)',
    )


# Quick-tier budget (VERDICT r4 item 9): tests whose MEASURED call time is
# >= _SLOW_SECS are marked slow, from the checked-in duration table
# (tests/.durations.json, regenerated from any full `--durations=0` run —
# r5 measured 2333 s total; the >=7 s cut measured 10.9 min quick
# with every module retaining quick coverage). Tests absent from the table
# (i.e. new ones) default to QUICK so regressions surface immediately;
# _ALWAYS_QUICK pins named regression guards into the quick tier
# regardless of cost. The full suite remains the pre-round-end gate.
_SLOW_SECS = 7.0
_ALWAYS_QUICK = {
    # the r4 empty-shard/mask-only posmask regression class (VERDICT r4
    # item 1) must stay in the tier that runs after every change
    "test_posmask_empty_and_maskonly_segments",
}


def _load_durations():
    import json

    path = os.path.join(os.path.dirname(__file__), ".durations.json")
    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        return {}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    durations = _load_durations()
    for item in items:
        nodeid = f"{item.fspath.basename}::{item.name}"
        rec = durations.get(f"tests/{nodeid}", 0.0)
        if rec >= _SLOW_SECS and item.name not in _ALWAYS_QUICK:
            item.add_marker(_pytest.mark.slow)
