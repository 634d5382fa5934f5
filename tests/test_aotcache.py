"""Persistent compiled-executable cache (utils/aotcache.py).

The reference executes any query shape with zero compile cost
(exec.cpp:662-666); aot_jit gives a fresh process the same property where
the backend honors executable deserialization: compiled executables persist
to disk and later processes (or later _AotJit instances) load instead of
recompiling. Measured on the axon TPU backend: load ~0.06 s vs compile
4.2 s for the combined batch program (client side).
"""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from trinity_tpu.config import configure, get_config
from trinity_tpu.utils.aotcache import _AotJit, aot_jit
from trinity_tpu.utils.metrics import get_metrics


@pytest.fixture
def aot_dir(tmp_path):
    old = get_config().aot_cache_dir
    configure(aot_cache_dir=str(tmp_path / "aot"))
    try:
        yield str(tmp_path / "aot")
    finally:
        configure(aot_cache_dir=old)


def _counter(name):
    return get_metrics().snapshot().get(name, {}).get("value", 0)


def _fn(x):
    return (x * 2.0 + 1.0).sum()


def test_disabled_is_plain_jit():
    configure(aot_cache_dir="")
    f = aot_jit(_fn, "t_disabled")
    x = jnp.arange(8.0)
    assert float(f(x)) == float(_fn(np.arange(8.0)))
    assert not f._loaded  # never touched the cache machinery


def test_compile_persists_then_loads(aot_dir):
    x = jnp.arange(16.0)
    before_c = _counter("aot.compiled")
    f1 = aot_jit(_fn, "t_persist", 16)
    r1 = float(f1(x))
    assert _counter("aot.compiled") == before_c + 1

    # a FRESH wrapper with the same key (a new process in miniature) loads
    # the serialized executable instead of compiling
    before_l = _counter("aot.loaded")
    f2 = aot_jit(_fn, "t_persist", 16)
    r2 = float(f2(x))
    if _counter("aot.load_failed") == 0:
        assert _counter("aot.loaded") == before_l + 1
    assert r1 == r2


def test_distinct_keys_do_not_collide(aot_dir):
    x = jnp.arange(4.0)
    g = aot_jit(lambda v: (v + 1.0).sum(), "t_a", 1)
    h = aot_jit(lambda v: (v + 2.0).sum(), "t_b", 1)
    assert float(g(x)) != float(h(x))


def test_concurrent_calls_compile_once(aot_dir):
    """Warmup drives the workload on a thread pool: N concurrent calls that
    resolve to the same variant must pay ONE compile (per-variant lock)."""
    before = _counter("aot.compiled")
    f = aot_jit(_fn, "t_conc", 99)
    x = jnp.arange(32.0)
    errs = []

    def run():
        try:
            f(x)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=run) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert _counter("aot.compiled") == before + 1


def test_avals_partition_the_cache(aot_dir):
    f = aot_jit(_fn, "t_avals")
    before = _counter("aot.compiled")
    f(jnp.arange(8.0))
    f(jnp.arange(12.0))  # different shape -> different executable
    assert _counter("aot.compiled") == before + 2
    f(jnp.arange(8.0))  # hits the in-process _loaded map
    assert _counter("aot.compiled") == before + 2
