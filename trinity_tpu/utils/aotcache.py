"""Persistent compiled-executable cache — the warmup killer.

The reference executes any query shape with zero compile cost
(exec.cpp:662-666: the query "compiler" is a cheap host-side pass). Here
every (tape, geometry) program variant XLA-compiles once per process, and on
the axon TPU backend the persistent compilation cache does NOT capture
Mosaic kernels — so every serving process re-paid 40-400 s per variant of
remote compiles (921 s of bench warmup in round 2).

This module serializes COMPILED executables
(jax.experimental.serialize_executable — the payload embeds the lowered
device binary) keyed by (program key, input avals, backend, device kind,
jax version, a source digest of the package). A fresh process
deserializes+loads an executable in ~0.2 s instead of recompiling
(measured cross-process on the axon backend). The source digest
invalidates the cache whenever any trinity_tpu source changes, so stale
executables can never serve the results of old code.

Usage: builders call ``aot_jit(run, "name", *static_key)`` in place of
``jax.jit(run)``. With ``config.aot_cache_dir`` unset (the default — tests,
CPU runs) the wrapper is exactly ``jax.jit``.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

_lock = threading.Lock()
_source_digest_cache = None

# ---------------------------------------------------------------- sealing
# The reference serves any query shape with zero compile cost
# (exec.cpp:662-666). Here that property is recovered by warmup: a serving
# process warms every program variant its workload can touch, then SEALS
# the variant set. After seal_programs(), any _AotJit dispatch whose
# (key, avals) was never seen in this process counts the
# "aot.post_seal_miss" metric — proof the serving loop compiled (or
# first-executed) a program warmup missed (one missed variant has been
# observed as a 14 s p99 outlier). strict=True raises instead, naming the
# variant, so CI can assert warmup coverage is complete.
_seal = {"sealed": False, "strict": False}


def seal_programs(strict: bool = False) -> None:
    """Declare the program-variant set complete (call after warmup)."""
    _seal["sealed"] = True
    _seal["strict"] = strict or bool(
        os.environ.get("TRINITY_STRICT_WARM", "")
    )


def unseal_programs() -> None:
    _seal["sealed"] = False
    _seal["strict"] = False


def post_seal_misses() -> int:
    from trinity_tpu.utils.metrics import get_metrics

    snap = get_metrics().snapshot().get("aot.post_seal_miss")
    return 0 if snap is None else int(snap["value"])


def _source_digest() -> str:
    """Digest of every trinity_tpu source file: executables compiled from
    older code must never be loaded (they would silently run old logic)."""
    global _source_digest_cache
    with _lock:
        if _source_digest_cache is None:
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            h = hashlib.sha256()
            for dirpath, dirnames, filenames in sorted(os.walk(root)):
                dirnames.sort()
                for fn in sorted(filenames):
                    if not fn.endswith(".py"):
                        continue
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, root).encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
            _source_digest_cache = h.hexdigest()[:16]
        return _source_digest_cache


def _feature_flags() -> str:
    """Env toggles that change TRACED PROGRAMS without changing source
    (A/B switches): they must key the executable cache or an A/B run
    would silently load the other variant's executable."""
    from trinity_tpu.ops.postings import USE_DBUF
    from trinity_tpu.ops.select import USE_ROWGATHER

    return f"dbuf={int(USE_DBUF)},rowgather={int(USE_ROWGATHER)}"


def _aval_key(args) -> str:
    """Stable description of the call's input avals (None legs included)."""
    import jax

    parts = []
    for leaf in jax.tree.leaves(
        args, is_leaf=lambda x: x is None
    ):
        if leaf is None:
            parts.append("None")
        elif hasattr(leaf, "shape"):
            parts.append(f"{leaf.dtype}{tuple(leaf.shape)}")
        else:
            parts.append(repr(leaf))
    return ";".join(parts)


def _under_trace(args) -> bool:
    import jax

    return any(
        isinstance(leaf, jax.core.Tracer) for leaf in jax.tree.leaves(args)
    )


class _AotJit:
    """jax.jit plus a disk-backed compiled-executable cache."""

    def __init__(self, fn, key_parts):
        import jax

        self._jit = jax.jit(fn)
        self._key_parts = key_parts
        self._loaded: dict = {}
        self._seen: set = set()
        self._locks: dict = {}
        self._locks_guard = threading.Lock()

    # jitted-callable conveniences used by a few callers
    def lower(self, *args):
        return self._jit.lower(*args)

    def _check_seal(self, ak):
        """Warmup-coverage accounting: first dispatch of a (key, avals)
        variant after seal_programs() is a coverage hole — the program
        compiles (or, on the axon backend, pays its lazy server-side
        first-execution) INSIDE the serving loop."""
        if ak in self._seen:
            return
        if _seal["sealed"]:
            from trinity_tpu.utils.metrics import get_metrics

            get_metrics().count("aot.post_seal_miss")
            if _seal["strict"]:
                raise RuntimeError(
                    "post-seal program variant (warmup coverage hole): "
                    f"key={self._key_parts} avals={ak}"
                )
        self._seen.add(ak)

    def __call__(self, *args):
        from trinity_tpu.config import get_config

        if _under_trace(args):
            # being INLINED into an enclosing program (builders nest: the
            # combined batch program calls the per-group builders on
            # tracers) — not a device dispatch; the enclosing program owns
            # the compile
            return self._jit(*args)
        cache_dir = get_config().aot_cache_dir
        if not cache_dir:
            self._check_seal(_aval_key(args))
            return self._jit(*args)
        ak = _aval_key(args)
        self._check_seal(ak)
        comp = self._loaded.get(ak)
        if comp is None:
            # per-variant compile lock: warmup drives the whole workload on
            # a thread pool, so concurrent calls that resolve to the SAME
            # executable must not both pay the compile — the first caller
            # compiles, the rest block then reuse it
            with self._locks_guard:
                lock = self._locks.setdefault(ak, threading.Lock())
            with lock:
                comp = self._loaded.get(ak)
                if comp is None:
                    comp, from_disk = self._load_or_compile(
                        cache_dir, ak, args
                    )
                    if from_disk:
                        # a deserialized executable can be subtly
                        # incompatible with THIS process's device topology
                        # (observed: an executable compiled on 1 of 8
                        # virtual CPU devices deserializes as an 8-shard
                        # program); validate with one real execution and
                        # fall back to a fresh compile on failure
                        try:
                            out = comp(*args)
                            self._loaded[ak] = comp
                            return out
                        except Exception:  # noqa: BLE001
                            from trinity_tpu.utils.metrics import get_metrics

                            get_metrics().count("aot.exec_failed")
                            comp = self._compile_and_persist(
                                cache_dir, ak, args
                            )
                    self._loaded[ak] = comp
        return comp(*args)

    def _cache_path(self, cache_dir, ak):
        import jax

        devs = jax.devices()
        full_key = repr(
            (
                _source_digest(),
                _feature_flags(),
                jax.__version__,
                jax.default_backend(),
                getattr(devs[0], "device_kind", "?"),
                len(devs),  # topology: an executable binds device counts
                self._key_parts,
                ak,
            )
        )
        digest = hashlib.sha256(full_key.encode()).hexdigest()
        return os.path.join(cache_dir, f"{digest}.exe")

    def _load_or_compile(self, cache_dir, ak, args):
        """Returns (compiled, from_disk)."""
        import time as _time

        from trinity_tpu.utils.metrics import get_metrics

        os.makedirs(cache_dir, exist_ok=True)
        path = self._cache_path(cache_dir, ak)
        if os.path.exists(path):
            try:
                from jax.experimental import serialize_executable as se

                t0 = _time.perf_counter()
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                comp = se.deserialize_and_load(payload, in_tree, out_tree)
                get_metrics().count("aot.loaded")
                get_metrics().observe_us(
                    "aot.load_s", (_time.perf_counter() - t0) * 1e6
                )
                return comp, True
            except Exception:  # noqa: BLE001 — fall through to compile
                get_metrics().count("aot.load_failed")
        return self._compile_and_persist(cache_dir, ak, args), False

    def _compile_and_persist(self, cache_dir, ak, args):
        import time as _time

        from trinity_tpu.utils.metrics import get_metrics

        path = self._cache_path(cache_dir, ak)
        t0 = _time.perf_counter()
        comp = self._jit.lower(*args).compile()
        get_metrics().count("aot.compiled")
        get_metrics().observe_us(
            "aot.compile_s", (_time.perf_counter() - t0) * 1e6
        )
        try:
            from jax.experimental import serialize_executable as se

            payload, in_tree, out_tree = se.serialize(comp)
            tmp = path + f".t{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
        except Exception:  # noqa: BLE001 — cache is best-effort
            get_metrics().count("aot.persist_failed")
        return comp


def aot_jit(fn, name: str, *key_parts):
    """Drop-in jax.jit replacement with the persistent executable cache.

    key_parts must (with the input avals) fully determine the traced
    program — builders pass their own lru_cache key."""
    return _AotJit(fn, (name,) + tuple(repr(p) for p in key_parts))
