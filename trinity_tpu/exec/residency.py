"""HBM residency manager: many-segment serving under a device-memory budget.

The reference maps segments on demand and lets the OS page them
(segment_index_source.cpp:5-186 — open/mmap per access path, no resident
copy requirement). A TPU has no demand paging: device buffers are explicit
uploads, so the analog is a RESIDENCY MANAGER — every Executor registers its
device footprint, uploads lazily on first use, and when a configured HBM
byte budget (config.hbm_budget_bytes, 0 = unlimited) would be exceeded the
least-recently-used segments' device arrays are dropped; an evicted
executor transparently re-uploads on its next search. Host-side packed
arrays are always kept, so eviction costs one host->device transfer to
undo, never a re-pack.

Thread-safe (warmup compiles on a pool): ensure() RETURNS the device-array
dict read under the manager lock — callers must use the returned dict, not
re-read executor state, because a concurrent ensure() on another executor
may evict this one immediately after ensure() returns (the returned jax
arrays stay alive through any in-flight dispatch; HBM frees when the last
reference drops). Uploads run OUTSIDE the manager lock (serialized per
executor), so a multi-second host->device transfer never blocks other
segments' dispatches; a concurrent upload pair can transiently overshoot
the budget until both register (the budget is an LRU target, not a hard
reservation).
"""

from __future__ import annotations

import threading
import weakref
from collections import OrderedDict


class ResidencyManager:
    """LRU over executors' device-resident segment arrays."""

    def __init__(self):
        self._lock = threading.RLock()
        # key -> (weakref(executor), device_bytes); insertion order = LRU
        self._lru: OrderedDict = OrderedDict()
        self.evictions = 0
        self.uploads = 0

    def _forget(self, key) -> None:
        with self._lock:
            self._lru.pop(key, None)

    def resident_bytes(self) -> int:
        with self._lock:
            total = 0
            for ref, b in self._lru.values():
                ex = ref()
                if ex is not None and ex._dev is not None:
                    total += b
            return total

    def _touch(self, ex) -> None:
        key = id(ex)
        self._lru.pop(key, None)
        self._lru[key] = (
            weakref.ref(ex, lambda _r, k=key: self._forget(k)),
            ex.device_bytes,
        )

    def ensure(self, ex) -> dict:
        """Touch `ex` in the LRU and return its device-array dict,
        uploading first if evicted/new (evicting older segments when a
        budget is configured). Callers must read arrays from the RETURNED
        dict — ex._dev may be evicted by another thread the moment the
        manager lock is released."""
        from trinity_tpu.config import get_config

        with self._lock:
            dev = ex._dev
            if dev is not None:
                self._touch(ex)
                return dev
            budget = get_config().hbm_budget_bytes
            if budget:
                resident = self.resident_bytes()
                for k, (ref, b) in list(self._lru.items()):
                    if resident + ex.device_bytes <= budget:
                        break
                    other = ref()
                    if other is None or other is ex or other._dev is None:
                        continue
                    other._drop_device()
                    resident -= b
                    self.evictions += 1
        # upload outside the manager lock (serialized per executor): a
        # slow host->device transfer must not block other segments
        with ex._upload_lock:
            dev = ex._dev
            if dev is None:
                ex._upload()
                dev = ex._dev
                with self._lock:
                    self.uploads += 1
        with self._lock:
            self._touch(ex)
        return dev


_MANAGER = ResidencyManager()


def get_residency() -> ResidencyManager:
    return _MANAGER
