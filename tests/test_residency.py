"""HBM residency manager: lazy upload, LRU eviction under a byte budget,
transparent re-upload (the on-demand segment mapping analog,
segment_index_source.cpp:5-186)."""

import numpy as np
import pytest

from trinity_tpu.config import configure, get_config
from trinity_tpu.exec import Executor
from trinity_tpu.exec.residency import get_residency
from trinity_tpu.index.builder import SegmentIndexSession


def _seg(seed, n_docs=600, vocab=30):
    rng = np.random.default_rng(seed)
    sess = SegmentIndexSession()
    ids = list(range(n_docs))
    docs = [
        [f"r{int(x)}" for x in rng.integers(0, vocab, 6)] for _ in ids
    ]
    sess.bulk_index(ids, docs)
    return sess.commit()


@pytest.fixture
def budget():
    old = get_config().hbm_budget_bytes
    yield
    configure(hbm_budget_bytes=old)


def test_lazy_upload_and_reupload(budget):
    ex = Executor(_seg(1))
    assert ex._dev is None, "upload must be lazy"
    r1 = ex.search("r0 r1", k=5)
    assert ex._dev is not None
    ex.evict()
    assert ex._dev is None
    r2 = ex.search("r0 r1", k=5)  # transparent re-upload
    assert [(r.doc_id, r.score) for r in r1] == [
        (r.doc_id, r.score) for r in r2
    ]


def test_budget_evicts_lru(budget):
    exs = [Executor(_seg(s)) for s in range(4)]
    # force each search to evict the others: budget fits ~one segment
    configure(hbm_budget_bytes=int(max(e.device_bytes for e in exs) * 1.5))
    mgr = get_residency()
    ev0 = mgr.evictions
    expected = []
    for e in exs:
        expected.append(e.search("r0 OR r2", k=5))
    assert mgr.evictions > ev0, "budget should have forced evictions"
    resident = sum(1 for e in exs if e._dev is not None)
    assert resident <= 2
    # results are unchanged when segments cycle back in
    for e, want in zip(exs, expected):
        got = e.search("r0 OR r2", k=5)
        assert [(r.doc_id, r.score) for r in got] == [
            (r.doc_id, r.score) for r in want
        ]
    assert mgr.resident_bytes() <= get_config().hbm_budget_bytes


def test_unlimited_budget_never_evicts(budget):
    configure(hbm_budget_bytes=0)
    mgr = get_residency()
    ev0 = mgr.evictions
    exs = [Executor(_seg(10 + s)) for s in range(3)]
    for e in exs:
        e.search("r1", k=3)
    assert all(e._dev is not None for e in exs)
    assert mgr.evictions == ev0


def test_concurrent_eviction_race(budget):
    """ensure() returns the device-array dict: a concurrent ensure() on
    another executor may evict this one the instant the manager lock is
    released, so readers must never re-read ex._dev (regression: NoneType
    subscript crash under threaded warmup with a one-segment budget)."""
    import threading

    ex1, ex2 = Executor(_seg(3)), Executor(_seg(4))
    # budget fits roughly one segment: every search on one evicts the other
    configure(hbm_budget_bytes=max(ex1.device_bytes, ex2.device_bytes) + 1024)
    want1 = [(r.doc_id, r.score) for r in ex1.search("r0 r1", k=5)]
    want2 = [(r.doc_id, r.score) for r in ex2.search("r0 r1", k=5)]
    errors = []

    def hammer(ex, want):
        try:
            for _ in range(8):
                got = [(r.doc_id, r.score) for r in ex.search("r0 r1", k=5)]
                assert got == want
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [
        threading.Thread(target=hammer, args=(ex1, want1)),
        threading.Thread(target=hammer, args=(ex2, want2)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert get_residency().evictions > 0  # the budget actually thrashed
