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
