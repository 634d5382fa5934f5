"""Top-level API facade, config, tracing."""

import numpy as np

import trinity_tpu as T


def small_seg():
    sess = T.SegmentIndexSession()
    for d, text in {1: "red apple", 2: "green apple", 3: "red car"}.items():
        p = sess.begin(d)
        for i, tok in enumerate(text.split(), 1):
            p.insert(tok, i)
        sess.insert(p)
    return sess.commit()


def test_exec_query_facade_segment():
    seg = small_seg()
    hits = T.exec_query("apple", seg)
    assert [h.doc_id for h in hits] == [1, 2]
    ids = T.exec_query("red", seg, flags=T.ExecFlags.DOCUMENTS_ONLY)
    assert list(ids) == [1, 3]


def test_exec_query_facade_collection():
    coll = T.IndexSourcesCollection().add_segment(small_seg()).commit()
    hits = T.exec_query("apple", coll)
    assert [h.doc_id for h in hits] == [1, 2]


def test_configure_roundtrip():
    cfg = T.get_config()
    old = cfg.default_k
    try:
        T.configure(default_k=7)
        assert T.get_config().default_k == 7
    finally:
        T.configure(default_k=old)


def test_tracer_counts():
    from trinity_tpu.utils.timings import get_tracer

    tr = get_tracer()
    tr.reset()
    seg = small_seg()
    ex = T.Executor(seg)
    ex.search("apple")
    snap = tr.snapshot()
    assert snap["exec.prepare"]["count"] >= 1
    assert snap["exec.device"]["count"] >= 1


def test_bulk_vs_incremental_equivalence():
    docs = {10: ["a", "b", "a"], 11: ["b", "c"]}
    s1 = T.SegmentIndexSession()
    for d, toks in docs.items():
        p = s1.begin(d)
        for i, t in enumerate(toks, 1):
            p.insert(t, i)
        s1.insert(p)
    s2 = T.SegmentIndexSession()
    s2.bulk_index(list(docs), list(docs.values()))
    a, b = s1.commit(), s2.commit()
    assert a.terms == b.terms
    np.testing.assert_array_equal(a.planes, b.planes)
    np.testing.assert_array_equal(a.positions, b.positions)


def test_metrics_registry():
    """Serving metrics (§5.5): counters + latency quantiles accumulate
    across searches and fold in the phase tracer."""
    from trinity_tpu import Executor, get_metrics

    m = get_metrics()
    m.reset()
    ex = Executor(small_seg())
    ex.search_batch(["red apple", "green OR car"], k=5)
    snap = m.snapshot()
    assert snap["search.queries"]["value"] >= 2
    lat = snap["search.batch_latency"]
    assert lat["count"] >= 1 and lat["p99_us"] >= lat["p50_us"] > 0
    assert any(k.startswith("trace.") for k in snap)


def test_metrics_histogram_quantiles():
    from trinity_tpu.utils.metrics import Histogram

    h = Histogram()
    for v in range(1, 1001):
        h.observe(float(v))
    s = h.summary()
    assert s["count"] == 1000
    assert 450 <= s["p50_us"] <= 560  # ~4% bucket resolution
    assert 940 <= s["p99_us"] <= 1080
    assert s["min_us"] == 1.0 and s["max_us"] == 1000.0
