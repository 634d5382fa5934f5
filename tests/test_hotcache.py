"""Hot-term plane cache: cached-slot kernel parity.

High-df terms get dense frequency planes precomputed once per executor
(ops/fusedscore.py cached slots; config.hot_cache_bytes/min_df). A cached
slot's tile arrives as ONE (128, 128) DMA from the plane array instead of
the per-(query, window) block decode whose cost is linear in df — the TPU
answer to the reference re-walking a hot term's full postings list per
query (lucene_codec.cpp:568-594). The planes are produced by the SAME
decode kernel, so results must be IDENTICAL (ids and f32 scores bit-equal
to the uncached path, which the oracle suite already pins to 2 ulp).
"""

import numpy as np
import pytest

from trinity_tpu.config import configure, get_config
from trinity_tpu.exec import Executor
from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.oracle import OracleCorpus, oracle_search


def make_corpus(rng, n_docs=2500, vocab=60):
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    zipf = 1.0 / np.arange(1, vocab + 1) ** 1.1
    zipf /= zipf.sum()
    for d in range(n_docs):
        length = int(rng.integers(4, 20))
        toks = [f"t{int(i)}" for i in rng.choice(vocab, size=length, p=zipf)]
        corpus.add(d, toks)
        p = sess.begin(d)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    return sess.commit(), corpus


@pytest.fixture(scope="module")
def seg_corpus():
    rng = np.random.default_rng(41)
    return make_corpus(rng)


@pytest.fixture()
def _restore_cfg():
    cfg = get_config()
    saved = (cfg.hot_cache_bytes, cfg.hot_cache_min_df)
    yield
    configure(hot_cache_bytes=saved[0], hot_cache_min_df=saved[1])


QUERIES = [
    "t0 t1",          # two hot terms (AND)
    "t0 OR t30 OR t55",  # hot + rare mix (OR)
    "t2 NOT t0",      # hot negation
    "t40 t0",         # rare + hot
    "[t0, t1, t45]",  # k-of-n with mixed df
    "t3 OR (t1 t2)",  # non-flat tape (fused path)
    "t50 t51",        # two uncached (below min_df) terms
]


def _ids_scores(res):
    return [(r.doc_id, r.score) for r in res]


def test_cached_parity_exact(seg_corpus, _restore_cfg):
    """Cache ON vs OFF: ids and f32 scores bit-identical, single + batch,
    with a PARTIAL cache (only genuinely hot terms qualify) so every query
    mixes cached and decoded slots."""
    seg, corpus = seg_corpus
    configure(hot_cache_bytes=0)
    off = Executor(seg)
    # min_df 100: the Zipf head is cached, the tail decodes
    configure(hot_cache_bytes=64 << 20, hot_cache_min_df=100)
    on = Executor(seg)
    assert 0 < len(on._hot) < seg.n_terms
    for q in QUERIES:
        a, b = off.search(q, k=10), on.search(q, k=10)
        assert _ids_scores(a) == _ids_scores(b), q
    for a, b in zip(
        off.search_batch(QUERIES, k=10), on.search_batch(QUERIES, k=10)
    ):
        assert _ids_scores(a) == _ids_scores(b)


def test_cached_vs_oracle(seg_corpus, _restore_cfg):
    """Cache-on engine vs the host oracle: ids exact, scores to 2 ulp."""
    seg, corpus = seg_corpus
    configure(hot_cache_bytes=64 << 20, hot_cache_min_df=1)
    ex = Executor(seg)
    assert len(ex._hot) > 0
    from trinity_tpu.query.parser import parse_query

    for q in QUERIES:
        got = ex.search(q, k=10)
        want = oracle_search(corpus, parse_query(q).root, k=10)
        assert [r.doc_id for r in got] == [w[0] for w in want], q
        np.testing.assert_allclose(
            [r.score for r in got], [w[1] for w in want],
            rtol=2.4e-7, atol=0,
        )


def test_cached_with_deletions(seg_corpus, _restore_cfg):
    """Deletion mask tiles compose with cached slots (the mask applies
    AFTER the freq tile is in VMEM, so the source of the tile must not
    matter)."""
    seg, corpus = seg_corpus
    rng = np.random.default_rng(3)
    dead = rng.choice(seg.n_docs, size=200, replace=False)
    configure(hot_cache_bytes=0)
    off = Executor(seg)
    off.set_masked_local_docs(dead)
    configure(hot_cache_bytes=64 << 20, hot_cache_min_df=1)
    on = Executor(seg)
    on.set_masked_local_docs(dead)
    for q in QUERIES:
        assert _ids_scores(off.search(q, k=10)) == _ids_scores(
            on.search(q, k=10)
        ), q


def test_budget_caps_cache(seg_corpus, _restore_cfg):
    """hot_cache_bytes bounds the plane count (highest df first)."""
    seg, _ = seg_corpus
    per = seg.n_windows * 128 * 128 * 4
    configure(hot_cache_bytes=3 * per, hot_cache_min_df=1)
    ex = Executor(seg)
    assert len(ex._hot) == 3
    dfs = np.asarray(seg.term_df)
    cached = sorted(ex._hot, key=ex._hot.get)
    # the cached set is the df top-3 (stable under ties)
    top = np.argsort(-dfs, kind="stable")[:3]
    assert set(cached) == set(int(t) for t in top)
    assert ex.tf_planes.shape[0] == 3


def test_fuzz_cached_parity(seg_corpus, _restore_cfg):
    """Random boolean shapes: cache-on == cache-off exactly."""
    seg, _ = seg_corpus
    rng = np.random.default_rng(11)
    configure(hot_cache_bytes=0)
    off = Executor(seg)
    configure(hot_cache_bytes=64 << 20, hot_cache_min_df=50)
    on = Executor(seg)

    def rand_query(depth=0):
        r = rng.random()
        t = f"t{int(rng.integers(0, 60))}"
        if depth >= 2 or r < 0.4:
            return t
        op = rng.choice(["AND", "OR", "NOT"])
        return f"({rand_query(depth + 1)} {op} {rand_query(depth + 1)})"

    qs = [rand_query() for _ in range(24)]
    for a, b in zip(off.search_batch(qs, k=10), on.search_batch(qs, k=10)):
        assert _ids_scores(a) == _ids_scores(b)
