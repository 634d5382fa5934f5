"""Dense positional-bitmask phrase path (ops/posmask.py): exact parity vs
the oracle AND vs the candidate-ladder path, plus the gating invariants
(positions_distinct, max_position word budget, DMA-bucket overflow)."""

import numpy as np
import pytest

from trinity_tpu import configure
from trinity_tpu.config import get_config
from trinity_tpu.exec import Executor
from trinity_tpu.index import SegmentIndexSession
from trinity_tpu.oracle import OracleCorpus, oracle_search
from trinity_tpu.query.parser import parse_query
from tests.test_exec_e2e import ids, make_corpus


@pytest.fixture(scope="module")
def phrased():
    """Corpus with FORCED phrase occurrences (bigrams, trigrams, repeats)
    so the assertions compare non-empty result sets."""
    rng = np.random.default_rng(91)
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    zipf = 1.0 / np.arange(1, 31)
    zipf /= zipf.sum()
    for d in range(1, 501):
        length = int(rng.integers(6, 50))
        toks = [f"t{int(i)}" for i in rng.choice(30, size=length, p=zipf)]
        r = rng.random()
        if r < 0.3:
            toks[2:4] = ["t0", "t1"]
        if 0.2 < r < 0.5:
            toks[0:3] = ["t5", "t6", "t7"]
        if r > 0.8:
            toks[1:3] = ["t2", "t2"]
        corpus.add(d, toks)
        p = sess.begin(d)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    seg = sess.commit()
    assert seg.positions_distinct
    return seg, corpus


PHRASES = [
    '"t0 t1"',
    '"t1 t0"',
    '"t5 t6 t7"',
    '"t2 t2"',  # repeated member: same mask, two shifts
    '"t0 t1"',
    '"t28 t29"',  # rare or empty
    '"t6 t7"',
]


@pytest.mark.parametrize("scorer", ["bm25", "tfidf"])
def test_posmask_batch_parity(phrased, scorer):
    seg, corpus = phrased
    ex = Executor(seg)
    assert ex._posmask_enabled
    res = ex.search_batch(PHRASES, k=10, scorer=scorer)
    for qtext, got in zip(PHRASES, res):
        want = oracle_search(corpus, parse_query(qtext).root, k=10,
                             scorer=scorer)
        assert ids(got) == [d for d, _ in want], qtext
        np.testing.assert_allclose(
            [r.score for r in got], [s for _, s in want],
            rtol=2.4e-7, atol=0,
        )

def test_posmask_matches_ladder(phrased):
    """posmask on == posmask off (candidate ladder), bit for bit."""
    seg, corpus = phrased
    on = Executor(seg).search_batch(PHRASES, k=10)
    old = get_config().use_posmask
    try:
        configure(use_posmask=False)
        ex = Executor(seg)
        assert not ex._posmask_enabled
        off = ex.search_batch(PHRASES, k=10)
    finally:
        configure(use_posmask=old)
    for a, b in zip(on, off):
        assert ids(a) == ids(b)
        np.testing.assert_array_equal(
            np.array([r.score for r in a], np.float32),
            np.array([r.score for r in b], np.float32),
        )


def test_posmask_with_deletions(phrased):
    seg, corpus = phrased
    ex = Executor(seg)
    assert ex._posmask_enabled
    masked = {d for d in range(1, 501) if d % 7 == 0}
    ex.set_masked_local_docs(
        np.flatnonzero(np.isin(seg.doc_map, sorted(masked)))
    )
    got = ex.search_batch(['"t0 t1"', '"t5 t6 t7"'], k=10)
    for qtext, g in zip(['"t0 t1"', '"t5 t6 t7"'], got):
        want = oracle_search(
            corpus, parse_query(qtext).root, k=10, masked=masked
        )
        assert ids(g) == [d for d, _ in want], qtext
        np.testing.assert_allclose(
            [r.score for r in g], [s for _, s in want], rtol=2.4e-7, atol=0
        )


def test_duplicate_positions_disable_posmask():
    """A doc inserting the same (term, position) twice makes popcount !=
    the anchored multiplicity count — the flag must gate the path off and
    the ladder must still produce oracle-exact results."""
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    for d, toks in ((1, ["a", "b", "c"]), (2, ["b", "a", "b"])):
        corpus.add(d, toks)
        p = sess.begin(d)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        if d == 1:
            p.insert("a", 1)  # duplicate (term, pos)
        sess.insert(p)
    seg = sess.commit()
    assert not seg.positions_distinct
    ex = Executor(seg)
    assert not ex._posmask_enabled
    got = ex.search('"a b"', k=10)
    # doc 1 matches with anchor multiplicity 2 (duplicate a@1) — exactly
    # the semantics a bitmask would lose; compare ids only (the oracle
    # corpus lacks the duplicate so scores differ by construction)
    assert ids(got) == [1, 2]


def test_max_position_gates_posmask():
    sess = SegmentIndexSession()
    p = sess.begin(1)
    p.insert("a", 1)
    p.insert("b", 2)
    p.insert("far", 4000)  # max_position 4000 >> 32 * posmask_max_words
    sess.insert(p)
    seg = sess.commit()
    assert seg.positions_distinct
    ex = Executor(seg)
    assert not ex._posmask_enabled
    assert ids(ex.search('"a b"', k=5)) == [1]


def test_positions_distinct_persists(tmp_path, phrased):
    seg, _ = phrased
    d = tmp_path / "seg"
    seg.persist(str(d))
    from trinity_tpu.index.format import SegmentData

    loaded = SegmentData.load(str(d))
    assert loaded.positions_distinct
    assert Executor(loaded)._posmask_enabled


def _reconfigured(**kw):
    import contextlib

    @contextlib.contextmanager
    def cm():
        old = {k: getattr(get_config(), k) for k in kw}
        try:
            configure(**kw)
            yield
        finally:
            configure(**old)

    return cm()


@pytest.mark.parametrize("min_df", [1, 40])
def test_posmask_hot_cache_parity(phrased, min_df):
    """Cached members (full cache at min_df=1, partial at 40) must be
    bit-identical to the scattered path."""
    seg, corpus = phrased
    with _reconfigured(posmask_min_df=min_df, posmask_cache_bytes=1 << 30):
        ex = Executor(seg)
        assert ex._pos_hot, "expected a non-empty posmask cache"
        got = ex.search_batch(PHRASES, k=10)
        assert ex._pos_planes is not None  # the batch built the cache
    with _reconfigured(posmask_cache_bytes=0):
        ref = Executor(seg).search_batch(PHRASES, k=10)
    for a, b in zip(got, ref):
        assert ids(a) == ids(b)
        np.testing.assert_array_equal(
            np.array([r.score for r in a], np.float32),
            np.array([r.score for r in b], np.float32),
        )


def test_posmask_hot_cache_deletions(phrased):
    seg, corpus = phrased
    with _reconfigured(posmask_min_df=1, posmask_cache_bytes=1 << 30):
        ex = Executor(seg)
        masked = {d for d in range(1, 501) if d % 3 == 0}
        ex.set_masked_local_docs(
            np.flatnonzero(np.isin(seg.doc_map, sorted(masked)))
        )
        got = ex.search('"t0 t1"', k=10)
    want = oracle_search(
        corpus, parse_query('"t0 t1"').root, k=10, masked=masked
    )
    assert ids(got) == [d for d, _ in want]
    np.testing.assert_allclose(
        [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
    )


def test_posmask_multiwindow():
    """Docs spanning >1 window: boundary blocks appear in both windows'
    cells; out-of-window postings must not scatter into the wrong tile."""
    rng = np.random.default_rng(17)
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    n = 17000  # two windows
    for d in range(1, n + 1):
        toks = [f"t{int(i)}" for i in rng.integers(0, 6, size=4)]
        if d % 5 == 0:
            toks[1:3] = ["t0", "t1"]
        corpus.add(d, toks)
        p = sess.begin(d)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    seg = sess.commit()
    assert seg.n_windows == 2
    ex = Executor(seg)
    assert ex._posmask_enabled
    got = ex.search('"t0 t1"', k=10)
    want = oracle_search(corpus, parse_query('"t0 t1"').root, k=10)
    assert ids(got) == [d for d, _ in want]
    np.testing.assert_allclose(
        [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
    )


def test_posmask_empty_and_maskonly_segments():
    """r4 regression: `_pos_cell_rows` indexed an EMPTY block_hits_off on
    zero-block segments. Phrase queries must short-circuit against
    (a) a segment with zero postings blocks, (b) a mask-only (erase-only)
    generation — first-class source type, index_source.h:160-189."""
    # (a) erase-only segment, searched directly
    sess = SegmentIndexSession()
    sess.erase(7)
    sess.erase(9)
    seg = sess.commit()
    assert len(seg.block_hits_off) == 0 and seg.n_docs == 0
    ex = Executor(seg)
    for qtext in ['"t0 t1"', '"t0 t1 t2"', 't0 t1', 't0 OR t1']:
        assert ex.search(qtext, k=10) == []

    # (b) collection = real segment + newer mask-only generation; the
    # phrase must still answer (minus the erased doc) without crashing
    from trinity_tpu.index.source import IndexSourcesCollection

    rng = np.random.default_rng(3)
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    for d in range(1, 101):
        toks = [f"t{int(i)}" for i in rng.integers(0, 8, size=6)]
        if d % 4 == 0:
            toks[1:3] = ["t0", "t1"]
        corpus.add(d, toks)
        p = sess.begin(d)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    base = sess.commit()
    erase_sess = SegmentIndexSession()
    erase_sess.erase(4)
    mask_only = erase_sess.commit()
    coll = IndexSourcesCollection()
    coll.add_segment(base, generation=100)
    coll.add_segment(mask_only, generation=200)
    got = coll.search('"t0 t1"', k=10)
    want = oracle_search(
        corpus, parse_query('"t0 t1"').root, k=10, masked={4}
    )
    assert ids(got) == [d for d, _ in want]


def test_posmask_terms_absent_from_segment(phrased):
    """Phrase whose members have NO postings on an otherwise non-empty
    segment (the sparse-shard case): empty result, no crash, and batching
    it with live phrases must not perturb them."""
    seg, corpus = phrased
    ex = Executor(seg)
    assert ex._posmask_enabled
    res = ex.search_batch(['"zq zr"', '"t0 t1"'], k=10)
    assert res[0] == []
    want = oracle_search(corpus, parse_query('"t0 t1"').root, k=10)
    assert ids(res[1]) == [d for d, _ in want]
