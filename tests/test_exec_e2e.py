"""End-to-end engine vs oracle parity (SURVEY §4: golden-parity strategy)."""

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.oracle import OracleCorpus, oracle_match_ids, oracle_search
from trinity_tpu.query.parser import parse_query


def make_corpus(rng, n_docs, vocab, doc_len_rng, id_stride=1):
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    zipf = 1.0 / np.arange(1, vocab + 1)
    zipf /= zipf.sum()
    for d in range(n_docs):
        doc_id = d * id_stride + 3
        length = int(rng.integers(*doc_len_rng))
        toks = [f"t{int(i)}" for i in rng.choice(vocab, size=length, p=zipf)]
        corpus.add(doc_id, toks)
        p = sess.begin(doc_id)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    return sess.commit(), corpus


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(7)
    seg, corpus = make_corpus(rng, n_docs=600, vocab=120, doc_len_rng=(4, 40), id_stride=5)
    return Executor(seg), corpus


QUERIES = [
    "t0",
    "t3",
    "t1 t2",  # AND
    "t1 AND t4 AND t0",
    "t1 OR t9",
    "t0 OR t1 OR t2 OR t50",
    "t1 NOT t2",
    "t1 -t0",
    "t0 (t1 OR t7)",
    "t2 OR (t5 t6)",
    "[t3, t8, t11]",
    "t1 <t5>",
    "t0 t1 OR t2",  # reference associativity
    "nonexistent-term",
    "t0 NOT (t1 OR t2)",
    "t117",  # rare term
    # r5 bench families (queries.h:10-16 node inventory breadth)
    "t0 t2 t5 t9",  # 4-term AND
    "t0 t1 t2 t4 t6 t8",  # 6-term AND
    "t1 OR t3 OR t9 OR t17 OR t33 OR t65",  # 6-term OR
    "t0 OR t2 OR t4 OR t8 OR t16 OR t32 OR t64 OR t128",  # 8-term OR
    "t0 t3 NOT t1",  # 2-positive NOT
    "[t3, t8, t11, t20]/2",  # k-of-n, k=2
    "[t1, t5, t9, t13, t17]/3",  # k-of-n, k=3
    "(t0 t5) OR (t2 t9)",  # OR-of-AND
    "(t1 t3) OR (t2 t4 t6)",  # OR-of-AND, uneven groups
]


def ids(results):
    return [r.doc_id for r in results]


@pytest.mark.parametrize("qtext", QUERIES)
@pytest.mark.parametrize("scorer", ["bm25", "tfidf", "trivial"])
def test_topk_parity_small(small, qtext, scorer):
    ex, corpus = small
    q = parse_query(qtext)
    got = ex.search(q, k=10, scorer=scorer)
    want = oracle_search(corpus, q.root, k=10, scorer=scorer)
    assert ids(got) == [d for d, _ in want], f"{qtext} ids"
    np.testing.assert_allclose(
        [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
    )


@pytest.mark.parametrize("qtext", QUERIES[:10])
def test_match_ids_parity(small, qtext):
    ex, corpus = small
    q = parse_query(qtext)
    got = ex.match_ids(q)
    want = oracle_match_ids(corpus, q.root)
    np.testing.assert_array_equal(got, np.array(want, np.uint32))


@pytest.fixture(scope="module")
def multiwindow():
    """> 1 window (n_docs > 16384) to exercise window tiling + merge."""
    rng = np.random.default_rng(11)
    seg, corpus = make_corpus(
        rng, n_docs=40_000, vocab=4000, doc_len_rng=(3, 9), id_stride=2
    )
    return Executor(seg), corpus


@pytest.mark.parametrize(
    "qtext",
    ["t0", "t1 t2", "t3 OR t7 OR t19", "t2 NOT t5", "[t5, t9, t31]"],
)
def test_topk_parity_multiwindow(multiwindow, qtext):
    ex, corpus = multiwindow
    q = parse_query(qtext)
    got = ex.search(q, k=10, scorer="bm25")
    want = oracle_search(corpus, q.root, k=10, scorer="bm25")
    assert ids(got) == [d for d, _ in want], f"{qtext} ids"
    np.testing.assert_allclose(
        [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
    )


def test_masked_docs(small):
    ex, corpus = small
    # mask first 50 local docs (the masked_documents_registry analog)
    masked_local = np.arange(50)
    ex.set_masked_local_docs(masked_local)
    try:
        masked_app = set(int(a) for a in ex.seg.doc_map[:50])
        q = parse_query("t0 OR t1")
        got = ex.search(q, k=10)
        want = oracle_search(corpus, q.root, k=10, masked=masked_app)
        assert ids(got) == [d for d, _ in want]
    finally:
        ex.set_masked_local_docs(None)


def test_tie_break_is_docid_ascending():
    """Equal-score docs must rank by ascending doc id (spec: DESIGN.md)."""
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    for d in range(30):
        toks = ["same", "same", "other"]
        corpus.add(d + 1, toks)
        p = sess.begin(d + 1)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    ex = Executor(sess.commit())
    got = ex.search("same", k=10)
    assert ids(got) == list(range(1, 11))
    scores = [r.score for r in got]
    assert len(set(scores)) == 1


def test_search_batch_parity(small):
    ex, corpus = small
    qs = ["t0 t1", "t2 t3", "t1 t5", "t0 OR t9", "t3 OR t1", '"t0 t1"', "zzz", "t4 NOT t0"]
    batch = ex.search_batch(qs, k=10)
    for q, br in zip(qs, batch):
        sr = ex.search(q, k=10)
        assert [(r.doc_id, r.score) for r in br] == [
            (r.doc_id, r.score) for r in sr
        ], q


def test_search_many_parity(small):
    ex, corpus = small
    qs = ["t0 t1", "t2 OR t3", '"t0 t1"', "zzz"]
    many = ex.search_many(qs, k=10)
    for q, mr in zip(qs, many):
        sr = ex.search(q, k=10)
        assert [(r.doc_id, r.score) for r in mr] == [
            (r.doc_id, r.score) for r in sr
        ], q
