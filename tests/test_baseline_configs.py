"""Acceptance test: every BASELINE.json config works end-to-end.

1. single-segment AND conjunction, BM25 top-10
2. OR/disjunction with skip-based (block-max) top-k pruning
3. phrase + proximity (positions decode, hit tracking)
4. percolator vs thousands of registered queries
5. multi-segment with merge + deletion masks, sharded over a mesh
"""

import numpy as np
import pytest

import trinity_tpu as T
from trinity_tpu.exec.richmatch import exec_rich
from trinity_tpu.oracle import OracleCorpus, oracle_search
from trinity_tpu.parallel import MeshExecutor
from tests.test_exec_e2e import make_corpus


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    seg, corpus = make_corpus(
        rng, n_docs=30_000, vocab=500, doc_len_rng=(4, 16), id_stride=1
    )
    return T.Executor(seg), seg, corpus


def _check(got, corpus, qtext, **kw):
    q = T.parse_query(qtext)
    want = oracle_search(corpus, q.root, k=10, **kw)
    assert [r.doc_id for r in got] == [d for d, _ in want], qtext
    np.testing.assert_allclose(
        [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
    )


def test_config1_and_conjunction(setup):
    ex, seg, corpus = setup
    _check(ex.search("t0 t3 t7", k=10), corpus, "t0 t3 t7")


def test_config2_pruned_disjunction(setup):
    ex, seg, corpus = setup
    got = ex.search_pruned("t1 OR t9 OR t40", k=10, chunk_windows=1)
    _check(got, corpus, "t1 OR t9 OR t40")


def test_config3_phrase_proximity(setup):
    ex, seg, corpus = setup
    _check(ex.search('"t0 t1"', k=10), corpus, '"t0 t1"')
    # proximity metadata surfaces through rich-match (DocWordsSpace)
    seen = []
    exec_rich(ex, '"t0 t1"', seen.append)
    assert all(
        any(
            m.dws.test_phrase(["t0", "t1"], h.pos)
            for h in m.term("t0").hits
        )
        for m in seen
    )


def test_config4_percolator_thousands(setup):
    rng = np.random.default_rng(5)
    p = T.Percolator()
    for i in range(3000):
        a, b = rng.integers(0, 400, 2)
        p.register(f"t{a} t{b}" if i % 2 else f"t{a} OR t{b}")
    m = p.match_batch([[f"t{int(x)}" for x in rng.integers(0, 400, 10)] for _ in range(32)])
    assert m.shape == (32, 3000)
    assert m.any()


def test_config5_multisegment_masks_mesh(setup, tmp_path):
    ex, seg, corpus = setup
    # generation 2 updates a doc and erases another; collection masks them
    sess = T.SegmentIndexSession()
    pr = sess.begin(3)  # doc 3 exists in gen 1 (id_stride=1, base 3)
    for i, tok in enumerate(["t0", "t3", "t7"], 1):
        pr.insert(tok, i)
    sess.update(pr)
    sess.erase(5)
    coll = (
        T.IndexSourcesCollection()
        .add_segment(seg, generation=1)
        .add_segment(sess.commit(), generation=2)
        .commit()
    )
    assert 3 in list(coll.match_ids("t0 t3 t7"))
    assert 5 not in list(coll.match_ids("t0 OR t1 OR t2 OR t3 OR t4"))
    # merge the collection -> one segment, equal results
    mc = T.MergeCandidatesCollection()
    for src in coll.sources:
        mc.add_source(src)
    merged = mc.merge(keep_updated_ids=False)
    single = T.IndexSourcesCollection().add_segment(merged).commit()
    a = [(r.doc_id, round(r.score, 5)) for r in single.search("t0 t3 t7", k=10)]
    # mesh-shard the merged segment over 8 virtual devices
    mex = MeshExecutor(merged, n_shards=8)
    b = [(r.doc_id, round(r.score, 5)) for r in mex.search("t0 t3 t7", k=10)]
    assert [x[0] for x in a] == [x[0] for x in b]
