"""Flat boolean path: tape-independent kernel parity + flattener rules.

The flat kernel (ops/fusedscore.py:fused_flat_score_tiles) receives the
query STRUCTURE as data (per-slot req/neg/opt flags + k-of-n threshold),
so one compiled program serves every flat boolean shape of a (T, B)
bucket — the analog of the reference executing arbitrary query shapes
with zero compile cost (exec.cpp:662-666). These tests pin:
  - flattener acceptance/rejection rules (executor._flatten_tape),
  - engine-vs-oracle parity through the flat path,
  - flat-vs-tape-path identity (TRINITY_FLATKERNEL toggle),
  - mixed shapes merging into ONE group in the combined batch program.
"""

import numpy as np
import pytest

import trinity_tpu.exec.executor as exmod
from trinity_tpu.exec import Executor
from trinity_tpu.oracle import OracleCorpus, oracle_search
from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.plan.compile import compile_plan
from trinity_tpu.query.parser import parse_query

RTOL = 2.4e-7  # 2 ulp (XLA FMA contraction; ids must be EXACT)


def _plan(qtext):
    return compile_plan(parse_query(qtext).root)


def _flat(qtext):
    p = _plan(qtext)
    return exmod._flatten_tape(p.tape, p.n_slots)


# ------------------------------------------------------------- flattener
def test_flatten_and():
    fl, wsel, kmin = _flat("a b c")
    assert fl == (1, 1, 1) and kmin == 3
    assert wsel == (0, 1, 2)


def test_flatten_or():
    fl, wsel, kmin = _flat("a OR b OR c")
    assert fl == (1, 1, 1) and kmin == 1


def test_flatten_not():
    fl, wsel, kmin = _flat("a b NOT c")
    assert fl == (1, 1, 2) and kmin == 2
    assert wsel[2] == -1  # negated slots are unscored


def test_flatten_not_or_rhs():
    fl, wsel, kmin = _flat("a NOT (b OR c)")
    assert fl == (1, 2, 2) and kmin == 1


def test_flatten_matchsome():
    fl, wsel, kmin = _flat("[a, b, c]")
    assert fl == (1, 1, 1) and kmin == 1  # reference MatchSome default min


def test_flatten_optional():
    fl, wsel, kmin = _flat("a <b>")
    assert fl[0] == 1 and fl[1] == 4 and kmin == 1


def test_flatten_rejects_nested():
    # OR-of-AND can't flatten (needs nested grouping)
    assert _flat("(a b) OR (c d)") is None


def test_flatten_rejects_not_and_rhs():
    # NOT (b AND c) != (NOT b) AND (NOT c) — must reject
    assert _flat("a NOT (b c)") is None


def test_flatten_rejects_slot_reuse():
    p = _plan("a OR b")
    # synthesize a tape reusing slot 0 twice
    tape = ("or", ("tok", 0, 0), ("tok", 0, 1))
    assert exmod._flatten_tape(tape, 1) is None


# ------------------------------------------------------------ e2e parity
def make_corpus(rng, n_docs, vocab):
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    zipf = 1.0 / np.arange(1, vocab + 1)
    zipf /= zipf.sum()
    for d in range(n_docs):
        doc_id = d * 3 + 2
        length = int(rng.integers(4, 30))
        toks = [f"t{int(i)}" for i in rng.choice(vocab, size=length, p=zipf)]
        corpus.add(doc_id, toks)
        p = sess.begin(doc_id)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    return sess.commit(), corpus


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(23)
    seg, corpus = make_corpus(rng, n_docs=500, vocab=90)
    return Executor(seg), corpus


FLAT_QUERIES = [
    "t0 t1",
    "t2 t0 t4",
    "t1 OR t9",
    "t0 OR t1 OR t2 OR t33",
    "t1 NOT t2",
    "t0 t3 NOT t1",
    "t0 NOT (t1 OR t2)",
    "[t3, t8, t11]",
    "t1 <t5>",
    "t88",
]


def test_flat_batch_vs_oracle(small):
    ex, corpus = small
    assert exmod.USE_FLAT
    outs = ex.search_batch(FLAT_QUERIES, k=10)
    for qtext, res in zip(FLAT_QUERIES, outs):
        want = oracle_search(corpus, parse_query(qtext).root, k=10)
        assert [r.doc_id for r in res] == [w[0] for w in want], qtext
        got = np.array([r.score for r in res], np.float32)
        exp = np.array([w[1] for w in want], np.float32)
        np.testing.assert_allclose(got, exp, rtol=RTOL, atol=0)


def test_flat_matches_tape_path(small, monkeypatch):
    ex, corpus = small
    flat_out = ex.search_batch(FLAT_QUERIES, k=10)
    monkeypatch.setattr(exmod, "USE_FLAT", False)
    tape_out = ex.search_batch(FLAT_QUERIES, k=10)
    for a, b in zip(flat_out, tape_out):
        assert [r.doc_id for r in a] == [r.doc_id for r in b]
        ga = np.array([r.score for r in a], np.float32)
        gb = np.array([r.score for r in b], np.float32)
        # identical f32 accumulation order — allow FMA-contraction ulps
        np.testing.assert_allclose(ga, gb, rtol=RTOL, atol=0)


def test_mixed_shapes_one_group(small):
    """AND and NOT queries (same T bucket) share one flat group, so the
    combined program carries ONE kernel instance for both shapes."""
    ex, _ = small
    qs = ["t0 t1", "t2 t3", "t1 NOT t2", "t4 NOT t0"]
    handle = ex.launch_batch(qs, k=5)
    _, group_meta, _, _, _ = handle
    kinds = [g[1] for g in group_meta]
    assert kinds == ["flat"]
    assert len(group_meta[0][0]) == 4  # all four queries in the one group
    outs = ex.finish_batch(handle)
    for qtext, res in zip(qs, outs):
        want = oracle_search(small[1], parse_query(qtext).root, k=5)
        assert [r.doc_id for r in res] == [w[0] for w in want]


def test_flat_respects_deletions(small):
    ex, corpus = small
    out0 = ex.search_batch(["t0 t1"], k=5)[0]
    assert out0, "need matches to delete"
    victim = out0[0].doc_id
    ex.set_masked_local_docs(
        np.array([np.flatnonzero(ex.seg.doc_map == victim)[0]], np.int64)
    )
    try:
        out1 = ex.search_batch(["t0 t1"], k=5)[0]
        assert victim not in [r.doc_id for r in out1]
    finally:
        ex.set_masked_local_docs(np.array([], np.int64))
