"""Block-max pruned top-k (WAND analog) exactness vs the dense path."""

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from tests.test_exec_e2e import make_corpus, ids


def _rounds():
    """Device chunk evaluations, via the pruned.rounds metric (robust to
    which chunk evaluator the grouping routes to)."""
    from trinity_tpu.utils.metrics import get_metrics

    return get_metrics().snapshot().get("pruned.rounds", {}).get("value", 0)


@pytest.fixture(scope="module")
def big():
    rng = np.random.default_rng(41)
    seg, corpus = make_corpus(
        rng, n_docs=80_000, vocab=2000, doc_len_rng=(3, 12), id_stride=1
    )
    return Executor(seg), corpus


@pytest.mark.parametrize(
    "qtext",
    [
        "t0",
        "t3 OR t9 OR t21",
        "t1 OR t500 OR t1999",
        "t0 t1",
        "t5 t9 t13",
        "t1999",  # rare
    ],
)
def test_pruned_exact(big, qtext):
    ex, _ = big
    dense = ex.search(qtext, k=10)
    pruned = ex.search_pruned(qtext, k=10, chunk_windows=2)
    assert [(r.doc_id, r.score) for r in pruned] == [
        (r.doc_id, r.score) for r in dense
    ], qtext


def test_pruned_not_shape(big):
    """`flat NOT rhs` now prunes with the lhs bound (sound: the rhs only
    removes matches); results stay exact."""
    ex, _ = big
    for q in ("t0 NOT t1", "t3 OR t9 NOT t21"):
        assert [(r.doc_id, r.score) for r in ex.search_pruned(q, k=10)] == [
            (r.doc_id, r.score) for r in ex.search(q, k=10)
        ], q


def test_pruned_matches_empty_routes_dense(big):
    """Tapes that match a doc containing NONE of their terms (e.g. an OR
    with an optional branch) are unsound for the WAND presence bound AND
    for the chunk evaluator's zeroed-cell padding trick (dead pad rows
    would surface every doc of a duplicated window as a score-0 match).
    They must route to the dense batch and stay exact."""
    ex, _ = big
    for q in ("t0 OR <t1>", "<t1> OR t0"):
        before = _rounds()
        pruned = ex.search_pruned(q, k=10, chunk_windows=2)
        assert _rounds() == before, q  # no pruned chunk ran: dense fallback
        dense = ex.search(q, k=10)
        assert [(r.doc_id, r.score) for r in pruned] == [
            (r.doc_id, r.score) for r in dense
        ], q


def test_pruned_fallback_on_complex(big):
    ex, _ = big
    q = '"t0 t1" OR t3'  # phrase shape -> dense fallback
    assert [(r.doc_id, r.score) for r in ex.search_pruned(q, k=10)] == [
        (r.doc_id, r.score) for r in ex.search(q, k=10)
    ]


@pytest.mark.parametrize(
    "qtext",
    [
        "[t0,t3,t9]",  # MatchSome 1-of-n
        "(t0 t1) OR (t5 t9)",  # OR-of-AND
        "(t0 OR t3) t9",  # AND-of-OR
        "t0 ([t1,t5] OR t13)",  # nested mix
        "(t3 OR t9) NOT (t0 t1)",  # NOT with compound rhs
    ],
)
def test_pruned_exact_general_shapes(big, qtext):
    """Round-3 generalized bounds (_tape_window_bounds): ANY boolean tape
    prunes — MatchSome, OR-of-AND, nested — with exact results, both
    single-query and batched (docset_iterators.h:38-60)."""
    ex, _ = big
    dense = ex.search(qtext, k=10)
    pruned = ex.search_pruned(qtext, k=10, chunk_windows=2)
    assert [(r.doc_id, r.score) for r in pruned] == [
        (r.doc_id, r.score) for r in dense
    ], qtext
    batched = ex.search_pruned_batch([qtext, qtext], k=10, chunk_windows=2)
    for rb in batched:
        assert [(r.doc_id, r.score) for r in rb] == [
            (r.doc_id, r.score) for r in dense
        ], qtext


def test_pruned_skips_windows_general_shape():
    """The generalized bound must actually skip windows for a compound
    tape (OR-of-AND) on a skewed corpus, not just stay exact."""
    from trinity_tpu.index.builder import SegmentIndexSession

    sess = SegmentIndexSession()
    docs, dids = [], []
    for d in range(100_000):
        if 40_000 <= d < 40_100:
            docs.append(["hot"] * 8 + ["warm"] * 4 + ["filler"])
        else:
            docs.append(["hot", "warm", "filler"] if d % 7 == 0 else ["filler"])
        dids.append(d)
    sess.bulk_index(dids, docs)
    ex = Executor(sess.commit())

    q = "(hot warm) OR [hot,warm]"
    before = _rounds()
    pruned = ex.search_pruned(q, k=10, chunk_windows=1)
    calls = _rounds() - before
    dense = ex.search(q, k=10)
    assert [(r.doc_id, r.score) for r in pruned] == [
        (r.doc_id, r.score) for r in dense
    ]
    W = ex.seg.n_windows
    assert 0 < calls < W, f"no pruning happened ({calls} of {W} windows)"


def test_pruned_skips_windows():
    """With a skewed corpus (high-scoring docs concentrated in one window)
    the bound must actually prune: count device chunk evaluations."""
    from trinity_tpu.index.builder import SegmentIndexSession

    sess = SegmentIndexSession()
    docs = []
    ids = []
    for d in range(100_000):
        # window 2 (docids 32768..49151) holds all the high-freq docs
        if 40_000 <= d < 40_100:
            docs.append(["hot"] * 8 + ["filler"])
        else:
            docs.append(["hot", "filler"] if d % 7 == 0 else ["filler"])
        ids.append(d)
    sess.bulk_index(ids, docs)
    ex = Executor(sess.commit())

    before = _rounds()
    pruned = ex.search_pruned("hot", k=10, chunk_windows=1)
    calls = _rounds() - before
    dense = ex.search("hot", k=10)
    assert [(r.doc_id, r.score) for r in pruned] == [
        (r.doc_id, r.score) for r in dense
    ]
    W = ex.seg.n_windows
    assert 0 < calls < W, f"no pruning happened ({calls} of {W} windows)"


def test_pruned_batch_matches_batch(big):
    """search_pruned_batch must equal search_batch exactly — incl. repeated
    queries, fallback shapes (NOT, phrase), and empty queries."""
    ex, _ = big
    qs = [
        "t0 t1",
        "t3 OR t9 OR t21",
        "t0 t1",  # repeat -> same group
        "t5 t9 t13",
        "t0 NOT t1",  # NOT shape (prunes with lhs bound since r2)
        '"t0 t1"',  # phrase fallback
        "[t0,t3,t9]",  # MatchSome (prunes since r3 generalized bounds)
        "(t0 t1) OR (t5 t9)",  # OR-of-AND (r3)
        "t1999",
    ]
    a = ex.search_batch(qs, k=10)
    b = ex.search_pruned_batch(qs, k=10, chunk_windows=2)
    for q, ra, rb in zip(qs, a, b):
        assert [(r.doc_id, r.score) for r in ra] == [
            (r.doc_id, r.score) for r in rb
        ], q


def test_pruned_batch_stops_early():
    """The shared-order batch loop must stop before exhausting windows on a
    skewed corpus (per-query thresholds beat the remaining bounds)."""
    from trinity_tpu.index.builder import SegmentIndexSession

    sess = SegmentIndexSession()
    docs, dids = [], []
    for d in range(100_000):
        if 40_000 <= d < 40_100:
            docs.append(["hot"] * 8 + ["warm"] * 4 + ["filler"])
        else:
            docs.append(["hot", "warm", "filler"] if d % 7 == 0 else ["filler"])
        dids.append(d)
    sess.bulk_index(dids, docs)
    ex = Executor(sess.commit())

    before = _rounds()
    pruned = ex.search_pruned_batch(
        ["hot", "warm", "hot warm"], k=10, chunk_windows=1
    )
    calls = _rounds() - before
    dense = ex.search_batch(["hot", "warm", "hot warm"], k=10)
    for ra, rb in zip(dense, pruned):
        assert [(r.doc_id, r.score) for r in ra] == [
            (r.doc_id, r.score) for r in rb
        ]
    W = ex.seg.n_windows
    assert 0 < calls < W, f"no pruning happened ({calls} of {W} rounds)"
