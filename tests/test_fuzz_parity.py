"""Property test: random ASTs, engine vs oracle must agree exactly.

The TPU analog of TRINITY_VERIFY_HITS-style self-checking (SURVEY §5.2):
random boolean/phrase trees (including shapes the text parser cannot
produce, like MatchSome with min > 1) evaluated both by the dense device
engine and the naive oracle.
"""

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from trinity_tpu.oracle import oracle_match_ids, oracle_search
from trinity_tpu.query.ast import (
    BinOp,
    ConstTrueExpr,
    MatchSome,
    Op,
    Phrase,
    Term,
    Token,
    UnaryOp,
)
from tests.test_exec_e2e import make_corpus


def random_tree(rng, vocab, depth):
    r = rng.random()
    if depth <= 0 or r < 0.35:
        if rng.random() < 0.2:
            terms = [Term(f"t{int(x)}") for x in rng.integers(0, vocab, 2)]
            return Phrase(terms=terms, is_phrase=True)
        return Token(f"t{int(rng.integers(0, vocab))}")
    kind = rng.integers(0, 6)
    if kind == 0:
        return BinOp(Op.AND, random_tree(rng, vocab, depth - 1), random_tree(rng, vocab, depth - 1))
    if kind == 1:
        return BinOp(Op.OR, random_tree(rng, vocab, depth - 1), random_tree(rng, vocab, depth - 1))
    if kind == 2:
        return BinOp(Op.NOT, random_tree(rng, vocab, depth - 1), random_tree(rng, vocab, depth - 1))
    if kind == 3:
        return ConstTrueExpr(random_tree(rng, vocab, depth - 1))
    if kind == 4:
        n = int(rng.integers(2, 5))
        return MatchSome(
            nodes=[random_tree(rng, vocab, depth - 1) for _ in range(n)],
            min=int(rng.integers(1, n + 1)),
        )
    return UnaryOp(Op.NOT, Token(f"t{int(rng.integers(0, vocab))}"))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(99)
    seg, oc = make_corpus(rng, n_docs=400, vocab=40, doc_len_rng=(3, 25), id_stride=2)
    return Executor(seg), oc


@pytest.mark.parametrize("seed", range(30))
def test_random_tree_parity(corpus, seed):
    ex, oc = corpus
    rng = np.random.default_rng(seed)
    root = random_tree(rng, vocab=40, depth=3)
    got = ex.search(root, k=10)
    want = oracle_search(oc, root, k=10)
    assert [r.doc_id for r in got] == [d for d, _ in want], repr(root)
    np.testing.assert_allclose(
        [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
    )
    np.testing.assert_array_equal(
        ex.match_ids(root), np.array(oracle_match_ids(oc, root), np.uint32)
    )
    # the pruned path must be indistinguishable from dense on ANY shape:
    # phrase/matches-empty roots route to the dense fallback, the rest run
    # the chunk evaluator (W=1 with chunk_windows=2 exercises the
    # padding-duplicate window neutralization on every chunk)
    pruned = ex.search_pruned(root, k=10, chunk_windows=2)
    assert [(r.doc_id, r.score) for r in pruned] == [
        (r.doc_id, r.score) for r in got
    ], repr(root)
