"""Percolator parity vs oracle match semantics (percolator.cpp:9-137)."""

import numpy as np
import pytest

from trinity_tpu.oracle import OracleCorpus, oracle_match_ids
from trinity_tpu.percolator import Percolator
from trinity_tpu.query.parser import parse_query

QUERIES = [
    "apple",
    "apple iphone",
    "apple OR samsung",
    "apple NOT iphone",
    "apple -iphone",
    "(mac OR macbook) pro",
    "[apple, samsung, nokia]",
    '"mac pro"',
    '"apple iphone" OR samsung',
    "apple <pro>",
    "nosuchterm",
    "-negonly",
    "a b OR c",
]

DOCS = [
    "apple iphone case",
    "samsung galaxy",
    "apple pro display",
    "mac pro tower",
    "macbook pro retina",
    "nokia brick phone",
    "apple iphone samsung nokia",
    "pro apple",
    "the quick brown fox",
    "apple mac pro iphone",
    "a b z",
    "a c z",
    "b c z",
]


@pytest.fixture(scope="module")
def setup():
    p = Percolator()
    qids = [p.register(q) for q in QUERIES]
    return p, qids


def oracle_expected(qtext, docs):
    corpus = OracleCorpus()
    for i, text in enumerate(docs):
        corpus.add(i, text.split())
    q = parse_query(qtext)
    return oracle_match_ids(corpus, q.root)


def test_batch_match_parity(setup):
    p, qids = setup
    docs = [d.split() for d in DOCS]
    m = p.match_batch(docs)
    assert m.shape == (len(DOCS), len(QUERIES))
    for qi, qtext in enumerate(QUERIES):
        got = list(np.flatnonzero(m[:, qi]))
        want = oracle_expected(qtext, DOCS)
        assert got == want, f"query {qtext!r}: got {got} want {want}"


def test_single_match(setup):
    p, _ = setup
    hits = p.match("apple iphone case".split())
    assert QUERIES.index("apple") in hits
    assert QUERIES.index("apple iphone") in hits
    assert QUERIES.index("apple NOT iphone") not in hits


def test_incremental_register():
    p = Percolator()
    q1 = p.register("foo bar")
    assert p.match(["foo", "bar"]) == [q1]
    q2 = p.register("foo NOT bar")
    assert p.match(["foo"]) == [q2]
    assert p.match(["foo", "bar"]) == [q1]


def test_null_query_never_matches():
    p = Percolator()
    qid = p.register("-onlynegative")
    assert p.match(["onlynegative", "x"]) == []
    assert qid == 0


def test_phrase_adjacency():
    p = Percolator()
    p.register('"new york"')
    assert p.match("i love new york".split()) == [0]
    assert p.match("york new haven".split()) == []


def test_many_queries_scale():
    """Thousands of registered queries in one device program."""
    rng = np.random.default_rng(0)
    p = Percolator()
    vocab = [f"w{i}" for i in range(50)]
    for i in range(2000):
        a, b, c = rng.choice(50, 3, replace=False)
        kind = i % 4
        if kind == 0:
            p.register(f"w{a} w{b}")
        elif kind == 1:
            p.register(f"w{a} OR w{b}")
        elif kind == 2:
            p.register(f"w{a} NOT w{b}")
        else:
            p.register(f"[w{a}, w{b}, w{c}]")
    docs = [
        [f"w{int(x)}" for x in rng.choice(50, 8, replace=False)]
        for _ in range(64)
    ]
    m = p.match_batch(docs)
    assert m.shape == (64, 2000)
    # spot-check 5 random (doc, query) pairs against the oracle
    corpus_docs = docs
    for qi in rng.choice(2000, 5, replace=False):
        # rebuild the oracle expectation for this one query
        qtext_kind = qi % 4
        # direct eval through oracle by re-parsing from registration order
        # (registration i used the same rng stream; instead just sanity-check
        # internal consistency: matched docs contain the needed terms)
        pass
    # cross-check full consistency for the first 50 queries via oracle
    p2 = Percolator()
    texts = []
    rng2 = np.random.default_rng(0)
    for i in range(2000):
        a, b, c = rng2.choice(50, 3, replace=False)
        kind = i % 4
        if kind == 0:
            t = f"w{a} w{b}"
        elif kind == 1:
            t = f"w{a} OR w{b}"
        elif kind == 2:
            t = f"w{a} NOT w{b}"
        else:
            t = f"[w{a}, w{b}, w{c}]"
        texts.append(t)
    corpus = OracleCorpus()
    for i, toks in enumerate(corpus_docs):
        corpus.add(i, toks)
    for qi in list(range(20)) + [1999, 1000]:
        want = oracle_match_ids(corpus, parse_query(texts[qi]).root)
        got = list(np.flatnonzero(m[:, qi]))
        assert got == want, texts[qi]


def test_percolator_scale_with_phrases():
    """BASELINE config #4 measured: thousands of registered queries
    (phrase-heavy) against a document batch — the vectorized phrase
    incidence + cached program pack must sustain throughput, and results
    must match the per-document reference walk."""
    import time

    rng = np.random.default_rng(55)
    perc = Percolator()
    n_q = 3000
    texts = []
    for i in range(n_q):
        a, b, c = (int(x) for x in rng.integers(0, 200, 3))
        kind = i % 4
        if kind == 0:
            texts.append(f"v{a} v{b}")
        elif kind == 1:
            texts.append(f"v{a} OR v{b} OR v{c}")
        elif kind == 2:
            texts.append(f'"v{a} v{b}"')
        else:
            texts.append(f"v{a} NOT v{b}")
        perc.register(texts[-1])
    docs = [
        [f"v{int(x)}" for x in rng.integers(0, 200, 30)] for _ in range(1000)
    ]
    t0 = time.time()
    m = perc.match_batch(docs)
    wall = time.time() - t0
    assert m.shape == (1000, n_q)
    rate = 1000 * n_q / wall
    print(f"percolator: {rate/1e6:.2f}M (doc,query) evals/s, {wall:.2f}s")
    # budget: 3M pair evaluations with phrases in bounded time even on the
    # 1-core CPU test host (was minutes with per-pair Python adjacency)
    assert wall < 120.0
    # spot-check 30 (doc, query) pairs against the reference semantics
    from trinity_tpu.oracle import OracleCorpus, oracle_match_ids

    for di in rng.integers(0, 1000, 5):
        corpus = OracleCorpus()
        corpus.add(0, docs[int(di)])
        for qi in rng.integers(0, n_q, 6):
            q = parse_query(texts[int(qi)])
            want = bool(len(oracle_match_ids(corpus, q.root)))
            assert bool(m[int(di), int(qi)]) == want, (di, qi)


def test_chunked_query_eval_matches_unchunked(monkeypatch):
    """The query axis chunks when the push-table/stack budget is exceeded
    (regression: a 5000-query x 512-doc batch OOMed the device at 18.3 GB
    via a vmapped-switch broadcast before the pre-gathered push table).
    Forcing a tiny budget must produce identical results to one program."""
    from trinity_tpu import percolator as P

    rng = np.random.default_rng(3)
    p = Percolator()
    for i in range(300):
        a, b = rng.choice(40, 2, replace=False)
        p.register(f"w{a} w{b}" if i % 2 else f"w{a} OR w{b}")
    docs = [
        [f"w{int(x)}" for x in rng.choice(40, 10, replace=False)]
        for _ in range(32)
    ]
    want = p.match_batch(docs)
    monkeypatch.setattr(P, "_CHUNK_BUDGET_BYTES", 1)  # chunk floor = 256 < 300
    p._device_state = None
    got = p.match_batch(docs)
    np.testing.assert_array_equal(got, want)


def test_match_stream_matches_match_batch():
    """match_stream (pipelined dispatch) yields exactly match_batch's
    results, in order, including after a mid-stream-invalidating register."""
    rng = np.random.default_rng(9)
    p = Percolator()
    for i in range(200):
        a, b = rng.choice(30, 2, replace=False)
        p.register(f"w{a} w{b}" if i % 3 else f"w{a} NOT w{b}")
    batches = [
        [
            [f"w{int(x)}" for x in rng.choice(30, 8, replace=False)]
            for _ in range(16 + bi)  # varying batch sizes
        ]
        for bi in range(4)
    ]
    want = [p.match_batch(d) for d in batches]
    got = list(p.match_stream(batches))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # registration invalidates the staged device programs
    p.register("w0 w1 w2")
    m = p.match_batch(batches[0])
    assert m.shape == (16, 201)
