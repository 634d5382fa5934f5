"""Query rewriting framework (queries_rewrite.h analog)."""

import numpy as np

from trinity_tpu.oracle import OracleCorpus, oracle_match_ids
from trinity_tpu.query.ast import Phrase, node_to_str
from trinity_tpu.query.parser import parse_query
from trinity_tpu.query.rewrite import Alternative, collect_runs, rewrite_query


def synonyms(window):
    table = {
        ("ipod",): [Alternative(["ipod", "touch"], 0.8)],
        ("mac",): [Alternative(["macintosh"], 0.9), Alternative(["apple"], 0.5)],
        ("new", "york"): [Alternative(["nyc"], 0.9)],
    }
    return table.get(tuple(window), [])


def test_single_token_synonym():
    q = parse_query("mac")
    r = rewrite_query(q, synonyms)
    s = node_to_str(r.root)
    assert "macintosh" in s and "apple" in s and "mac" in s
    # semantics: OR of original and alternatives
    corpus = OracleCorpus()
    corpus.add(1, ["mac"])
    corpus.add(2, ["macintosh"])
    corpus.add(3, ["apple"])
    corpus.add(4, ["windows"])
    assert oracle_match_ids(corpus, r.root) == [1, 2, 3]


def test_window_merge_alternative():
    """A 2-token window replaced by one token: [new york] -> nyc."""
    q = parse_query("new york pizza")
    r = rewrite_query(q, synonyms)
    corpus = OracleCorpus()
    corpus.add(1, ["new", "york", "pizza"])
    corpus.add(2, ["nyc", "pizza"])
    corpus.add(3, ["nyc"])  # no pizza -> no match
    corpus.add(4, ["new", "pizza"])
    assert oracle_match_ids(corpus, r.root) == [1, 2]


def test_expansion_alternative():
    """One token expands to two: ipod -> ipod touch."""
    q = parse_query("ipod case")
    r = rewrite_query(q, synonyms)
    corpus = OracleCorpus()
    corpus.add(1, ["ipod", "case"])
    corpus.add(2, ["ipod", "touch", "case"])
    corpus.add(3, ["touch", "case"])
    got = oracle_match_ids(corpus, r.root)
    assert got == [1, 2]


def test_rewrite_ctx_provenance():
    q = parse_query("new york pizza")
    r = rewrite_query(q, synonyms)

    found = []

    def walk(n):
        from trinity_tpu.query.ast import BinOp

        if isinstance(n, Phrase):
            if n.rewrite_ctx.range is not None:
                found.append(
                    (n.terms[0].text, n.rewrite_ctx.range,
                     n.rewrite_ctx.translation_coefficient,
                     n.rewrite_ctx.src_seq_size)
                )
        elif isinstance(n, BinOp):
            walk(n.lhs)
            walk(n.rhs)

    walk(r.root)
    assert ("nyc", (0, 2), 0.9, 2) in found


def test_budget_caps_blowup():
    def explosive(window):
        return [Alternative([f"alt{i}-{'-'.join(window)}"]) for i in range(50)]

    q = parse_query("a b c d e f g h")
    r = rewrite_query(q, explosive, k=3, budget=64)
    # bounded: well under the unbudgeted size
    s = node_to_str(r.root)
    assert s.count("alt") <= 64 + 50  # budget + one final window burst


def test_untouched_when_no_alternatives():
    q = parse_query("plain tokens here")
    r = rewrite_query(q, lambda w: [])
    corpus = OracleCorpus()
    corpus.add(1, ["plain", "tokens", "here"])
    corpus.add(2, ["plain", "tokens"])
    assert oracle_match_ids(corpus, r.root) == [1]


def test_negations_not_expanded():
    q = parse_query("mac -ipod")
    r = rewrite_query(q, synonyms)
    corpus = OracleCorpus()
    corpus.add(1, ["macintosh"])
    corpus.add(2, ["macintosh", "ipod"])
    assert oracle_match_ids(corpus, r.root) == [1]


def test_collect_runs():
    q = parse_query('alpha beta "a phrase" gamma OR delta')
    runs = collect_runs(q)
    texts = [[p.terms[0].text for p in run] for run in runs]
    assert ["alpha", "beta"] in texts


def _count_nodes(n):
    from trinity_tpu.query.ast import BinOp, ConstTrueExpr, MatchSome, UnaryOp

    if n is None:
        return 0
    if isinstance(n, BinOp):
        return 1 + _count_nodes(n.lhs) + _count_nodes(n.rhs)
    if isinstance(n, (UnaryOp, ConstTrueExpr)):
        return 1 + _count_nodes(n.expr)
    if isinstance(n, MatchSome):
        return 1 + sum(_count_nodes(c) for c in n.nodes)
    return 1


def test_span_sharing_linear_blowup():
    """Span sharing (queries_rewrite.h:16-182): non-overlapping
    alternatives factor as AND-of-OR-groups, so node count grows LINEARLY
    with run length — and no alternative is lost to the budget. The
    unshared prefix expansion duplicated every tail: 2^n leaves for n
    tokens with one alternative each."""
    per_token = lambda w: (
        [Alternative(tokens=(f"alt_{w[0]}",))] if len(w) == 1 else []
    )
    sizes = []
    for n in (4, 8, 12):
        q = parse_query(" ".join(f"t{i}" for i in range(n)))
        r = rewrite_query(q, per_token, k=3, budget=256)
        s = node_to_str(r.root)
        # every alternative survives (exponential form lost them to budget)
        assert all(f"alt_t{i}" in s for i in range(n)), s
        sizes.append(_count_nodes(r.root))
    # linear growth: doubling the run roughly doubles the nodes
    assert sizes[1] <= 2 * sizes[0] + 8, sizes
    assert sizes[2] <= 3 * sizes[0] + 12, sizes


def test_span_sharing_overlap_still_branches():
    """Overlapping spans (no cut point between them) still branch and stay
    correct: both multi-token alternatives compete as full paths."""

    def alts(w):
        if w == ("new", "york"):
            return [Alternative(tokens=("ny",))]
        if w == ("york", "city"):
            return [Alternative(tokens=("yc",))]
        return []

    q = parse_query("new york city")
    r = rewrite_query(q, alts, k=2)
    corpus = OracleCorpus()
    corpus.add(1, ["ny", "city"])
    corpus.add(2, ["new", "yc"])
    corpus.add(3, ["new", "york", "city"])
    corpus.add(4, ["ny", "yc"])  # ny + yc: no complete path (overlap)
    corpus.add(5, ["new", "york"])
    assert oracle_match_ids(corpus, r.root) == [1, 2, 3]


def test_altcache_cross_call_memo():
    """AltCache (the gen_ctx analog, queries_rewrite.h:187-243): repeated/
    overlapping windows across rewrite_query calls never re-invoke the
    provider, per logical index; results stay identical to uncached."""
    from trinity_tpu.query.ast import node_to_str
    from trinity_tpu.query.rewrite import AltCache

    calls = []

    def provider(w):
        calls.append(tuple(w))
        return synonyms(w)

    cache = AltCache()
    r1 = rewrite_query(parse_query("new york mac"), provider, cache=cache)
    n_first = len(calls)
    assert n_first > 0
    r2 = rewrite_query(parse_query("new york mac"), provider, cache=cache)
    assert len(calls) == n_first  # every window memoized
    assert node_to_str(r2.root) == node_to_str(r1.root)
    # overlapping-but-new windows only invoke for the NEW windows
    rewrite_query(parse_query("new york city"), provider, cache=cache)
    fresh = calls[n_first:]
    assert ("new", "york") not in fresh and ("city" in w for w in fresh)
    # a different logical index does NOT share entries
    before = len(calls)
    rewrite_query(parse_query("new york mac"), provider, cache=cache,
                  logical_index=7)
    assert len(calls) > before
    # uncached baseline: same output tree
    r0 = rewrite_query(parse_query("new york mac"), synonyms)
    assert node_to_str(r0.root) == node_to_str(r1.root)


def test_leader_nodes():
    """leader_nodes (queries.cpp:1464-1497): a minimal node set such that
    every matching doc matches at least one leader — OR contributes both
    branches, AND one, NOT only the positive side, optionals none."""

    def leads(qs):
        return sorted(
            " ".join(t.text for t in p.terms)
            for p in parse_query(qs).leader_nodes()
        )

    assert leads("apple") == ["apple"]
    assert leads("apple banana") == ["apple"]
    assert leads("apple OR banana") == ["apple", "banana"]
    assert leads("(apple OR banana) cherry") == ["apple", "banana"]
    assert leads('"red apple" OR pear') == ["pear", "red apple"]
    assert leads("apple NOT banana") == ["apple"]
    assert leads("apple <case>") == ["apple"]


def test_subexpressions_offsets():
    """subexpressions_offsets (queries.cpp:1923-1989): starting token index
    per independent span segment; phrases/ORs collapse to one segment."""
    assert parse_query("apple banana").subexpressions_offsets() == [0, 1]
    assert parse_query("apple OR banana").subexpressions_offsets() == [0]
    assert parse_query('"new york" city').subexpressions_offsets() == [0, 2]
    assert parse_query("apple NOT banana").subexpressions_offsets() == [0]
    q = parse_query("(apple OR banana) cherry")
    assert q.subexpressions_offsets() == [0, 1]
    assert q.subexpressions_count() == 2
    assert parse_query("").subexpressions_offsets() == []
