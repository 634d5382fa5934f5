import pytest

from trinity_tpu.query.ast import (
    BinOp,
    ConstTrueExpr,
    MatchSome,
    Op,
    Phrase,
    UnaryOp,
    node_to_str,
)
from trinity_tpu.query.parser import ParserFlags, parse_query


def P(text, normalize=False, **kw):
    return parse_query(text, normalize=normalize, **kw)


def test_single_token():
    q = P("apple")
    assert isinstance(q.root, Phrase)
    assert not q.root.is_phrase
    assert q.root.terms[0].text == "apple"


def test_implicit_and():
    q = P("apple iphone")
    r = q.root
    assert isinstance(r, BinOp) and r.op is Op.AND
    assert r.lhs.terms[0].text == "apple"
    assert r.rhs.terms[0].text == "iphone"


def test_keyword_and_is_strict():
    q = P("apple AND iphone")
    assert q.root.op is Op.STRICT_AND


def test_or_pipe():
    assert P("a OR b").root.op is Op.OR
    assert P("a | b").root.op is Op.OR
    assert P("a || b").root.op is Op.OR


def test_not_forms():
    q = P("apple NOT iphone")
    assert q.root.op is Op.NOT
    q = P("apple -iphone")
    assert q.root.op is Op.NOT


def test_plus_prefix_unary():
    q = P("+apple")
    assert isinstance(q.root, UnaryOp) and q.root.op is Op.STRICT_AND


def test_reference_associativity():
    # queries.cpp parse_subexpr: `prio < limit` — OR binds tighter than AND
    # in a right operand: [a AND b OR c] == [a AND (b OR c)]
    r = P("a AND b OR c").root
    assert r.op is Op.STRICT_AND
    assert isinstance(r.rhs, BinOp) and r.rhs.op is Op.OR
    # [a OR b AND c] == [(a OR b) AND c]
    r = P("a OR b AND c").root
    assert r.op is Op.STRICT_AND
    assert isinstance(r.lhs, BinOp) and r.lhs.op is Op.OR


def test_parens():
    r = P("(a OR b) c").root
    assert r.op is Op.AND
    assert isinstance(r.lhs, BinOp) and r.lhs.op is Op.OR


def test_phrase():
    r = P('"macbook pro" apple').root
    assert r.op is Op.AND
    assert isinstance(r.lhs, Phrase) and r.lhs.is_phrase
    assert [t.text for t in r.lhs.terms] == ["macbook", "pro"]


def test_single_token_phrase_stays_phrase():
    r = P('"ipad"').root
    assert isinstance(r, Phrase) and r.is_phrase and r.size == 1


def test_rep_dedup():
    # [apple AND apple] => rep=2 (queries.cpp:509-515)
    r = P("apple apple").root
    assert isinstance(r, Phrase) and r.rep == 2


def test_const_true_expr():
    r = P("<foo> bar").root
    assert r.op is Op.AND
    assert isinstance(r.lhs, ConstTrueExpr)


def test_match_some():
    r = P("[a, b, c]").root
    assert isinstance(r, MatchSome) and len(r.nodes) == 3 and r.min == 1


def test_keywords_as_tokens_flag():
    q = P("apple AND iphone", flags=ParserFlags.AND_AS_TOKEN)
    # AND becomes a token -> apple AND iphone are three AND'ed tokens
    assert node_to_str(q.root) == "((apple AND) iphone)"


def test_acronym_tokenizer():
    r = P("I.B.M think").root
    assert r.lhs.terms[0].text == "IBM"


def test_dash_inside_word():
    # "san francisco-based": '-' after token is not NOT (queries.cpp:43-47)
    r = P("francisco-based").root
    assert isinstance(r, BinOp) and r.op is Op.AND
    assert r.lhs.terms[0].text == "francisco"
    assert r.rhs.terms[0].text == "based"


# ----------------------------------------------------------------- normalize
def N(text, **kw):
    return parse_query(text, normalize=True, **kw)


def test_normalize_dup_or():
    assert node_to_str(N("apple OR apple").root) == "apple"


def test_normalize_contradiction():
    assert N("foo AND bar NOT foo").root is None


def test_normalize_or_not_same():
    assert node_to_str(N("foo OR bar NOT foo").root) == "bar"


def test_normalize_only_negative_is_null():
    assert N("-foo").root is None


def test_normalize_only_optional_is_null():
    assert N("<foo>").root is None


def test_normalize_false_propagation():
    # a AND (b NOT b) -> ConstFalse -> null
    assert N("a (b NOT b)").root is None
    # a OR (b NOT b) -> a
    assert node_to_str(N("a OR (b NOT b)").root) == "a"


def test_assign_indices_simple():
    q = N("apple iphone case")
    # collect phrases in order
    idx = {}

    def walk(n):
        if isinstance(n, Phrase):
            idx[n.terms[0].text] = (n.index, n.to_next_span)
        elif isinstance(n, BinOp):
            walk(n.lhs)
            walk(n.rhs)

    walk(q.root)
    assert idx["apple"] == (0, 1)
    assert idx["iphone"] == (1, 1)
    assert idx["case"] == (2, 0)
    assert q.tokens_count == 3


def test_assign_indices_phrase_spans():
    q = N('"macbook pro" case')
    phrases = []

    def walk(n):
        if isinstance(n, Phrase):
            phrases.append(n)
        elif isinstance(n, BinOp):
            walk(n.lhs)
            walk(n.rhs)

    walk(q.root)
    mb, case = phrases
    assert mb.index == 0 and mb.to_next_span == 2  # phrase spans 2 slots
    assert case.index == 2


def test_assign_indices_or_overlap():
    # OR branches share start index (queries.cpp:1230-1243)
    q = N("(a OR (b c)) d")
    pos = {}

    def walk(n):
        if isinstance(n, Phrase):
            pos[n.terms[0].text] = n.index
        elif isinstance(n, BinOp):
            walk(n.lhs)
            walk(n.rhs)

    walk(q.root)
    assert pos["a"] == 0 and pos["b"] == 0 and pos["c"] == 1
    assert pos["d"] == 2


def test_oversized_query_trimmed_not_nullified():
    """Queries over MaxQueryTokens are trimmed to the cap (query::trim,
    queries.cpp:1503), not nullified: leading tokens survive."""
    from trinity_tpu.limits import MAX_QUERY_TOKENS

    big = " ".join(f"t{i}" for i in range(MAX_QUERY_TOKENS + 50))
    q = P(big, normalize=True)
    assert q.root is not None
    # leading token retained, trailing token dropped
    s = node_to_str(q.root)
    assert "t0" in s
    assert f"t{MAX_QUERY_TOKENS + 49}" not in s
