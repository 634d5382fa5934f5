"""Default rich-match execution mode (matched_document semantics,
matches.h:117-186)."""

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from trinity_tpu.exec.richmatch import AbortSearch, exec_rich
from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.oracle import OracleCorpus, oracle_match_ids
from trinity_tpu.query.parser import parse_query


DOCS = {
    10: "apple iphone case with apple logo",
    11: "samsung case",
    12: "apple macbook pro",
    13: "new york apple store",
    14: "case closed",
}


@pytest.fixture(scope="module")
def ex():
    sess = SegmentIndexSession()
    for d, text in DOCS.items():
        p = sess.begin(d)
        for i, t in enumerate(text.split(), 1):
            p.insert(t, i)
        sess.insert(p)
    return Executor(sess.commit())


def corpus():
    c = OracleCorpus()
    for d, text in DOCS.items():
        c.add(d, text.split())
    return c


def collect(ex, q):
    out = []
    exec_rich(ex, q, out.append)
    return out


def test_matched_docs_order_and_terms(ex):
    got = collect(ex, "apple case")
    assert [m.doc_id for m in got] == [10]
    m = got[0]
    apple = m.term("apple")
    assert apple.freq == 2
    assert [h.pos for h in apple.hits] == [1, 5]
    assert m.term("case").freq == 1
    assert m.dws.test("apple", 1) and m.dws.test("case", 3)
    assert not m.dws.test("apple", 2)


def test_match_set_equals_oracle(ex):
    for q in ["apple", "apple OR case", "case -apple", "[apple, samsung, closed]"]:
        got = [m.doc_id for m in collect(ex, q)]
        want = oracle_match_ids(corpus(), parse_query(q).root)
        assert got == want, q


def test_phrase_exact_in_rich_mode(ex):
    got = collect(ex, '"new york"')
    assert [m.doc_id for m in got] == [13]
    assert got[0].dws.test_phrase(["new", "york"], 1)
    # relaxed-candidate rejection: doc with both words non-adjacent
    got = collect(ex, '"york new"')
    assert got == []


def test_abort_search(ex):
    seen = []

    def cb(m):
        seen.append(m.doc_id)
        raise AbortSearch

    n = exec_rich(ex, "apple OR case", cb)
    assert len(seen) == 1 and n == 0


def test_optional_capture(ex):
    """<case> contributes capture when present but never gates matching."""
    got = collect(ex, "apple <case>")
    assert [m.doc_id for m in got] == [10, 12, 13]
    by_id = {m.doc_id: m for m in got}
    assert by_id[10].term("case") is not None
    assert by_id[12].term("case") is None


def test_payload_materialization():
    """term_hit payloads round-trip (runtime.h:8-20)."""
    sess = SegmentIndexSession(track_payloads=True)
    p = sess.begin(7)
    p.insert("alpha", 1, payload=0xBEEF)
    p.insert("beta", 2, payload=42)
    p.insert("alpha", 3, payload=0xCAFE)
    sess.insert(p)
    ex = Executor(sess.commit())
    got = []
    exec_rich(ex, "alpha beta", got.append)
    assert len(got) == 1
    alpha = got[0].term("alpha")
    assert [(h.pos, h.payload) for h in alpha.hits] == [(1, 0xBEEF), (3, 0xCAFE)]
    assert got[0].term("beta").hits[0].payload == 42
