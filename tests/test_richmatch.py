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


def test_payload_len_bytes_roundtrip(tmp_path):
    """payloadLen round-trips: the app writes a payload BYTE SPAN per hit
    (codecs.h:176-200 Encoder payload span) and reads back term_hit
    {payload, payloadLen} (runtime.h:8-20) — including through
    persist/load."""
    from trinity_tpu.index.format import SegmentData

    sess = SegmentIndexSession(track_payloads=True)
    p = sess.begin(3)
    p.insert("alpha", 1, payload=b"\x01\x02")          # 2 meaningful bytes
    p.insert("alpha", 2, payload=0xBEEF, payload_len=3)  # explicit len
    p.insert("alpha", 3, payload=7)                    # int default: 8
    p.insert("beta", 4, payload=b"")                   # empty span: len 0
    sess.insert(p)
    d = tmp_path / "seg"
    sess.commit().persist(str(d))
    ex = Executor(SegmentData.load(str(d)))
    got = []
    exec_rich(ex, "alpha beta", got.append)
    assert len(got) == 1
    hits = got[0].term("alpha").hits
    assert [(h.payload, h.payload_len) for h in hits] == [
        (0x0201, 2), (0xBEEF, 3), (7, 8)
    ]
    assert hits[0].payload_bytes() == b"\x01\x02"
    assert hits[1].payload_bytes() == b"\xef\xbe\x00"
    bh = got[0].term("beta").hits[0]
    assert (bh.payload, bh.payload_len, bh.payload_bytes()) == (0, 0, b"")


def test_proximity_metadata_scoring():
    """Score by term adjacency using ONLY callback data (the reference's
    headline rich-match use case, exec.cpp:694-873 + matches.h:17-32):
    query_index_terms gives each term's query index and toNextSpan; the
    callback boosts documents whose matched terms appear in query order at
    adjacent positions."""
    sess = SegmentIndexSession()
    docs = {
        1: ["alpha", "beta", "filler"],        # adjacent, in order
        2: ["alpha", "filler", "beta"],        # both, not adjacent
        3: ["beta", "alpha", "x"],             # both, wrong order
        4: ["alpha", "x", "y"],                # alpha only -> no match
    }
    for d, toks in docs.items():
        p = sess.begin(d)
        for pos, t in enumerate(toks, 1):
            p.insert(t, pos)
        sess.insert(p)
    seg = sess.commit()
    ex2 = Executor(seg)

    prepared = {}
    scores = {}

    def on_prepare(qit):
        prepared.update(qit)

    def on_match(md):
        # reconstruct (index -> term) from the shared metadata, then walk
        # matched positions testing in-order adjacency through dws
        by_index = sorted(md.query_index_terms.items())
        base_terms = [cands[0].term for _, cands in by_index]
        s = 1.0
        first = md.term(base_terms[0])
        if first:
            for p0 in (h.pos for h in first.hits):
                # spans: index i expects term at p0 + offset built from
                # toNextSpan chain
                pos = p0
                chain = 0
                for (idx, cands), nxt in zip(by_index, by_index[1:]):
                    span = cands[0].to_next_span
                    if md.dws.test(nxt[1][0].term, pos + span):
                        chain += 1
                        pos += span
                    else:
                        break
                s = max(s, 1.0 + chain)
        scores[md.doc_id] = s

    n = exec_rich(ex2, "alpha beta", on_match, on_prepare=on_prepare)
    assert n == 3
    assert prepared, "on_prepare must receive query_index_terms"
    # alpha has index 0 with to_next_span to beta's group; beta at index > 0
    idxs = sorted(prepared)
    assert len(idxs) == 2
    assert prepared[idxs[0]][0].term == "alpha"
    assert prepared[idxs[1]][0].term == "beta"
    # only doc 1 has the in-order adjacent pair -> strictly highest score
    assert scores[1] > scores[2]
    assert scores[1] > scores[3]


def test_query_index_terms_disregard_flags():
    """DisregardTokenFlagsForQueryIndicesTerms (exec.h:36-42): dedup by
    (term, toNextSpan), flags zeroed."""
    from trinity_tpu.exec.richmatch import collect_query_index_terms
    from trinity_tpu.query.ast import Token, BinOp, Op

    a1 = Token("x")
    a1.flags = 1
    a2 = Token("x")
    a2.flags = 2
    root = BinOp(Op.OR, a1, a2)  # same index (OR branches share start)
    a1.index = a2.index = 0
    _, qit = collect_query_index_terms(root, disregard_token_flags=False)
    assert len(qit[0]) == 2  # distinct flags kept
    _, qit2 = collect_query_index_terms(root, disregard_token_flags=True)
    assert len(qit2[0]) == 1 and qit2[0][0].flags == 0


def test_phrase_member_indices():
    """Phrase members land at index+i with toNextSpan 1 except the last
    (exec.cpp:649-655)."""
    from trinity_tpu.exec.richmatch import collect_query_index_terms

    q = parse_query('"a b" c')
    _, qit = collect_query_index_terms(q.root)
    flat = {idx: [t.term for t in v] for idx, v in qit.items()}
    assert flat[0] == ["a"] and flat[1] == ["b"]
    assert qit[0][0].to_next_span == 1  # inner member
    assert max(flat) > 1 and "c" in flat[max(flat)]


def test_doc_set_and_veto(ex):
    """VectorIDs analog (AND against an app-supplied doc set,
    docset_iterators.cpp:415-452) and the IndexDocumentsFilter pre-veto
    (matches.h:198-201)."""
    base = ex.match_ids("apple")
    assert len(base) >= 3
    subset = base[::2]
    got = ex.match_ids("apple", doc_set=subset)
    np.testing.assert_array_equal(got, subset)
    # ranked search against a doc set: results stay within the set
    res = ex.search("apple", k=10, doc_set=subset)
    assert res and all(r.doc_id in set(subset.tolist()) for r in res)
    # search without doc_set is unaffected afterwards (masks restored)
    np.testing.assert_array_equal(ex.match_ids("apple"), base)

    vetoed = {int(base[0])}
    seen = []
    exec_rich(ex, "apple", lambda md: seen.append(md.doc_id),
              doc_filter=lambda d: d in vetoed)
    assert vetoed.isdisjoint(seen)
    assert set(seen) == set(int(x) for x in base) - vetoed

    seen2 = []
    exec_rich(ex, "apple", lambda md: seen2.append(md.doc_id),
              doc_set=subset)
    assert set(seen2) == set(int(x) for x in subset)


def test_bulk_materialization_match_heavy():
    """Match-heavy throughput (r3, queryexec_ctx.cpp:317-351 analog): a
    query matching ~20k docs delivers full MatchedDocuments through ONE
    bulk position gather — semantics unchanged, wall bounded."""
    import time

    sess = SegmentIndexSession()
    n = 20_000
    ids = list(range(n))
    docs = [["common", f"u{d % 97}"] for d in ids]
    sess.bulk_index(ids, docs)
    ex2 = Executor(sess.commit())

    got = []
    t0 = time.perf_counter()
    delivered = exec_rich(ex2, "common", got.append)
    wall = time.perf_counter() - t0
    assert delivered == n
    assert [m.doc_id for m in got[:3]] == [0, 1, 2]
    m = got[7]
    assert m.doc_id == 7 and m.term("common").freq == 1
    assert m.term("common").hits[0].pos == 1
    assert m.dws.test("common", 1)
    # generous CI budget; the per-candidate PositionsView loop took minutes
    assert wall < 30, f"match-heavy materialization too slow: {wall:.1f}s"


def test_bulk_materialization_phrase_and_filter_parity():
    """Bulk path keeps exact-phrase re-check and doc_filter veto semantics."""
    sess = SegmentIndexSession()
    ids, docs = [], []
    for d in range(3000):
        if d % 3 == 0:
            docs.append(["red", "shoe", "sale"])
        elif d % 3 == 1:
            docs.append(["shoe", "red", "sale"])  # both terms, wrong order
        else:
            docs.append(["blue", "shoe"])
        ids.append(d)
    sess.bulk_index(ids, docs)
    ex2 = Executor(sess.commit())

    got = []
    exec_rich(ex2, '"red shoe"', got.append)
    assert [m.doc_id for m in got] == [d for d in range(3000) if d % 3 == 0]

    got2 = []
    exec_rich(
        ex2, '"red shoe"', got2.append,
        doc_filter=lambda app_id: app_id % 2 == 1,
    )
    assert [m.doc_id for m in got2] == [
        d for d in range(3000) if d % 3 == 0 and d % 2 == 0
    ]
