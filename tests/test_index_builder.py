import numpy as np
import pytest

from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.index.format import (
    SegmentData,
    decode_block,
    term_positions,
    term_postings,
)
from trinity_tpu.index.terms import lookup_term, pack_terms, unpack_terms


def build_corpus(rng, n_docs=500, vocab=200, doc_len=(5, 60)):
    """Random Zipf-ish corpus; returns (session, {doc_id: [tokens]})."""
    sess = SegmentIndexSession()
    docs = {}
    zipf = 1.0 / np.arange(1, vocab + 1)
    zipf /= zipf.sum()
    for d in range(n_docs):
        doc_id = d * 3 + 7  # sparse app ids
        length = int(rng.integers(*doc_len))
        toks = [f"t{int(i)}" for i in rng.choice(vocab, size=length, p=zipf)]
        docs[doc_id] = toks
        proxy = sess.begin(doc_id)
        for pos, t in enumerate(toks, start=1):
            proxy.insert(t, pos)
        sess.insert(proxy)
    return sess, docs


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(42)
    sess, docs = build_corpus(rng)
    return sess.commit(), docs


def naive_postings(docs, term, doc_map):
    """Expected (local docids, freqs) for a term."""
    local = {int(a): i for i, a in enumerate(doc_map)}
    out = []
    for doc_id in sorted(docs):
        freq = docs[doc_id].count(term)
        if freq:
            out.append((local[doc_id], freq))
    if not out:
        return np.zeros(0, np.uint32), np.zeros(0, np.uint32)
    a = np.array(out, dtype=np.uint32)
    return a[:, 0], a[:, 1]


def test_doc_map_sorted(built):
    seg, docs = built
    np.testing.assert_array_equal(seg.doc_map, np.array(sorted(docs), np.uint32))


def test_terms_sorted(built):
    seg, _ = built
    assert seg.terms == sorted(seg.terms)


def test_postings_roundtrip_all_terms(built):
    seg, docs = built
    for tid, term in enumerate(seg.terms):
        d, f = term_postings(seg, tid)
        ed, ef = naive_postings(docs, term.decode(), seg.doc_map)
        np.testing.assert_array_equal(d, ed, err_msg=f"docs of {term}")
        np.testing.assert_array_equal(f, ef, err_msg=f"freqs of {term}")
        assert seg.term_df[tid] == len(ed)


def test_positions(built):
    seg, docs = built
    rng = np.random.default_rng(7)
    local_of = {int(a): i for i, a in enumerate(seg.doc_map)}
    for doc_id in rng.choice(sorted(docs), size=20, replace=False):
        toks = docs[int(doc_id)]
        term = toks[0]
        tid = seg.term_id(term)
        expect = [p for p, t in enumerate(toks, start=1) if t == term]
        got = term_positions(seg, tid, local_of[int(doc_id)])
        assert list(got) == expect


def test_field_stats(built):
    seg, docs = built
    assert seg.stats.docs_cnt == len(docs)
    assert seg.stats.sum_term_hits == sum(len(t) for t in docs.values())
    assert seg.stats.total_terms == len(seg.terms)
    assert seg.stats.sum_terms_docs == sum(
        len(set(t)) for t in docs.values()
    )


def test_persist_load_roundtrip(built, tmp_path):
    seg, _ = built
    seg.persist(str(tmp_path / "seg"))
    seg2 = SegmentData.load(str(tmp_path / "seg"))
    np.testing.assert_array_equal(seg.planes, seg2.planes)
    np.testing.assert_array_equal(seg.doc_map, seg2.doc_map)
    np.testing.assert_array_equal(seg.positions, seg2.positions)
    # loaded segments keep the dictionary PACKED (terms.cpp:8-103 memory
    # model): lookups resolve through lookup_term, the Python list only
    # materializes on demand (terms_list, cold paths)
    assert seg2.terms is None
    assert seg2.n_terms == seg.n_terms
    for t in seg.terms:
        assert seg2.term_id(t) == seg.term_id(t)
    assert seg2.term_id(b"zzz-none") == -1
    assert seg2.terms_list() == seg.terms
    assert seg2.stats.docs_cnt == seg.stats.docs_cnt
    assert seg2.memory_report()["total"] > 0


def test_terms_dictionary(built):
    seg, _ = built
    data, idx = pack_terms(seg.terms)
    assert unpack_terms(data, idx) == seg.terms
    for i in range(0, len(seg.terms), 17):
        assert lookup_term(data, idx, seg.terms[i]) == i
    assert lookup_term(data, idx, b"zzzz-nonexistent") == -1
    assert lookup_term(data, idx, b"") == -1


def test_update_and_erase():
    sess = SegmentIndexSession()
    p = sess.begin(5)
    p.insert("hello", 1)
    sess.update(p)
    sess.erase(9)
    seg = sess.commit()
    np.testing.assert_array_equal(seg.updated_ids, np.array([5, 9], np.uint32))


def test_duplicate_doc_rejected():
    sess = SegmentIndexSession()
    p = sess.begin(1)
    p.insert("a", 1)
    sess.insert(p)
    p2 = sess.begin(1)
    p2.insert("b", 1)
    with pytest.raises(ValueError):
        sess.insert(p2)


def test_multi_block_term():
    """A term with > 128 docs spans multiple blocks."""
    sess = SegmentIndexSession()
    for d in range(300):
        p = sess.begin(d)
        p.insert("common", 1)
        if d % 3 == 0:
            p.insert("third", 2)
        sess.insert(p)
    seg = sess.commit()
    tid = seg.term_id("common")
    assert seg.term_nblocks[tid] == 3
    d, f = term_postings(seg, tid)
    np.testing.assert_array_equal(d, np.arange(300, dtype=np.uint32))
    np.testing.assert_array_equal(f, np.ones(300, np.uint32))


def test_persist_load_with_payloads(tmp_path):
    sess = SegmentIndexSession(track_payloads=True)
    p = sess.begin(1)
    p.insert("x", 1, payload=7)
    p.insert("y", 2, payload=9)
    sess.insert(p)
    seg = sess.commit()
    seg.persist(str(tmp_path / "s"))
    seg2 = SegmentData.load(str(tmp_path / "s"))
    np.testing.assert_array_equal(seg2.payloads, seg.payloads)
    tid = seg2.term_id("x")
    np.testing.assert_array_equal(
        term_positions(seg2, tid, 0), term_positions(seg, tid, 0)
    )


def test_freq_boundary_65535_ok_65536_rejected():
    """Boundary at 2^16: 65535 encodes exactly; 65536 would wrap the uint16
    block_max_freq WAND bound to 0 and must be rejected (builder + native)."""
    sess = SegmentIndexSession()
    p = sess.begin(1)
    for _ in range(65535):
        p.insert("hot", 1)
    p.insert("other", 2)
    sess.insert(p)
    seg = sess.commit()
    tid = seg.term_id("hot")
    d, f = term_postings(seg, tid)
    assert f[0] == 65535
    assert seg.block_max_freq[seg.term_block_start[tid]] == 65535

    sess2 = SegmentIndexSession()
    p = sess2.begin(1)
    for _ in range(65536):
        p.insert("hot", 1)
    sess2.insert(p)
    with pytest.raises(ValueError):
        sess2.commit()


def test_bulk_index_position_limit():
    """bulk_index enforces MaxPosition like DocumentProxy.insert."""
    from trinity_tpu.limits import MAX_POSITION

    sess = SegmentIndexSession()
    with pytest.raises(ValueError):
        sess.bulk_index([1], [["t"] * MAX_POSITION])
    sess.bulk_index([2], [["t"] * (MAX_POSITION - 1)])  # max legal length


def test_spill_bounded_indexing(tmp_path):
    """Bounded-memory indexing: intermediate state spills to temp files
    (intermediateStateFlushFreq, indexer.cpp:134-152) and commit merges the
    spills — identical segment to the unspilled build."""
    rng = np.random.default_rng(21)
    docs = {
        d: [f"s{int(x)}" for x in rng.integers(0, 25, rng.integers(2, 8))]
        for d in range(400)
    }

    def build(**kw):
        sess = SegmentIndexSession(**kw)
        for d, toks in docs.items():
            p = sess.begin(d)
            for pos, t in enumerate(toks, 1):
                p.insert(t, pos)
            sess.insert(p)
        return sess.commit()

    a = build()
    sess = SegmentIndexSession(spill_threshold=300, spill_dir=str(tmp_path))
    for d, toks in docs.items():
        p = sess.begin(d)
        for pos, t in enumerate(toks, 1):
            p.insert(t, pos)
        sess.insert(p)
    assert sess._spills, "threshold should have forced spills"
    b = sess.commit()
    assert not sess._spills  # cleaned up
    assert a.terms == b.terms
    # the spilled build runs the PARTITIONED encoder (bounded output
    # memory, codecs.h:76-90 analog) — the segment must be BIT-IDENTICAL
    # to the monolithic build, including the cross-word plane merges
    for field in (
        "planes", "doc_map", "term_block_start", "term_nblocks", "term_df",
        "term_sum_hits", "block_plane_off", "block_first_doc",
        "block_last_doc", "block_count", "block_bits_doc", "block_bits_freq",
        "block_hits_off", "block_max_freq", "hit_planes", "hit_group_off",
    ):
        np.testing.assert_array_equal(
            getattr(a, field), getattr(b, field), err_msg=field
        )
    np.testing.assert_array_equal(
        np.asarray(a.positions), np.asarray(b.positions)
    )
    assert a.max_position == b.max_position
    assert a.stats == b.stats

    # bulk path spills too
    sess2 = SegmentIndexSession(spill_threshold=300, spill_dir=str(tmp_path))
    ids = list(docs)
    sess2.bulk_index(ids[:200], [docs[d] for d in ids[:200]])
    sess2.bulk_index(ids[200:], [docs[d] for d in ids[200:]])
    assert sess2._spills
    c = sess2.commit()
    np.testing.assert_array_equal(a.planes, c.planes)


def test_spill_partitioned_payloads_updates(tmp_path):
    """Partitioned commit keeps payloads aligned and updated_ids intact,
    and a tiny budget genuinely produces many partitions."""
    import trinity_tpu.index.builder as B

    rng = np.random.default_rng(5)
    docs = {
        d: [f"p{int(x)}" for x in rng.integers(0, 40, rng.integers(2, 6))]
        for d in range(300)
    }

    def build(**kw):
        sess = SegmentIndexSession(track_payloads=True, **kw)
        for d, toks in docs.items():
            p = sess.begin(d)
            for pos, t in enumerate(toks, 1):
                p.insert(t, pos, payload=(d * 131 + pos) % 9973)
            (sess.update if d % 3 == 0 else sess.insert)(p)
        sess.erase(10_000)
        return sess.commit()

    a = build()
    # spill every ~50 hits -> budget forces many term partitions
    calls = [0]
    orig = B._build_blocks_numpy
    import trinity_tpu.utils.native as native

    orig_native = native.build_blocks

    def count_native(*ar, **kw):
        calls[0] += 1
        return orig_native(*ar, **kw)

    def count_numpy(*ar, **kw):
        calls[0] += 1
        return orig(*ar, **kw)

    native.build_blocks = count_native
    B._build_blocks_numpy = count_numpy
    try:
        b = build(spill_threshold=50, spill_dir=str(tmp_path))
    finally:
        native.build_blocks = orig_native
        B._build_blocks_numpy = orig
    assert calls[0] > 3, f"expected many partitions, saw {calls[0]}"
    np.testing.assert_array_equal(a.planes, b.planes)
    np.testing.assert_array_equal(a.payloads, b.payloads)
    np.testing.assert_array_equal(a.updated_ids, b.updated_ids)
    np.testing.assert_array_equal(
        np.asarray(a.positions), np.asarray(b.positions)
    )


def test_bulk_index_ids_bit_identical(tmp_path):
    """bulk_index_ids (vectorized integer-stream ingestion) must commit a
    segment byte-identical to the equivalent bulk_index call."""
    import hashlib
    import os

    from trinity_tpu.index.builder import SegmentIndexSession

    rng = np.random.default_rng(5)
    V = 50
    names = [f"t{i}" for i in range(V)]
    lengths = rng.integers(1, 15, size=150)
    bounds = np.zeros(151, np.int64)
    np.cumsum(lengths, out=bounds[1:])
    toks = rng.integers(0, V, size=int(bounds[-1]))

    s1 = SegmentIndexSession()
    docs = [
        [names[t] for t in toks[bounds[d] : bounds[d + 1]]] for d in range(150)
    ]
    s1.bulk_index(range(150), docs)
    s2 = SegmentIndexSession()
    s2.bulk_index_ids(np.arange(150), toks, bounds, names)

    def dig(seg, sub):
        d = tmp_path / sub
        seg.persist(str(d))
        h = hashlib.sha256()
        for fn in sorted(os.listdir(d)):
            h.update(fn.encode())
            h.update((d / fn).read_bytes())
        return h.hexdigest()

    assert dig(s1.commit(), "a") == dig(s2.commit(), "b")


def test_bulk_index_ids_duplicate_guard():
    from trinity_tpu.index.builder import SegmentIndexSession

    s = SegmentIndexSession()
    s.bulk_index_ids([1], [0, 1], [0, 2], ["a", "b"])
    with pytest.raises(ValueError, match="committed twice"):
        s.bulk_index_ids([1], [0], [0, 1], ["a"])
