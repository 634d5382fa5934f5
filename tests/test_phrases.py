"""Phrase + proximity parity vs oracle (docset_iterators.cpp:66-224,
docwordspace.cpp:3-15 semantics)."""

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from trinity_tpu.exec.phrases import verify_phrase_candidates
from trinity_tpu.oracle import OracleCorpus, oracle_match_ids, oracle_search
from trinity_tpu.query.parser import parse_query
from tests.test_exec_e2e import ids, make_corpus


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(23)
    seg, corpus = make_corpus(
        rng, n_docs=500, vocab=30, doc_len_rng=(4, 30), id_stride=3
    )
    return Executor(seg), corpus


PHRASE_QUERIES = [
    '"t0 t1"',
    '"t1 t0"',
    '"t0 t1 t2"',
    '"t2 t2"',
    '"t0 t1" OR t5',
    't3 AND "t0 t2"',
    '"t0 t1" NOT t2',
    '"t9 t11"',  # rare combo, maybe empty
    '"t0 t1" "t1 t2"',  # two phrases AND'ed
    '[t7, "t0 t1"]',
    '"ipad"',  # single-term phrase stays a token-equivalent
]


@pytest.mark.parametrize("qtext", PHRASE_QUERIES)
@pytest.mark.parametrize("scorer", ["bm25", "trivial"])
def test_phrase_topk_parity(small, qtext, scorer):
    ex, corpus = small
    q = parse_query(qtext)
    got = ex.search(q, k=10, scorer=scorer)
    want = oracle_search(corpus, q.root, k=10, scorer=scorer)
    assert ids(got) == [d for d, _ in want], f"{qtext} ids"
    np.testing.assert_allclose(
        [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
    )


@pytest.mark.parametrize("qtext", PHRASE_QUERIES[:6])
def test_phrase_match_ids(small, qtext):
    ex, corpus = small
    q = parse_query(qtext)
    np.testing.assert_array_equal(
        ex.match_ids(q), np.array(oracle_match_ids(corpus, q.root), np.uint32)
    )


def test_phrase_exact_positions():
    """Hand-built corpus with known phrase structure."""
    from trinity_tpu.index.builder import SegmentIndexSession

    docs = {
        1: "new york city",
        2: "york new city",
        3: "new york new york",
        4: "the new york times",
        5: "new and york",
    }
    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    for d, text in docs.items():
        toks = text.split()
        corpus.add(d, toks)
        p = sess.begin(d)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    ex = Executor(sess.commit())
    q = parse_query('"new york"')
    got = ex.search(q, k=10, scorer="trivial")
    # doc 3 has the phrase twice -> freq 2 ranks first
    assert ids(got)[0] == 3
    assert got[0].score == 2.0
    assert set(ids(got)) == {1, 3, 4}
    want = oracle_search(corpus, q.root, k=10, scorer="trivial")
    assert ids(got) == [d for d, _ in want]


def test_verify_phrase_candidates_unit():
    positions = np.array([1, 5, 9, 2, 6, 3, 7, 30], np.uint16)
    # candidate 0: member0 at [1,5,9], member1 at [2,6] -> starts 1,5 match
    freqs = np.array([[3, 2]], np.int32)
    offs = np.array([[0, 3]], np.int32)
    valid = np.array([True])
    out = verify_phrase_candidates(positions, valid, freqs, offs)
    assert out[0] == 2
    # invalid candidate contributes 0
    assert verify_phrase_candidates(positions, np.array([False]), freqs, offs)[0] == 0


def test_verify_phrases_device_matches_host():
    """Device verifier == host verifier on a packed random stream, across
    cap buckets and the lax.map chunked path."""
    import jax.numpy as jnp

    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.utils.bitpack import pack_value_groups

    rng = np.random.default_rng(11)
    H = 5000
    positions = rng.integers(0, 1 << 14, H).astype(np.uint16)
    pw, off = pack_value_groups(positions)
    hit_pw = jnp.asarray(
        np.vstack([pw.reshape(-1, 128), np.zeros((1, 128), np.uint32)])
    )
    hit_off = jnp.asarray(off.astype(np.int32))

    n, k = 64, 3
    fcaps = (8, 64, 8)
    freqs = np.stack(
        [rng.integers(1, c + 1, n) for c in fcaps], axis=1
    ).astype(np.int32)
    offs = np.stack(
        [rng.integers(0, H - c, n) for c in fcaps], axis=1
    ).astype(np.int32)
    valid = rng.random(n) < 0.8

    want = verify_phrase_candidates(positions, valid, freqs, offs)
    got = np.asarray(
        verify_phrases_device(hit_pw, hit_off, jnp.asarray(valid),
                              jnp.asarray(freqs), jnp.asarray(offs), fcaps)
    )
    np.testing.assert_array_equal(got, want)
    # chunked path (budget forces lax.map over candidate chunks)
    got_chunked = np.asarray(
        verify_phrases_device(hit_pw, hit_off, jnp.asarray(valid),
                              jnp.asarray(freqs), jnp.asarray(offs), fcaps,
                              vol_budget=8 * 64 * 8)
    )
    np.testing.assert_array_equal(got_chunked, want)


def test_verify_phrases_device_adjacency_exact():
    """Known-structure stream: device verifier counts exact adjacencies."""
    import jax.numpy as jnp

    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.utils.bitpack import pack_value_groups

    # member0 at [1,5,9], member1 at [2,6]: starts 1 and 5 verify
    positions = np.array([1, 5, 9, 2, 6, 3, 7, 30], np.uint16)
    pw, off = pack_value_groups(positions)
    hit_pw = jnp.asarray(
        np.vstack([pw.reshape(-1, 128), np.zeros((1, 128), np.uint32)])
    )
    hit_off = jnp.asarray(off.astype(np.int32))
    freqs = jnp.asarray(np.array([[3, 2]], np.int32))
    offs = jnp.asarray(np.array([[0, 3]], np.int32))
    out = verify_phrases_device(
        hit_pw, hit_off, jnp.asarray([True]), freqs, offs, (8, 8)
    )
    assert int(out[0]) == 2
    out0 = verify_phrases_device(
        hit_pw, hit_off, jnp.asarray([False]), freqs, offs, (8, 8)
    )
    assert int(out0[0]) == 0


def test_phrase_highfreq_member_on_device():
    """A stopword-grade phrase member (per-doc freq >> 512) verifies ON
    DEVICE through the windowed fori path (VERDICT r2 #3; the reference
    materializes hits for any freq, lucene_codec.cpp:767-856): fcaps
    resolve to a large ladder rung, results match the oracle exactly, and
    the host verifier is never entered."""
    from trinity_tpu.index.builder import SegmentIndexSession
    from trinity_tpu.utils.metrics import get_metrics

    sess = SegmentIndexSession()
    corpus = OracleCorpus()
    toks_big = ["big"] * 600 + ["other", "big", "deal"]
    docs = {
        1: toks_big,
        2: ["big", "deal"],
        3: ["other", "big", "deal", "big", "deal"],
        # phrase match INSIDE the long run: adjacency at positions > 512
        4: ["big"] * 580 + ["deal"] + ["big"] * 40,
    }
    for d, toks in docs.items():
        corpus.add(d, toks)
        p = sess.begin(d)
        for pos, t in enumerate(toks, start=1):
            p.insert(t, pos)
        sess.insert(p)
    ex = Executor(sess.commit())
    q = parse_query('"big deal"')
    from trinity_tpu.plan.compile import compile_plan

    plan = compile_plan(q.root)
    fc = ex._phrase_fcaps((plan,), (tuple(plan.tape[1]),))
    assert fc is not None and max(fc[0]) == 4096, fc
    before = (
        get_metrics().snapshot().get("phrase.host_verify", {"value": 0})["value"]
    )
    for scorer in ("trivial", "bm25"):
        got = ex.search(q, k=10, scorer=scorer)
        want = oracle_search(corpus, q.root, k=10, scorer=scorer)
        assert ids(got) == [d for d, _ in want]
        np.testing.assert_allclose(
            [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
        )
    # compound tape with the high-freq member: fused device program too
    q2 = parse_query('deal AND "big deal"')
    got2 = ex.search(q2, k=10, scorer="trivial")
    want2 = oracle_search(corpus, q2.root, k=10, scorer="trivial")
    assert ids(got2) == [d for d, _ in want2]
    after = (
        get_metrics().snapshot().get("phrase.host_verify", {"value": 0})["value"]
    )
    assert after == before, "high-freq member fell back to host verification"


def test_verify_phrases_device_large_fcap_chunked():
    """The production shape for lazyph batches with a high-freq member:
    candidates CHUNK through lax.map (chunk floors at 128, so n > 128)
    with the windowed fori loops + all-invalid-chunk lax.cond skip inside
    each map step — this nesting must compile and match the host verifier
    (it is the serving path for B*C2-sized batches, not just n<=chunk)."""
    import jax.numpy as jnp

    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.utils.bitpack import pack_value_groups

    rng = np.random.default_rng(31)
    H = 9000
    positions = rng.integers(0, 1 << 14, H).astype(np.uint16)
    pw, off = pack_value_groups(positions)
    hit_pw = jnp.asarray(
        np.vstack([pw.reshape(-1, 128), np.zeros((1, 128), np.uint32)])
    )
    hit_off = jnp.asarray(off.astype(np.int32))
    n = 300  # > 2 chunks of 128
    for fcaps, maxf in (
        ((8, 4096), (8, 1800)),   # high-freq second member in the map body
        ((4096, 8), (1800, 8)),   # high-freq anchor (outer fori) in the map
    ):
        freqs = np.stack(
            [rng.integers(1, mf + 1, n) for mf in maxf], axis=1
        ).astype(np.int32)
        offs = np.stack(
            [rng.integers(0, H - mf, n) for mf in maxf], axis=1
        ).astype(np.int32)
        # docid-ordered prefix fill: the tail chunk is ALL invalid, so the
        # lax.cond skip executes inside lax.map
        valid = np.arange(n) < 140
        want = verify_phrase_candidates(positions, valid, freqs, offs)
        got = np.asarray(
            verify_phrases_device(
                hit_pw, hit_off, jnp.asarray(valid), jnp.asarray(freqs),
                jnp.asarray(offs), fcaps, vol_budget=1,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=str(fcaps))


def test_verify_phrases_device_large_fcap_windows():
    """The windowed fori path (fcap > 512) == host verifier, including a
    high-freq ANCHOR member (outer window loop) and freqs that span
    multiple 512-lane windows."""
    import jax.numpy as jnp

    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.utils.bitpack import pack_value_groups

    rng = np.random.default_rng(29)
    H = 9000
    positions = rng.integers(0, 1 << 14, H).astype(np.uint16)
    pw, off = pack_value_groups(positions)
    hit_pw = jnp.asarray(
        np.vstack([pw.reshape(-1, 128), np.zeros((1, 128), np.uint32)])
    )
    hit_off = jnp.asarray(off.astype(np.int32))
    n = 24
    for fcaps, maxf in (
        ((8, 4096), (8, 1800)),     # high-freq second member
        ((4096, 8), (1800, 8)),     # high-freq anchor (outer loop)
        ((4096, 4096), (700, 1500)),  # both streamed
        ((64, 4096, 8), (64, 1300, 8)),  # 3-member mix
    ):
        k = len(fcaps)
        freqs = np.stack(
            [rng.integers(1, mf + 1, n) for mf in maxf], axis=1
        ).astype(np.int32)
        offs = np.stack(
            [rng.integers(0, H - mf, n) for mf in maxf], axis=1
        ).astype(np.int32)
        valid = rng.random(n) < 0.85
        want = verify_phrase_candidates(positions, valid, freqs, offs)
        got = np.asarray(
            verify_phrases_device(
                hit_pw, hit_off, jnp.asarray(valid), jnp.asarray(freqs),
                jnp.asarray(offs), fcaps,
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=str(fcaps))


def test_lazy_fused_overflow_fallback(small):
    """Tiny C2 forces conjunction overflow: the fused-lazy program must
    flag unresolved queries and the dense fallback must keep exact parity."""
    from trinity_tpu.config import configure, get_config

    ex, corpus = small
    old = get_config().phrase_lazy_candidates
    old_max = get_config().phrase_lazy_max_candidates
    # cap AND max: the ladder otherwise keeps growing past the cap until
    # overflow is impossible (the stopword-bigram lazy path)
    configure(phrase_lazy_candidates=4, phrase_lazy_max_candidates=4)
    try:
        for qtext in ('"t0 t1"', '"t0 t1" ', '"t2 t2"'):
            q = parse_query(qtext)
            got = ex.search(q, k=10, scorer="bm25")
            want = oracle_search(corpus, q.root, k=10, scorer="bm25")
            assert ids(got) == [d for d, _ in want], qtext
            np.testing.assert_allclose(
                [r.score for r in got], [s for _, s in want], rtol=2.4e-7, atol=0
            )
    finally:
        configure(
            phrase_lazy_candidates=old, phrase_lazy_max_candidates=old_max
        )


def test_lazy_c2_ladder_extends_past_cap(small):
    """A phrase whose min-member df exceeds the configured C2 cap stays on
    the LAZY path (the ladder grows until overflow is impossible) instead
    of the dense positional fallback — exact parity, zero
    phrase.dense_fallback increments. Stopword bigrams are the production
    case (min-df 445k vs cap 8192, r4)."""
    from trinity_tpu.config import configure, get_config
    from trinity_tpu.exec.executor import _pick_c2
    from trinity_tpu.utils.metrics import get_metrics

    # unit: the ladder, at the production cap
    assert _pick_c2(444_935, 8192, 10) == 524_288
    assert _pick_c2(1_046_282, 8192, 10) == 1 << 21
    assert _pick_c2(600, 8192, 10) == 1024  # small rungs unchanged

    ex, corpus = small
    old = get_config().phrase_lazy_candidates
    configure(phrase_lazy_candidates=2)  # every phrase exceeds the cap
    before = get_metrics().snapshot().get("phrase.dense_fallback", {}).get(
        "value", 0
    )
    try:
        for qtext in ('"t0 t1"', '"t2 t2"', '"t0 t1 t2"'):
            q = parse_query(qtext)
            got = ex.search(q, k=10, scorer="bm25")
            want = oracle_search(corpus, q.root, k=10, scorer="bm25")
            assert ids(got) == [d for d, _ in want], qtext
            np.testing.assert_allclose(
                [r.score for r in got], [s for _, s in want],
                rtol=2.4e-7, atol=0,
            )
        after = get_metrics().snapshot().get(
            "phrase.dense_fallback", {}
        ).get("value", 0)
        assert after == before, "extended ladder must not fall back dense"
    finally:
        configure(phrase_lazy_candidates=old)
