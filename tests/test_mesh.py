"""Multi-chip sharded execution on a virtual 8-device CPU mesh (SURVEY §4c)."""

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from trinity_tpu.parallel import MeshExecutor, split_segment
from tests.test_exec_e2e import make_corpus


@pytest.fixture(scope="module")
def sharded():
    rng = np.random.default_rng(31)
    seg, corpus = make_corpus(
        rng, n_docs=40_000, vocab=300, doc_len_rng=(3, 9), id_stride=2
    )
    return seg, Executor(seg), MeshExecutor(seg, n_shards=8)


def test_split_preserves_postings(sharded):
    seg, _, mex = sharded
    assert sum(s.n_docs for s in mex.shards) == seg.n_docs
    # df per term sums across shards
    for term in [b"t0", b"t5", b"t250"]:
        total = sum(
            int(s.term_df[s.term_id(term)])
            for s in mex.shards
            if s.term_id(term) >= 0
        )
        assert total == int(seg.term_df[seg.term_id(term)])


@pytest.mark.parametrize(
    "qtext", ["t0 t1", "t5 OR t9 OR t17", "t3 NOT t2", "[t1, t2, t3]", "t299"]
)
def test_mesh_parity_with_single_device(sharded, qtext):
    _, ex, mex = sharded
    a = [(r.doc_id, r.score) for r in ex.search(qtext, k=10)]
    b = [(r.doc_id, r.score) for r in mex.search(qtext, k=10)]
    assert [x[0] for x in a] == [x[0] for x in b], qtext
    np.testing.assert_allclose(
        [x[1] for x in a], [x[1] for x in b], rtol=1e-6
    )


def test_mesh_uses_all_devices(sharded):
    import jax

    _, _, mex = sharded
    assert len(mex.mesh.devices.reshape(-1)) == min(8, len(jax.devices()))


def test_mesh_phrase_parity(sharded):
    _, ex, mex = sharded
    for qtext in ['"t0 t1"', '"t1 t2" OR t7']:
        a = [(r.doc_id, r.score) for r in ex.search(qtext, k=10)]
        b = [(r.doc_id, r.score) for r in mex.search(qtext, k=10)]
        assert a == b, qtext


def test_sharded_deletion_masks_applied_by_program(sharded):
    """Masked docs are excluded BY the sharded program itself (deletion-mask
    tiles are a sharded input of _build_sharded_fn), matching the
    single-device executor with the same registry."""
    seg, ex, mex = sharded
    # mask the current top-5 docs of a query
    qtext = "t0 t1"
    base = ex.search(qtext, k=10)
    masked_app = [r.doc_id for r in base[:5]]
    app2loc = {int(a): i for i, a in enumerate(seg.doc_map)}
    local = np.array(sorted(app2loc[a] for a in masked_app), np.int64)
    try:
        ex.set_masked_local_docs(local)
        mex.set_masked_local_docs(local)
        a = [(r.doc_id, r.score) for r in ex.search(qtext, k=10)]
        b = [(r.doc_id, r.score) for r in mex.search(qtext, k=10)]
        assert [x[0] for x in a] == [x[0] for x in b]
        assert not set(masked_app) & {x[0] for x in b}
        # pending handle proves the boolean path ran sharded (not host loop)
        p = mex.launch(qtext, k=10)
        assert p[0] == "bool"
        mex.finish(p)
        # phrase query under the same masks, through the sharded program
        pq = '"t0 t1"'
        ap = [(r.doc_id, r.score) for r in ex.search(pq, k=10)]
        pp = mex.launch(pq, k=10)
        assert pp[0] == "phrase", "phrase should run inside shard_map"
        bp = [(r.doc_id, r.score) for r in mex.finish(pp, k=10)]
        assert [x[0] for x in ap] == [x[0] for x in bp]
        np.testing.assert_allclose(
            [x[1] for x in ap], [x[1] for x in bp], rtol=1e-6
        )
    finally:
        ex.set_masked_local_docs(None)
        mex.set_masked_local_docs(None)


def test_mesh_phrase_runs_in_one_program(sharded):
    """Phrase tapes execute under shard_map (no sequential host loop):
    launch() returns a sharded-phrase pending whose payload already holds
    per-shard (k,) results for every shard at once."""
    _, _, mex = sharded
    p = mex.launch('"t1 t2"', k=10)
    assert p[0] == "phrase"
    sv, si, res = p[1]
    assert sv.shape == (len(mex.shards), 10)
    assert bool(np.asarray(res).all())
    mex.finish(p)


def test_mesh_batch_parity(sharded):
    """search_batch on the mesh == sequential mesh searches == the
    unsharded executor's batch: the combined one-program-per-batch
    machinery (VERDICT r2 #1) composes with sharding. The mix covers
    fused boolean, dense (MatchSome), lazy-phrase, compound-phrase
    (single-query sharded fallback), and a duplicate tape shape."""
    _, ex, mex = sharded
    queries = [
        "t0 t1", "t5 OR t9 OR t17", "t3 NOT t2", "t0 t1",
        '"t0 t1"', '"t1 t2"', "[t1, t2, t3]", "t299", '"t1 t2" OR t7',
    ]
    batch = mex.search_batch(queries, k=10)
    seq = [mex.search(q, k=10) for q in queries]
    flat = ex.search_batch(queries, k=10)
    for q, b, s, f in zip(queries, batch, seq, flat):
        assert [r.doc_id for r in b] == [r.doc_id for r in s], q
        assert [r.doc_id for r in b] == [r.doc_id for r in f], q
        np.testing.assert_allclose(
            [r.score for r in b], [r.score for r in f], rtol=1e-6
        )


def test_mesh_batch_one_combined_program(sharded):
    """A mixed batch's groups land in ONE packed shard_map dispatch: the
    launch handle carries a single device array of (S, rows, k)."""
    _, _, mex = sharded
    h = mex.launch_batch(["t0 t1", "t3 NOT t2", '"t0 t1"'], k=10)
    packed_dev, group_meta, singles, *_ = h
    assert packed_dev is not None
    # AND + NOT share the tape-independent flat group; the phrase is its own
    assert len(group_meta) == 2 and not singles
    assert [g[1] for g in group_meta].count("flat") == 1
    rows = sum(3 * B if kind == "lazyph" else 2 * B
               for _, kind, B in group_meta)
    assert packed_dev.shape == (len(mex.shards), rows, 10)
    mex.finish_batch(h)


def test_mesh_batch_under_deletion_masks(sharded):
    seg, ex, mex = sharded
    qtexts = ["t0 t1", '"t0 t1"', "t5 OR t9 OR t17"]
    base = ex.search(qtexts[0], k=10)
    masked_app = [r.doc_id for r in base[:5]]
    app2loc = {int(a): i for i, a in enumerate(seg.doc_map)}
    local = np.array(sorted(app2loc[a] for a in masked_app), np.int64)
    try:
        ex.set_masked_local_docs(local)
        mex.set_masked_local_docs(local)
        a = ex.search_batch(qtexts, k=10)
        b = mex.search_batch(qtexts, k=10)
        for q, ra, rb in zip(qtexts, a, b):
            assert [r.doc_id for r in ra] == [r.doc_id for r in rb], q
            assert not set(masked_app) & {r.doc_id for r in rb}
    finally:
        ex.set_masked_local_docs(None)
        mex.set_masked_local_docs(None)


def test_mesh_sources_collection_config5():
    """BASELINE config #5: multi-segment with merge + deletion masks,
    sharded over the mesh — parity with the unsharded collection."""
    from trinity_tpu.index.builder import SegmentIndexSession
    from trinity_tpu.index.source import IndexSourcesCollection
    from trinity_tpu.parallel import MeshSourcesCollection

    rng = np.random.default_rng(77)

    def build(lo, hi, update_ids=()):
        sess = SegmentIndexSession()
        for d in range(lo, hi):
            p = sess.begin(d)
            toks = [f"t{int(x)}" for x in rng.integers(0, 40, rng.integers(3, 9))]
            for pos, t in enumerate(toks, 1):
                p.insert(t, pos)
            sess.insert(p)
        for d in update_ids:  # re-adds shadow older copies
            p = sess.begin(d)
            for pos, t in enumerate(["t1", "t2", "t3"], 1):
                p.insert(t, pos)
            sess.insert(p)
        return sess.commit()

    seg_a = build(0, 30_000)
    seg_b = build(30_000, 50_000, update_ids=range(0, 200, 7))

    flat = IndexSourcesCollection()
    flat.add_segment(seg_a, generation=1).add_segment(seg_b, generation=2)
    flat.commit()

    meshc = MeshSourcesCollection(n_shards=4)
    meshc.add_segment(seg_a, generation=1).add_segment(seg_b, generation=2)
    meshc.commit()

    for qtext in ["t1 t2", "t5 OR t9", "t3 NOT t4", '"t1 t2"']:
        a = [(r.doc_id, round(r.score, 4)) for r in flat.search(qtext, k=10)]
        b = [(r.doc_id, round(r.score, 4)) for r in meshc.search(qtext, k=10)]
        assert [x[0] for x in a] == [x[0] for x in b], qtext

    # batched collection search: every source's combined sharded batch
    # program launches before any gather; parity with sequential
    qs = ["t1 t2", "t5 OR t9", '"t1 t2"', "t3 NOT t4"]
    bb = meshc.search_batch(qs, k=10)
    for qtext, rb in zip(qs, bb):
        ra = meshc.search(qtext, k=10)
        assert [r.doc_id for r in rb] == [r.doc_id for r in ra], qtext


def test_mesh_host_fallback_paths(sharded):
    """_shard_executors-backed fallbacks (phrase host fallback, and the
    densify path for unresolved lazy candidates) must work and agree with
    the single-chip executor (regression: per-shard executors assigned to
    the residency-managed read-only device properties and crashed)."""
    from trinity_tpu.query.parser import parse_query

    _, ex, mex = sharded
    for qtext in ['"t0 t1"', '"t1 t2" OR t7']:
        root = parse_query(qtext).root
        want = [(r.doc_id, r.score) for r in ex.search(qtext, k=10)]
        got = [
            (r.doc_id, r.score)
            for r in mex._phrase_host_fallback(root, 10, "bm25")
        ]
        assert got == want, qtext
    # densify one shard directly: scores must match that shard's docs
    root = parse_query('"t0 t1"').root
    fv, fi = mex._densify_shard(0, root, 10, "bm25", None, None)
    assert len(fv) == len(fi)
    base = int(mex._base_np[0])
    assert all(base <= i < base + mex.shards[0].n_docs for i in fi)


@pytest.mark.parametrize(
    "qtext",
    ["t0 t1", "t3 OR t9 OR t21", "t0 NOT t1", "[t0,t3,t9]", "t1 OR t250"],
)
def test_mesh_pruned_exact(sharded, qtext):
    """Pruning composed with the mesh (thread-per-shard WAND fan-out,
    exec.h:86-177): results identical to the unsharded dense search."""
    _, ex, mex = sharded
    want = [(r.doc_id, r.score) for r in ex.search(qtext, k=10)]
    got = [
        (r.doc_id, r.score)
        for r in mex.search_pruned(qtext, k=10, chunk_windows=2)
    ]
    assert got == want, qtext


def test_mesh_pruned_under_deletion_masks(sharded):
    """Per-shard masks reach the shard executors' pruned loops."""
    seg, ex, _ = sharded
    mex = MeshExecutor(seg, n_shards=8)
    dense = ex.search("t0 OR t3", k=30)
    kill = {r.doc_id for r in dense[:4]}
    local = np.flatnonzero(np.isin(seg.doc_map, list(kill)))
    mex.set_masked_local_docs(local)
    ex2 = Executor(seg)
    ex2.set_masked_local_docs(local)
    want = [(r.doc_id, r.score) for r in ex2.search("t0 OR t3", k=10)]
    got = [
        (r.doc_id, r.score)
        for r in mex.search_pruned("t0 OR t3", k=10, chunk_windows=2)
    ]
    assert got == want and not (kill & {d for d, _ in got})


def test_mesh_collection_pruned_matches_batch():
    from trinity_tpu.index.builder import SegmentIndexSession
    from trinity_tpu.parallel import MeshSourcesCollection

    def mk(docs):
        s = SegmentIndexSession()
        for d, text in docs.items():
            p = s.begin(d)
            for i, t in enumerate(text.split(), start=1):
                p.insert(t, i)
            s.insert(p)
        return s.commit()

    c = MeshSourcesCollection(n_shards=8)
    c.add_segment(mk({i: f"a{i % 5} b{i % 3}" for i in range(1, 400)}), 100)
    g2 = SegmentIndexSession()
    p = g2.begin(1)
    for i, t in enumerate("a0 b0 fresh".split(), start=1):
        p.insert(t, i)
    g2.update(p)
    c.add_segment(g2.commit(), 200)
    c.commit()
    qs = ["a0 b0", "a1 OR b2"]
    want = c.search_batch(qs, k=10)
    got = c.search_pruned_batch(qs, k=10, chunk_windows=2)
    for q, a, b in zip(qs, got, want):
        assert [(r.doc_id, r.score) for r in a] == [
            (r.doc_id, r.score) for r in b
        ], q


def test_mesh_match_ids_and_rich(sharded):
    """DocumentsOnly and rich-match modes over the mesh == single chip
    (per-shard fan-out, caller merge — exec.h:86-177)."""
    from trinity_tpu.exec.richmatch import exec_rich

    seg, ex, mex = sharded
    np.testing.assert_array_equal(mex.match_ids("t0 t1"), ex.match_ids("t0 t1"))
    got, want = [], []
    n_g = mex.exec_rich("t0 t1", lambda m: got.append((m.doc_id, len(m.matched_terms))))
    n_w = exec_rich(ex, "t0 t1", lambda m: want.append((m.doc_id, len(m.matched_terms))))
    assert n_g == n_w and got == want
    # masks flow into the per-shard executors on access
    kill = ex.match_ids("t0 t1")[:3]
    local = np.flatnonzero(np.isin(seg.doc_map, kill))
    mex.set_masked_local_docs(local)
    try:
        assert not set(kill) & set(mex.match_ids("t0 t1"))
    finally:
        mex.set_masked_local_docs(None)


def test_mesh_collection_exec_modes():
    from trinity_tpu.index.builder import SegmentIndexSession
    from trinity_tpu.parallel import MeshSourcesCollection

    def mk(docs):
        s = SegmentIndexSession()
        for d, text in docs.items():
            p = s.begin(d)
            for i, t in enumerate(text.split(), start=1):
                p.insert(t, i)
            s.insert(p)
        return s

    c = MeshSourcesCollection(n_shards=8)
    c.add_segment(mk({1: "a b", 2: "a c", 3: "b c"}).commit(), 100)
    g2 = mk({4: "a d"})
    g2.erase(2)
    c.add_segment(g2.commit(), 200)
    c.commit()
    assert list(c.match_ids("a")) == [1, 4]  # 2 erased by gen 200
    seen = []
    n = c.exec_rich("a", lambda m: seen.append(m.doc_id))
    assert n == 2 and sorted(seen) == [1, 4]


def test_mesh_exec_rich_abort_and_filter_factory(sharded):
    """Threaded mesh rich fan-out: AbortSearch stops delivery at exactly
    the same prefix as the single-chip driver (ordered draining keeps
    ascending doc order), and filter_factory runs once per shard (the
    per-source filter-instance contract, exec.h:55-62)."""
    from trinity_tpu.exec.richmatch import AbortSearch, exec_rich

    seg, ex, mex = sharded
    want = []
    exec_rich(ex, "t0", lambda m: want.append(m.doc_id))
    assert len(want) > 6

    got = []

    def take3(m):
        if len(got) >= 3:
            raise AbortSearch()
        got.append(m.doc_id)

    n = mex.exec_rich("t0", take3)
    assert n == 3 and got == want[:3]

    instances = []

    def factory():
        vetoed = []
        instances.append(vetoed)
        return {"doc_filter": lambda d: False}

    full = []
    mex.exec_rich("t0", lambda m: full.append(m.doc_id), filter_factory=factory)
    assert full == want
    assert len(instances) == len(mex._shard_executors())
