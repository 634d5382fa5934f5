"""Benchmark: mixed boolean/phrase ranked retrieval QPS on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json configs 1-3): a Wikipedia-shaped synthetic corpus —
524,288-term Zipf(1.07) vocabulary, 40-80-token documents, 1M docs (~63M
postings) — and a 120-query mixed set: AND conjunctions (40%), OR
disjunctions (30%), NOT filters (20%) and exact phrases (10%), with query
terms sampled ACROSS the df spectrum (hot >=100k-doc terms, mid 1k-100k,
rare 20-1k) and phrases drawn from real document co-occurrences. Each query
returns exact BM25 top-10.

vs_baseline is MEASURED, not estimated: baseline/engine.cpp is a
single-core scalar engine faithful to the reference's hot path (128-entry
varbyte posting blocks + per-block skip entries as in lucene_codec.cpp's
block decode/seek, rarest-first leapfrog AND as in
docset_iterators.cpp:226-348, document-at-a-time OR merge as in 350-405,
positions-adjacency phrases, BM25 per similarity.h:165-255 with the same
score-desc/docid-asc tie-break). It runs on the SAME corpus + queries on
this host and its measured QPS is the denominator (cached per corpus in
the corpus cache dir; tools/check_baseline_parity.py cross-validates its
top-10 against this engine's). If the baseline binary cannot be built the
bench falls back to the r1-r3 literature estimate (150 QPS) and says so in
the metric string.

Protocol notes (CLAUDE.md): the corpus is built in a SEPARATE process
(host-heavy work contends with TPU measurement on this 1-core host); the
baseline runs before any TPU work; warmup executes every program variant
and then the variant set is SEALED (utils/aotcache.seal_programs) — a
post-warmup compile anywhere in the measurement loop fails the bench
instead of shipping a corrupted p99.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)

EST_BASELINE_QPS = 150.0  # pre-r4 literature estimate (fallback only)
N_DOCS = 1_048_576
VOCAB = 524_288
SEED = 2024
DOC_LEN = (40, 81)  # uniform [40, 80]
ZIPF_S = 1.07
N_QUERIES = 120
CACHE_ROOT = "/tmp/trinity_bench_seg"


def _cache_dir():
    return os.path.join(CACHE_ROOT, f"wiki-{N_DOCS}-{VOCAB}-{SEED}")


def _docs_bin():
    return os.path.join(_cache_dir(), "docs.bin")


# ------------------------------------------------------------------ corpus
def build_corpus():
    """Load the cached bench corpus, building it in a SUBPROCESS if absent
    (keeps the 63M-token build's memory and CPU churn out of the measuring
    process; SegmentData.persist/load is the framework's own checkpoint
    format, so later runs also exercise the packed-terms load path)."""
    from trinity_tpu.index.format import SegmentData

    tag = _cache_dir()
    if not os.path.exists(os.path.join(tag, "seg", "id")):
        _log("corpus cache miss; building in a subprocess...")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--build-corpus"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode != 0:
            raise RuntimeError("corpus build subprocess failed")
    return SegmentData.load(os.path.join(tag, "seg"))


def _build_corpus_fresh():
    """Build the corpus + docs.bin export (run inside the subprocess)."""
    from trinity_tpu.index.builder import SegmentIndexSession

    t0 = time.time()
    rng = np.random.default_rng(SEED)
    zipf = 1.0 / np.arange(1, VOCAB + 1) ** ZIPF_S
    zipf /= zipf.sum()
    lengths = rng.integers(DOC_LEN[0], DOC_LEN[1], size=N_DOCS)
    bounds = np.zeros(N_DOCS + 1, np.int64)
    np.cumsum(lengths, out=bounds[1:])
    all_tokens = rng.choice(VOCAB, size=int(bounds[-1]), p=zipf).astype(
        np.uint32
    )
    _log(f"tokens drawn in {time.time()-t0:.0f}s ({len(all_tokens)} hits)")

    tag = _cache_dir()
    os.makedirs(tag, exist_ok=True)
    # docs.bin: the corpus interchange consumed by baseline/engine.cpp and
    # by the phrase-query sampler ("TBC1", n_docs, vocab, bounds, tokens)
    tmp = _docs_bin() + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"TBC1")
        np.array([N_DOCS, VOCAB], np.uint32).tofile(f)
        bounds.tofile(f)
        all_tokens.tofile(f)
    os.replace(tmp, _docs_bin())

    names = [f"w{i}" for i in range(VOCAB)]
    sess = SegmentIndexSession()
    sess.bulk_index_ids(
        np.arange(N_DOCS), all_tokens.astype(np.int64), bounds, names
    )
    _log(f"ingested in {time.time()-t0:.0f}s; committing...")
    seg = sess.commit()
    seg.persist(os.path.join(tag, "seg"))
    _log(
        f"corpus built in {time.time()-t0:.0f}s: "
        f"{seg.n_docs} docs, {seg.n_terms} terms"
    )
    return seg


def _read_docs_bin():
    with open(_docs_bin(), "rb") as f:
        assert f.read(4) == b"TBC1"
        n_docs, vocab = np.fromfile(f, np.uint32, 2)
        bounds = np.fromfile(f, np.int64, int(n_docs) + 1)
        tokens = np.fromfile(f, np.uint32, int(bounds[-1]))
    return int(n_docs), int(vocab), bounds, tokens


# ----------------------------------------------------------------- queries
def make_queries(seg, rng, n=N_QUERIES):
    """Mixed query set across the df spectrum AND the query language
    (queries.h:10-16 node inventory): 2-term and 4-6-term ANDs, 3-term and
    6-8-term ORs, 1- and 2-positive NOTs, 2- and 3-term phrases drawn from
    real document co-occurrences, k-of-n (MatchSome/DisjunctionSome,
    docset_iterators.h:38-140), and nested OR-of-AND. Returns
    (texts, id_lines): texts feed this engine's parser; id_lines
    ("A i j..." / "O i j..." / "N pos... neg" / "P i j..." / "S k t..." /
    "B n1 g1... n2 g2...") feed the baseline binary so both engines run
    the IDENTICAL workload."""
    # df tiers probed at log-spaced vocabulary ranks (the Zipf rank order
    # approximates df order; the tiers are defined on MEASURED df)
    cand = np.unique(np.geomspace(1, VOCAB, 6000).astype(np.int64)) - 1
    dfs = np.zeros(len(cand), np.int64)
    for i, r in enumerate(cand):
        tid = seg.term_id(f"w{int(r)}")
        dfs[i] = int(seg.term_df[tid]) if tid >= 0 else 0
    hot = cand[dfs >= 100_000]
    mid = cand[(dfs >= 1_000) & (dfs < 100_000)]
    rare = cand[(dfs >= 20) & (dfs < 1_000)]
    assert len(hot) >= 4 and len(mid) >= 16 and len(rare) >= 16, (
        len(hot), len(mid), len(rare),
    )
    pick = lambda pool: int(pool[rng.integers(0, len(pool))])

    # real co-occurrences for phrases: adjacent token runs from documents
    _, _, bounds, tokens = _read_docs_bin()

    def ngram(width):
        while True:
            d = int(rng.integers(0, N_DOCS))
            b, e = bounds[d], bounds[d + 1]
            if e - b < width:
                continue
            i = int(rng.integers(b, e - width + 1))
            run = [int(t) for t in tokens[i : i + width]]
            if len(set(run)) == width:  # distinct members
                return run

    def picks(*pools):
        """One distinct term per pool."""
        out = []
        for p in pools:
            t = pick(p)
            while t in out:
                t = pick(p)
            out.append(t)
        return out

    texts, id_lines = [], []
    and_mix = [(hot, mid), (mid, mid), (mid, rare), (hot, rare)]
    or_mix = [(hot, mid, rare), (mid, mid, rare), (hot, mid, mid)]
    not_mix = [(mid, hot), (hot, mid), (mid, mid)]
    for i in range(n):
        kind = i % 20
        if kind < 6:  # 30% 2-term AND
            a, b = picks(*and_mix[i % len(and_mix)])
            texts.append(f"w{a} w{b}")
            id_lines.append(f"A {a} {b}")
        elif kind < 8:  # 10% wide AND (4 / 6 terms)
            ts = (
                picks(hot, hot, mid, mid)
                if kind == 6
                else picks(hot, hot, hot, hot, mid, mid)
            )
            texts.append(" ".join(f"w{t}" for t in ts))
            id_lines.append("A " + " ".join(map(str, ts)))
        elif kind < 12:  # 20% 3-term OR
            a, b, c = picks(*or_mix[i % len(or_mix)])
            texts.append(f"w{a} OR w{b} OR w{c}")
            id_lines.append(f"O {a} {b} {c}")
        elif kind < 13:  # 5% wide OR (6 / 8 terms)
            ts = (
                picks(mid, mid, mid, rare, rare, rare)
                if i % 40 < 20
                else picks(hot, mid, mid, mid, rare, rare, rare, rare)
            )
            texts.append(" OR ".join(f"w{t}" for t in ts))
            id_lines.append("O " + " ".join(map(str, ts)))
        elif kind < 15:  # 10% 2-term NOT
            a, b = picks(*not_mix[i % len(not_mix)])
            texts.append(f"w{a} NOT w{b}")
            id_lines.append(f"N {a} {b}")
        elif kind < 16:  # 5% 2-positive NOT
            a, b, c = picks(hot, mid, mid)
            texts.append(f"w{a} w{b} NOT w{c}")
            id_lines.append(f"N {a} {b} {c}")
        elif kind < 18:  # 10% phrase bigram
            a, b = ngram(2)
            texts.append(f'"w{a} w{b}"')
            id_lines.append(f"P {a} {b}")
        elif kind < 19:  # 5% phrase trigram
            a, b, c = ngram(3)
            texts.append(f'"w{a} w{b} w{c}"')
            id_lines.append(f"P {a} {b} {c}")
        elif i % 40 < 20:  # 2.5% k-of-n (MatchSome)
            ts = picks(mid, mid, mid, rare)
            texts.append("[" + ",".join(f"w{t}" for t in ts) + "]/2")
            id_lines.append("S 2 " + " ".join(map(str, ts)))
        else:  # 2.5% nested OR-of-AND
            a, b, c, d = picks(hot, mid, mid, rare)
            texts.append(f"(w{a} w{b}) OR (w{c} w{d})")
            id_lines.append(f"B 2 {a} {b} 2 {c} {d}")
    return texts, id_lines


# ---------------------------------------------------------------- baseline
def _repo_root():
    return os.path.dirname(os.path.abspath(__file__))


def measure_baseline(id_lines):
    """Build + run the single-core scalar baseline on the same corpus and
    queries; returns its result dict (cached per corpus + query digest +
    engine source digest). Host-heavy: must run BEFORE any TPU work."""
    import hashlib

    src = os.path.join(_repo_root(), "baseline", "engine.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(
            f.read() + "\n".join(id_lines).encode()
        ).hexdigest()[:16]
    cache = os.path.join(_cache_dir(), f"baseline-{digest}.json")
    dump = os.path.join(_cache_dir(), f"baseline_topk-{digest}.txt")
    if os.path.exists(cache) and os.path.exists(dump):
        with open(cache) as f:
            out = json.load(f)
        out["topk_path"] = dump
        return out
    r = subprocess.run(
        ["make", "-C", os.path.join(_repo_root(), "baseline")],
        capture_output=True,
    )
    if r.returncode != 0:
        _log(f"baseline build failed: {r.stderr.decode()[-200:]}")
        return None
    qfile = os.path.join(_cache_dir(), "queries.ids")
    with open(qfile, "w") as f:
        f.write("\n".join(id_lines) + "\n")
    _log("measuring single-core baseline engine...")
    r = subprocess.run(
        [
            os.path.join(_repo_root(), "baseline", "trinity_baseline"),
            _docs_bin(),
            qfile,
            "--dump-topk",
            dump,
            "--min-seconds",
            "10",
        ],
        capture_output=True,
    )
    if r.returncode != 0:
        _log(f"baseline run failed: {r.stderr.decode()[-200:]}")
        return None
    out = json.loads(r.stdout.decode().strip().splitlines()[-1])
    with open(cache, "w") as f:
        json.dump(out, f)
    out["topk_path"] = dump
    _log(f"baseline: {out}")
    return out


def load_topk_dump(path):
    """Parse a --dump-topk file into [[(doc, score), ...] per query]."""
    rows = []
    with open(path) as f:
        for line in f:
            rows.append(
                [
                    (int(t.split(":")[0]), float(t.split(":")[1]))
                    for t in line.split()
                ]
            )
    return rows


def topk_agree(b, o, rtol=1e-4):
    """True iff two ranked top-k lists agree: scores within f32
    accumulation noise and ids equal up to permutations WITHIN a
    score-equivalence class (the two engines accumulate f32 in different
    orders, so near-ties may legally swap — CLAUDE.md invariants)."""
    if len(b) != len(o):
        return False
    for (bd, bs), (od, os_) in zip(b, o):
        if abs(bs - os_) > rtol * max(1.0, abs(os_)):
            return False
    bids, oids = [d for d, _ in b], [d for d, _ in o]
    if bids == oids:
        return True
    i = 0
    while i < len(b):
        j = i
        while (
            j + 1 < len(b)
            and abs(b[j + 1][1] - b[i][1]) <= rtol * max(1.0, abs(b[i][1]))
        ):
            j += 1
        if sorted(bids[i : j + 1]) != sorted(oids[i : j + 1]):
            return False
        i = j + 1
    return True


# ------------------------------------------------------------------ device
def _wait_for_device(max_wait_s: int = 2400):
    """The remote TPU worker can be mid-recovery (a prior kernel fault
    wedges it ~10 min) or the service down for longer stretches (a 3 h
    outage was observed); wait until a trivial op succeeds before
    building. Backend-init failures are CACHED by jax within a process,
    so each retry probes in a fresh subprocess and the parent only
    touches the backend after a probe succeeds."""
    probe = (
        "import jax, jax.numpy as jnp;"
        "jax.block_until_ready(jnp.arange(4.0).sum())"
    )
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=300,
                capture_output=True,
            )
            if r.returncode == 0:
                return
            err = r.stderr.decode()[-200:]
        except subprocess.TimeoutExpired:
            err = "probe timeout (300s)"
        if time.time() > deadline:
            raise RuntimeError(f"device unavailable: {err}")
        _log(f"device unavailable; retrying... ({err.splitlines()[-1] if err else ''})")
        time.sleep(30)


def main():
    import jax

    # persistent compilation cache: kernel compiles survive across processes
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.time()
    seg = build_corpus()
    build_s = time.time() - t0
    _log(f"corpus ready in {build_s:.0f}s: {seg.n_docs} docs, {seg.n_terms} terms")
    rng = np.random.default_rng(SEED + 1)
    queries, id_lines = make_queries(seg, rng)

    # the HOST-heavy measured baseline runs before any TPU work (1-core
    # host: concurrent host work corrupts TPU measurements and vice versa)
    base = measure_baseline(id_lines)
    base_qps = base["qps"] if base else EST_BASELINE_QPS

    _wait_for_device()
    from trinity_tpu.config import configure
    from trinity_tpu.exec import Executor
    from trinity_tpu.utils.aotcache import post_seal_misses, seal_programs

    # persistent COMPILED-EXECUTABLE cache (utils/aotcache.py): the XLA
    # persistent cache misses Mosaic kernels on this backend, so serialized
    # executables are the cross-process warm-start path
    configure(aot_cache_dir="/root/repo/.aot_cache")
    ex = Executor(seg)

    # warm every compile variant the workload touches — single-stream AND
    # batched shapes (term buckets x batch buckets x phrase C2/fcap ladder)
    # — then SEAL: any post-warmup compile in the serving loop is a
    # measurement-corrupting coverage hole (observed as a 5x p99 in r3) and
    # fails the bench rather than shipping that number. This recovers the
    # reference's steady-state zero-compile serving (exec.cpp:662-666).
    wstat = ex.warmup(queries, k=10)
    seal_programs(strict=False)
    _log(
        f"warmup done at {time.time()-t0:.0f}s "
        f"({wstat['programs']} program variants in {wstat['seconds']:.0f}s)"
    )

    # serving-loop throughput: consecutive batches pipeline (dispatch N+1
    # while N executes, Executor.launch_batch/finish_batch) so the
    # per-batch host planning and tunnel round trip overlap device compute.
    # The remote device is load-shared; take the MEDIAN of three
    # measurement loops so one transient stall doesn't define the number.
    def qps_loop(reps=5):
        t0 = time.time()
        h = ex.launch_batch(queries, k=10)
        for _ in range(reps - 1):
            nxt = ex.launch_batch(queries, k=10)
            ex.finish_batch(h)
            h = nxt
        ex.finish_batch(h)
        return reps * len(queries) / (time.time() - t0)

    qps = float(np.median([qps_loop() for _ in range(3)]))

    # single-stream blocking latency (includes host<->device RTT). Three
    # passes over all 120 queries; report the MEDIAN per-pass percentile —
    # same robustness policy as the QPS loops (the shared remote service
    # shows transient multi-100ms stalls unrelated to this engine).
    ex.search(queries[0], k=10)  # settle: drain the pipelined burst
    p50s, p99s = [], []
    for _ in range(3):
        lat = []
        for q in queries:
            t1 = time.perf_counter()
            ex.search(q, k=10)
            lat.append(time.perf_counter() - t1)
        lat_ms = np.array(lat) * 1e3
        p50s.append(np.percentile(lat_ms, 50))
        p99s.append(np.percentile(lat_ms, 99))
    if post_seal_misses():
        raise RuntimeError(
            f"{post_seal_misses()} program variant(s) compiled INSIDE the "
            "measurement loop — warmup coverage hole; numbers are invalid"
        )

    # parity stamp: the denominator is only fair if both engines return
    # the same top-10 on the same workload (tools/check_baseline_parity.py
    # logic, folded into the tracked artifact). Hard-fail on mismatch —
    # a wrong-answer engine's QPS is not a result.
    parity = None
    if base and base.get("topk_path"):
        base_topk = load_topk_dump(base["topk_path"])
        ours = ex.finish_batch(ex.launch_batch(queries, k=10))
        agree = sum(
            topk_agree(b, [(r.doc_id, r.score) for r in o])
            for b, o in zip(base_topk, ours)
        )
        parity = f"{agree}/{len(queries)}"
        if agree != len(queries):
            for qi, (b, o) in enumerate(zip(base_topk, ours)):
                if not topk_agree(b, [(r.doc_id, r.score) for r in o]):
                    _log(f"PARITY MISMATCH q{qi} {queries[qi]!r}")
                    _log(f"  baseline: {b[:3]}")
                    _log(f"  ours:     {[(r.doc_id, r.score) for r in o[:3]]}")
            raise RuntimeError(
                f"top-10 parity {parity} vs the baseline engine — "
                "scoring regression; numbers are invalid"
            )

    mem = seg.memory_report()
    base_note = (
        f"baseline MEASURED {base_qps:.0f} qps single-core "
        f"(p50={base['p50_ms']:.1f}ms p99={base['p99_ms']:.1f}ms) same "
        "corpus+queries"
        if base
        else "baseline ESTIMATED 150 qps (binary unavailable)"
    )
    out = {
        "metric": (
            "mixed AND(2-6t)/OR(3-8t)/NOT/phrase(2-3t)/k-of-n/OR-of-AND "
            "BM25 top-10 QPS, single chip, "
            f"{N_DOCS} docs x {VOCAB}-term Zipf vocab, 40-80 tok/doc "
            f"(parity {parity or 'n/a'} vs baseline top-10, "
            f"p50={np.median(p50s):.2f}ms p99={np.median(p99s):.2f}ms "
            "median-of-3 passes, "
            f"corpus ready {build_s:.0f}s, index mem {mem['total']/1e6:.0f}MB "
            f"[postings {mem['postings_planes']/1e6:.0f} + positions "
            f"{mem['positions_planes']/1e6:.0f} + meta "
            f"{mem['block_term_meta']/1e6:.0f} + terms "
            f"{mem['terms_dict']/1e6:.1f}], "
            f"warmup {wstat['programs']} variants in {wstat['seconds']:.0f}s "
            f"sealed + 0 post-warm compiles, {base_note}, "
            f"backend={jax.default_backend()})"
        ),
        "value": round(qps, 2),
        "unit": "qps",
        "vs_baseline": round(qps / base_qps, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--build-corpus" in sys.argv:
        _build_corpus_fresh()
    else:
        main()
