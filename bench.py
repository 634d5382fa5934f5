"""Benchmark: mixed boolean/phrase ranked retrieval QPS on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json configs 1-3): a synthetic Wikipedia-abstract-shaped
corpus (Zipf vocabulary, short documents) and a mixed query set — AND
conjunctions, OR disjunctions, NOT filters and exact phrases — each
returning exact BM25 top-10. Query latency is measured sequentially
(single-stream, matching the reference's one-query-per-call model,
exec.cpp:509); QPS = queries/second end-to-end including host planning.

vs_baseline: the reference publishes no numbers and cannot be built here
(submodules absent; BASELINE.md), so the denominator is an estimate of
single-core Trinity on THIS workload (1M docs, Zipf-hot terms, mixed
boolean + phrase): anchored on the reference's own engineering notes — a
single disjunction over 759,721 docs took 128 ms (docset_iterators.h:262),
a span-window workload 47 ms/query (docset_spans.h:68-71), and
DisjunctionSome spends >35% of runtime in heap ops (docset_iterators.h:58).
Hot queries here touch ~1M postings; at the reference's SIMD-PFor decode
rates (~200-400 M postings/s/core) decode alone is 3-5 ms/query, so a
realistic single-core mixed-workload estimate is ~150 QPS.

SENSITIVITY: the estimate spans roughly 100-250 QPS depending on assumed
decode rate and heap overhead — the reference's own numbers imply 8-21
QPS for pure hot disjunctions (128 ms/query) and a few hundred QPS for
cheap conjunctions, and the 40/30/20/10 AND/OR/NOT/phrase mix weights the
middle. At the optimistic extreme (250 QPS), a reported vs_baseline of R
deflates to R * 150/250 = 0.6R; at the pessimistic extreme (100), it
inflates to 1.5R. The measured QPS value itself is assumption-free.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)

BASELINE_QPS = 150.0
N_DOCS = 1_048_576
VOCAB = 20_000
SEED = 1234


def build_corpus(cache_dir: str = "/tmp/trinity_bench_seg"):
    """Build (or reload) the bench corpus. The segment is persisted after
    the first build — SegmentData.persist/load is the framework's own
    checkpoint format, so later bench/profiling runs skip the ~90 s
    synthetic build and also exercise the packed-terms load path."""
    import os

    from trinity_tpu.index.format import SegmentData

    tag = os.path.join(cache_dir, f"{N_DOCS}-{VOCAB}-{SEED}")
    if os.path.exists(os.path.join(tag, "id")):
        return SegmentData.load(tag)
    seg = _build_corpus_fresh()
    try:
        seg.persist(tag)
    except OSError:
        pass  # cache is best-effort
    return seg


def _build_corpus_fresh():
    from trinity_tpu.index.builder import SegmentIndexSession

    rng = np.random.default_rng(SEED)
    zipf = 1.0 / np.arange(1, VOCAB + 1) ** 1.07
    zipf /= zipf.sum()
    sess = SegmentIndexSession()
    lengths = rng.integers(6, 24, size=N_DOCS)
    all_tokens = rng.choice(VOCAB, size=int(lengths.sum()), p=zipf)
    names = np.array([f"w{i}" for i in range(VOCAB)], dtype=object)
    toks = names[all_tokens]
    bounds = np.zeros(N_DOCS + 1, np.int64)
    np.cumsum(lengths, out=bounds[1:])
    docs = [toks[bounds[d] : bounds[d + 1]].tolist() for d in range(N_DOCS)]
    sess.bulk_index(range(N_DOCS), docs)
    return sess.commit()


def make_queries(rng, n=120):
    qs = []
    for i in range(n):
        kind = i % 10
        a, b, c = (int(x) for x in rng.integers(0, 3000, 3))
        if kind < 4:
            qs.append(f"w{a} w{b}")
        elif kind < 7:
            qs.append(f"w{a} OR w{b} OR w{c}")
        elif kind < 9:
            qs.append(f"w{a} NOT w{b}")
        else:
            qs.append(f'"w{a} w{b}"')
    return qs


def _wait_for_device(max_wait_s: int = 2400):
    """The remote TPU worker can be mid-recovery (a prior kernel fault
    wedges it ~10 min) or the service down for longer stretches (a 3 h
    outage was observed); wait until a trivial op succeeds before
    building. Backend-init failures are CACHED by jax within a process,
    so each retry probes in a fresh subprocess and the parent only
    touches the backend after a probe succeeds."""
    import subprocess
    import sys

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
    _wait_for_device()

    from trinity_tpu.config import configure
    from trinity_tpu.exec import Executor

    # persistent COMPILED-EXECUTABLE cache (utils/aotcache.py): the XLA
    # persistent cache misses Mosaic kernels on this backend, so serialized
    # executables are the cross-process warm-start path
    configure(aot_cache_dir="/root/repo/.aot_cache")

    t0 = time.time()
    seg = build_corpus()
    build_s = time.time() - t0
    _log(f"corpus built in {build_s:.0f}s: {seg.n_docs} docs, {seg.n_terms} terms")
    ex = Executor(seg)
    rng = np.random.default_rng(SEED + 1)
    queries = make_queries(rng)

    # warm every compile variant the workload touches — single-stream AND
    # batched shapes (term buckets x batch buckets x phrase C2/fcap ladder);
    # the persistent cache makes later processes start warm. Serving latency
    # is then steady-state, like the reference's zero-compile-cost execution
    # (exec.cpp:662-666).
    wstat = ex.warmup(queries, k=10)
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

    # single-stream blocking latency (includes host<->device RTT); all 120
    # queries — a p99 over fewer samples is just the max of the run
    ex.search(queries[0], k=10)  # settle: drain the pipelined burst
    lat = []
    for q in queries:
        t1 = time.perf_counter()
        ex.search(q, k=10)
        lat.append(time.perf_counter() - t1)
    lat_ms = np.array(lat) * 1e3
    mem = seg.memory_report()
    out = {
        "metric": (
            "mixed AND/OR/NOT/phrase BM25 top-10 QPS, single chip, "
            f"{N_DOCS} docs (p50={np.percentile(lat_ms, 50):.2f}ms "
            f"p99={np.percentile(lat_ms, 99):.2f}ms, index build {build_s:.0f}s, "
            f"index mem {mem['total']/1e6:.0f}MB "
            f"[postings {mem['postings_planes']/1e6:.0f} + positions "
            f"{mem['positions_planes']/1e6:.0f} + meta "
            f"{mem['block_term_meta']/1e6:.0f} + terms "
            f"{mem['terms_dict']/1e6:.1f}], "
            f"warmup {wstat['programs']} variants in {wstat['seconds']:.0f}s, "
            f"backend={jax.default_backend()})"
        ),
        "value": round(qps, 2),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
