"""Within-process A/B: flat (tape-independent) vs per-tape boolean kernels
on the bench workload's 108 boolean queries.

Toggling executor.USE_FLAT changes the GROUPING, so the two modes build
genuinely different combined programs (("flat", T, B) vs ("fused", tape,
T, B) specs — distinct lru/aot keys); both compile once in this process
and the measurement loops INTERLEAVE (A B A B ...) so service-load drift
hits both modes equally. Timing = pipelined launch/finish wall over the
whole batch (wall ~= device time once batches pipeline — the bench's own
methodology).

NOTE: the phrase row-gather A/B cannot run in-process (USE_ROWGATHER is
read at trace time and the builder lru caches don't key it) — use
tools/ab_gather.py (subprocess per variant) for that lever.

Usage: nohup python tools/ab_r3c.py > /tmp/ab_r3c.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import bench

    bench._wait_for_device(max_wait_s=3600)
    import trinity_tpu.exec.executor as exmod
    from trinity_tpu.exec import Executor

    seg = bench.build_corpus()
    ex = Executor(seg)
    rng = np.random.default_rng(bench.SEED + 1)
    queries = bench.make_queries(rng)
    bool_qs = [q for i, q in enumerate(queries) if i % 10 < 9]
    ph_qs = [q for i, q in enumerate(queries) if i % 10 == 9]
    log(f"{len(bool_qs)} boolean queries, {len(ph_qs)} phrase queries")

    def timed_loop(qs, reps=3):
        t0 = time.perf_counter()
        h = ex.launch_batch(qs, k=10)
        for _ in range(reps - 1):
            nxt = ex.launch_batch(qs, k=10)
            ex.finish_batch(h)
            h = nxt
        out = ex.finish_batch(h)
        return (time.perf_counter() - t0) / reps, out

    # modes: flat vs tape boolean grouping, plus the phrase group and the
    # full 120-query batch (both under the default flat grouping) for the
    # per-group breakdown
    MODES = (
        ("flat", bool_qs, True),
        ("tape", bool_qs, False),
        ("phrase", ph_qs, True),
        ("full", queries, True),
    )
    results = {}
    for name, qs, useflat in MODES:
        exmod.USE_FLAT = useflat
        t0 = time.time()
        _, out = timed_loop(qs, reps=1)
        log(f"compiled+first-exec {name} in {time.time()-t0:.0f}s")
        results[name] = out

    for qa, qb in zip(results["flat"], results["tape"]):
        assert [r.doc_id for r in qa] == [r.doc_id for r in qb]
        va = np.array([r.score for r in qa], np.float32)
        vb = np.array([r.score for r in qb], np.float32)
        np.testing.assert_allclose(va, vb, rtol=2.4e-7, atol=0)
    log("parity ok (flat == tape, ids exact, scores 2 ulp)")

    times = {name: [] for name, _, _ in MODES}
    for round_i in range(6):
        for name, qs, useflat in MODES:
            exmod.USE_FLAT = useflat
            dt, _ = timed_loop(qs, reps=3)
            times[name].append(dt)
            log(f"round {round_i} {name:6s}: {dt*1e3:7.2f} ms/batch")
    for name in times:
        med = np.median(times[name]) * 1e3
        best = min(times[name]) * 1e3
        log(f"RESULT {name:6s}: median {med:7.2f} ms/batch  best {best:7.2f}")
    log("AB DONE")


if __name__ == "__main__":
    main()
