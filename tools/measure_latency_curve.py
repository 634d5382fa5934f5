"""Latency story (VERDICT r4 item 4): p50/p99 vs batch size x pipeline
depth on the bench workload, plus the QPS each point sustains.

BASELINE.md's "p99 parity" target was written against a local-PCIe
mental model; this topology pays a measured ~26 ms blocking RTT through
the axon tunnel on EVERY host<->device round trip, which lower-bounds
single-stream latency regardless of device time. This tool produces the
measured curve that BASELINE.md's reconciliation paragraph cites, and
finds the latency-optimized operating point (smallest batch whose QPS is
acceptable).

Output: one JSON line per (batch_size, depth) point + a summary line.
Run AFTER bench.py has populated the AOT cache (same program variants) —
and never concurrently with any other TPU work.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCH_SIZES = (1, 4, 12, 36, 60, 120)
DEPTHS = (1, 2)
PASSES = 3  # median-of-N per point (service-load swing policy, CLAUDE.md)


def measure_point(ex, queries, bs, depth, k=10):
    """Per-batch latency = launch->finish wall of THAT handle while `depth`
    batches are kept in flight; QPS from the same loop."""
    batches = [
        list(queries[i : i + bs]) for i in range(0, len(queries), bs)
    ]
    if len(batches[-1]) < bs:
        batches[-1] = (batches[-1] + list(queries))[:bs]
    lat = []
    t_loop = time.perf_counter()
    inflight = []  # (handle, t_launch)
    for b in batches:
        if len(inflight) >= depth:
            h, t0 = inflight.pop(0)
            ex.finish_batch(h)
            lat.append(time.perf_counter() - t0)
        inflight.append((ex.launch_batch(b, k=k), time.perf_counter()))
    while inflight:
        h, t0 = inflight.pop(0)
        ex.finish_batch(h)
        lat.append(time.perf_counter() - t0)
    wall = time.perf_counter() - t_loop
    lat_ms = np.array(lat) * 1e3
    return {
        "p50_ms": float(np.percentile(lat_ms, 50)),
        "p99_ms": float(np.percentile(lat_ms, 99)),
        "qps": len(batches) * bs / wall,
    }


def main():
    import jax

    import bench

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    seg = bench.build_corpus()
    rng = np.random.default_rng(bench.SEED + 1)
    queries, _ = bench.make_queries(seg, rng)

    bench._wait_for_device()
    from trinity_tpu.config import configure
    from trinity_tpu.exec import Executor
    from trinity_tpu.utils.aotcache import post_seal_misses, seal_programs

    configure(aot_cache_dir="/root/repo/.aot_cache")
    ex = Executor(seg)
    t0 = time.time()
    # warm the sub-batch shapes this sweep uses, beyond bench's full-batch
    # coverage: every (batch bucket, family mix) the splits produce
    wstat = ex.warmup(queries, k=10)
    for bs in BATCH_SIZES:
        for i in range(0, len(queries), bs):
            b = list(queries[i : i + bs])
            if len(b) < bs:
                b = (b + list(queries))[:bs]
            ex.finish_batch(ex.launch_batch(b, k=10))
    seal_programs(strict=False)
    print(
        f"# warmup {wstat['programs']} variants + sweep shapes "
        f"in {time.time()-t0:.0f}s",
        file=sys.stderr,
    )

    rows = []
    for bs in BATCH_SIZES:
        for depth in DEPTHS:
            if bs == 1 and depth > 1:
                continue
            pts = [
                measure_point(ex, queries, bs, depth) for _ in range(PASSES)
            ]
            row = {
                "batch": bs,
                "depth": depth,
                "p50_ms": round(float(np.median([p["p50_ms"] for p in pts])), 1),
                "p99_ms": round(float(np.median([p["p99_ms"] for p in pts])), 1),
                "qps": round(float(np.median([p["qps"] for p in pts]))),
                "p50_spread_ms": [
                    round(min(p["p50_ms"] for p in pts), 1),
                    round(max(p["p50_ms"] for p in pts), 1),
                ],
            }
            rows.append(row)
            print(json.dumps(row))

    # single-stream blocking search (the latency floor: 1 query, no batch)
    lat = []
    ex.search(queries[0], k=10)
    for _ in range(PASSES):
        for q in queries:
            t1 = time.perf_counter()
            ex.search(q, k=10)
            lat.append(time.perf_counter() - t1)
    lat_ms = np.array(lat) * 1e3
    print(
        json.dumps(
            {
                "batch": "single-stream blocking",
                "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
                "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
            }
        )
    )
    if post_seal_misses():
        print(
            f"# WARNING: {post_seal_misses()} post-seal compiles — "
            "numbers include compile time",
            file=sys.stderr,
        )
    with open("/tmp/latency_curve_r5.json", "w") as f:
        json.dump(rows, f)


if __name__ == "__main__":
    main()
