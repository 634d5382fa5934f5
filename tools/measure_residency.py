"""Many-segment serving under an HBM budget, at scale (VERDICT r3 item 8).

The reference maps segments on demand and lets the OS page them
(segment_index_source.cpp:5-186); the TPU analog is the residency manager
(exec/residency.py). This measures the analog doing its job in a SERVING
loop, not a unit test:

- Builds S segments of D docs each (one IndexSourcesCollection), total
  device footprint well above `hbm_budget_bytes` when capped.
- Phase 1 (unlimited budget): serve Q mixed queries over the collection,
  record answers + wall time.
- Phase 2 (budget fits ~1/3 of the segments): same queries, same order.
  Every batch round-robins executor access order, so the LRU churns.
- Asserts byte-identical results, reports evictions / re-uploads /
  resident-bytes ceiling, and the wall-time cost of eviction churn.

Usage: python tools/measure_residency.py [S] [D]   (default 12 x 40000)
Run gated via /tmp/gated.sh when pointed at the TPU.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_segments(S, D, vocab=20000, seed=11):
    from trinity_tpu.index.builder import SegmentIndexSession

    rng = np.random.default_rng(seed)
    zipf = 1.0 / np.arange(1, vocab + 1) ** 1.07
    zipf /= zipf.sum()
    segs = []
    names = [f"w{i}" for i in range(vocab)]
    for s in range(S):
        lengths = rng.integers(40, 81, size=D)
        bounds = np.zeros(D + 1, np.int64)
        np.cumsum(lengths, out=bounds[1:])
        toks = rng.choice(vocab, size=int(bounds[-1]), p=zipf).astype(np.int64)
        sess = SegmentIndexSession()
        # disjoint app-id ranges per segment, like generation dirs
        sess.bulk_index_ids(np.arange(D) + s * D, toks, bounds, names)
        segs.append(sess.commit())
        print(f"  built segment {s + 1}/{S}", flush=True)
    return segs


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from trinity_tpu.config import configure, get_config
    from trinity_tpu.exec.residency import get_residency
    from trinity_tpu.index.source import IndexSource, IndexSourcesCollection

    configure(aot_cache_dir="/root/repo/.aot_cache")
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    t0 = time.time()
    segs = build_segments(S, D)
    print(f"{S} x {D}-doc segments built in {time.time()-t0:.0f}s", flush=True)

    coll = IndexSourcesCollection()
    for i, seg in enumerate(segs):
        coll.insert(IndexSource(seg, generation=i + 1))
    per_seg = [src.executor().device_bytes for src in coll.sources]
    total = sum(per_seg)
    budget = int(total / 3)
    print(
        f"device footprint: total={total/1e6:.0f}MB "
        f"per-seg~{per_seg[0]/1e6:.0f}MB budget={budget/1e6:.0f}MB",
        flush=True,
    )

    rng = np.random.default_rng(5)
    queries = []
    for i in range(60):
        a, b = rng.integers(0, 2000, 2)
        queries.append(
            [f"w{a} w{b}", f"w{a} OR w{b}", f"w{a} NOT w{b}"][i % 3]
        )

    res = get_residency()

    def serve(tag):
        ev0, up0 = res.evictions, res.uploads
        peak = 0
        answers = []
        t0 = time.time()
        for rep in range(3):
            for q in queries:
                hits = coll.search(q, k=10)
                answers.append([(m.doc_id, float(m.score)) for m in hits])
                peak = max(peak, res.resident_bytes())
        dt = time.time() - t0
        n = 3 * len(queries)
        print(
            f"{tag:10s} {n/dt:7.1f} qps  wall={dt:6.1f}s  "
            f"evictions={res.evictions - ev0:4d} uploads={res.uploads - up0:4d}  "
            f"peak_resident={peak/1e6:.0f}MB",
            flush=True,
        )
        return answers

    configure(hbm_budget_bytes=0)
    base = serve("unlimited")
    # drop everything so the capped phase starts cold
    for src in coll.sources:
        src.executor()._drop_device()
    configure(hbm_budget_bytes=budget)
    capped = serve("capped")
    configure(hbm_budget_bytes=0)

    assert base == capped, "correctness drift under eviction!"
    print("parity under eviction: OK (byte-identical ids+scores)", flush=True)


if __name__ == "__main__":
    main()
