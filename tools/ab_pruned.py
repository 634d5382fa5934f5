"""A/B: block-max pruned serving vs dense fused serving at bench scale
(VERDICT r3 item 4; reference cost-ordered spans, docset_spans.cpp:473-678).

Per query family (A=AND, O=OR, N=NOT) on the 1M-doc Wikipedia-shaped bench
corpus, measures wall-clock per batch for
  dense   launch_batch + finish_batch (the serving loop's path)
  pruned  search_pruned_batch (shared-window-order chunked WAND rounds)
plus a rare-only AND set (all terms df<1000 — pruning's best case: bounds
collapse after the first chunk) to probe whether ANY family wins pruned.

Wall time is the honest axis: the pruned path pays one host<->device sync
(~26 ms tunnel RTT) per chunk round BY DESIGN, and that cost is real in a
serving loop. Timing is min-of-R whole-batch wall clock with identical
inputs, both paths warm (first call of each excluded via warm pass).

Run via nohup with /tmp/gated.sh (fresh remote compiles possible).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def time_batch(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    bench._wait_for_device()
    from trinity_tpu.config import configure
    from trinity_tpu.exec import Executor

    configure(aot_cache_dir="/root/repo/.aot_cache")
    seg = bench.build_corpus()
    ex = Executor(seg)
    rng = np.random.default_rng(bench.SEED + 1)
    queries, id_lines = bench.make_queries(seg, rng)

    fams = {}
    for q, il in zip(queries, id_lines):
        fams.setdefault(il[0], []).append(q)

    # pruning's best case: rare-only conjunctions (tiny df -> tight bounds)
    cand = np.unique(np.geomspace(1, bench.VOCAB, 6000).astype(np.int64)) - 1
    dfs = []
    for r in cand:
        tid = seg.term_id(f"w{int(r)}")
        dfs.append(int(seg.term_df[tid]) if tid >= 0 else 0)
    dfs = np.array(dfs)
    rare = cand[(dfs >= 20) & (dfs < 1000)]
    rng2 = np.random.default_rng(7)
    fams["R"] = [
        f"w{int(rare[rng2.integers(0, len(rare))])} "
        f"w{int(rare[rng2.integers(0, len(rare))])}"
        for _ in range(24)
    ]

    for fam in ("A", "O", "N", "R"):
        qs = [q for q in fams.get(fam, []) if '"' not in q]
        if not qs:
            continue
        B = len(qs)

        def dense():
            return ex.finish_batch(ex.launch_batch(qs, k=10))

        def pruned():
            return ex.search_pruned_batch(qs, k=10)

        rd, rp = dense(), pruned()  # warm + parity
        ok = all(
            [m.doc_id for m in a] == [m.doc_id for m in b]
            for a, b in zip(rd, rp)
        )
        td = time_batch(dense)
        tp = time_batch(pruned)
        print(
            f"{fam} B={B:3d} dense={td:8.1f} ms ({td/B:6.2f}/q) "
            f"pruned={tp:8.1f} ms ({tp/B:6.2f}/q) "
            f"ratio={tp/td:5.2f}x parity={'OK' if ok else 'MISMATCH'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
