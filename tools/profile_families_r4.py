"""Per-family batch cost on the r4 Wikipedia-shaped corpus (one TPU job).

Splits the bench query mix into AND / OR / NOT / phrase sub-batches and
times each as its own pipelined batch loop, plus the full mixed batch —
locating where the 428 ms/batch goes before optimizing anything.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    bench._wait_for_device()
    from trinity_tpu.config import configure
    from trinity_tpu.exec import Executor

    configure(aot_cache_dir="/root/repo/.aot_cache")
    seg = bench.build_corpus()
    rng = np.random.default_rng(bench.SEED + 1)
    queries, id_lines = bench.make_queries(seg, rng)
    ex = Executor(seg)
    ex.warmup(queries, k=10)

    fams = {"A": [], "O": [], "N": [], "P": []}
    for q, il in zip(queries, id_lines):
        fams[il[0]].append(q)

    def loop(qs, reps=4):
        # also warm this exact sub-batch shape
        ex.search_batch(qs, k=10)
        t0 = time.time()
        h = ex.launch_batch(qs, k=10)
        for _ in range(reps - 1):
            nxt = ex.launch_batch(qs, k=10)
            ex.finish_batch(h)
            h = nxt
        ex.finish_batch(h)
        dt = (time.time() - t0) / reps
        return dt

    for name, qs in [("mixed", queries)] + list(fams.items()):
        if not qs:
            continue
        dt = loop(qs)
        print(
            f"{name:6s} B={len(qs):4d}  {dt*1e3:8.1f} ms/batch  "
            f"{dt*1e3/len(qs):6.2f} ms/query",
            flush=True,
        )

    # df composition reminder
    for name, qs in fams.items():
        dfs = []
        for q in qs[:6]:
            for t in q.replace('"', "").replace(" OR ", " ").replace(" NOT ", " ").split():
                tid = seg.term_id(t)
                dfs.append(int(seg.term_df[tid]) if tid >= 0 else 0)
        print(name, "df sample:", sorted(dfs)[-8:])


if __name__ == "__main__":
    main()
