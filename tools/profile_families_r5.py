"""Per-family batch cost on the WIDENED r5 query mix (one TPU job).

The r5 bench mix spans 2-6-term ANDs, 3-8-term ORs, 1-2-positive NOTs,
2-3-term phrases, k-of-n and OR-of-AND (bench.make_queries). This splits
it into sub-batches per id-line kind AND by flat T bucket, times each as
its own pipelined loop, then the full mixed batch — locating where the
mixed ms/batch goes before optimizing (VERDICT r4 item 3 policy: device
time is the judged number; QPS rides the service swing).
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

    def fam_of(il):
        kind, rest = il[0], il.split()
        if kind == "A":
            return "A2" if len(rest) == 3 else "AW"
        if kind == "O":
            return "O3" if len(rest) == 4 else "OW"
        if kind == "N":
            return "N"
        if kind == "P":
            return "P2" if len(rest) == 3 else "P3"
        return kind  # S, B

    fams: dict = {}
    for q, il in zip(queries, id_lines):
        fams.setdefault(fam_of(il), []).append(q)

    def loop(qs, reps=6):
        ex.search_batch(qs, k=10)  # warm this exact sub-batch shape
        t0 = time.time()
        h = ex.launch_batch(qs, k=10)
        for _ in range(reps - 1):
            nxt = ex.launch_batch(qs, k=10)
            ex.finish_batch(h)
            h = nxt
        ex.finish_batch(h)
        return (time.time() - t0) / reps

    rows = [("mixed", queries)] + sorted(fams.items())
    for name, qs in rows:
        dt = loop(qs)
        print(
            f"{name:6s} B={len(qs):4d}  {dt*1e3:8.1f} ms/batch  "
            f"{dt*1e3/len(qs):6.2f} ms/query",
            flush=True,
        )

    # merged boolean sub-batch (everything except phrases): how the flat
    # groups combine when sharing one program
    boolq = [q for q, il in zip(queries, id_lines) if il[0] != "P"]
    dt = loop(boolq)
    print(f"{'bool':6s} B={len(boolq):4d}  {dt*1e3:8.1f} ms/batch  "
          f"{dt*1e3/len(boolq):6.2f} ms/query")
    phq = [q for q, il in zip(queries, id_lines) if il[0] == "P"]
    dt = loop(phq)
    print(f"{'phrase':6s} B={len(phq):4d}  {dt*1e3:8.1f} ms/batch  "
          f"{dt*1e3/len(phq):6.2f} ms/query")


if __name__ == "__main__":
    main()
