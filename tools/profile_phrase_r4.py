"""Where do hot-bigram phrase queries spend their 28 ms? (one TPU job)

Runs phrase queries of increasing member df through search_batch with the
phase tracer + metrics, printing per-query wall, whether the lazy path
resolved, and the trace phase totals.
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
    from trinity_tpu.utils.metrics import get_metrics
    from trinity_tpu.utils.timings import get_tracer

    configure(aot_cache_dir="/root/repo/.aot_cache")
    seg = bench.build_corpus()
    rng = np.random.default_rng(bench.SEED + 1)
    queries, id_lines = bench.make_queries(seg, rng)
    phrases = [q for q, il in zip(queries, id_lines) if il[0] == "P"]
    ex = Executor(seg)

    def df(q):
        return [
            int(seg.term_df[seg.term_id(t)])
            for t in q.replace('"', "").split()
        ]

    phrases.sort(key=lambda q: min(df(q)))
    ex.warmup(phrases, k=10)

    m = get_metrics()
    for q in phrases:
        base = {
            k: v["value"]
            for k, v in m.snapshot().items()
            if k.startswith("phrase")
        }
        tr0 = dict(get_tracer().snapshot())
        t0 = time.perf_counter()
        r = ex.search(q, k=10)
        dt = (time.perf_counter() - t0) * 1e3
        dm = {
            k: v["value"] - base.get(k, 0)
            for k, v in m.snapshot().items()
            if k.startswith("phrase") and v["value"] != base.get(k, 0)
        }
        tr1 = get_tracer().snapshot()
        dtr = {
            k: round(v["total_ms"] - tr0.get(k, {}).get("total_ms", 0), 1)
            for k, v in tr1.items()
            if v["total_ms"] - tr0.get(k, {}).get("total_ms", 0) > 0.5
        }
        print(
            f"{q:26s} df={df(q)} {dt:7.1f} ms  top1={r[0].score if r else 0:.3f} "
            f"metrics={dm} phases={dtr}",
            flush=True,
        )


if __name__ == "__main__":
    main()
