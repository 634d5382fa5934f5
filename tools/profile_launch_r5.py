"""Where does a mixed 120-query batch's wall time go: host launch-side
planning vs device execution vs result fetch (one TPU job).

The r5 family profile showed sub-batch times that do NOT add up to the
mixed time — consistent with a large per-batch component that is not
device compute. This measures, after full warmup:
  - t_launch: launch_batch() call duration (host planning + async enqueue)
  - t_finish: finish_batch() blocking wait after launch returns
  - pipelined wall per batch at depth 2 (the bench's serving loop shape)
  - cProfile attribution of the launch side
"""

import cProfile
import io
import os
import pstats
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
    queries, _ = bench.make_queries(seg, rng)
    ex = Executor(seg)
    t0 = time.time()
    ex.warmup(queries, k=10)
    print(f"warmup {time.time()-t0:.0f}s", flush=True)

    # depth-1: launch (host) vs finish (device+fetch), 8 reps
    ex.finish_batch(ex.launch_batch(queries, k=10))
    tl, tf = [], []
    for _ in range(8):
        t1 = time.perf_counter()
        h = ex.launch_batch(queries, k=10)
        t2 = time.perf_counter()
        ex.finish_batch(h)
        t3 = time.perf_counter()
        tl.append(t2 - t1)
        tf.append(t3 - t2)
    print(f"launch host-side: {np.median(tl)*1e3:.1f} ms "
          f"(min {min(tl)*1e3:.1f}, max {max(tl)*1e3:.1f})")
    print(f"finish wait:      {np.median(tf)*1e3:.1f} ms "
          f"(min {min(tf)*1e3:.1f}, max {max(tf)*1e3:.1f})", flush=True)

    # depth-2 pipelined wall (bench shape)
    for reps in (6,):
        t1 = time.perf_counter()
        h = ex.launch_batch(queries, k=10)
        for _ in range(reps - 1):
            nxt = ex.launch_batch(queries, k=10)
            ex.finish_batch(h)
            h = nxt
        ex.finish_batch(h)
        dt = (time.perf_counter() - t1) / reps
        print(f"pipelined depth-2: {dt*1e3:.1f} ms/batch "
              f"({len(queries)/dt:.0f} qps)", flush=True)

    # attribution of the launch side
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(4):
        h = ex.launch_batch(queries, k=10)
        ex.finish_batch(h)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(32)
    print(s.getvalue())


if __name__ == "__main__":
    main()
