"""A/B the decode-kernel DMA schedules on the real TPU.

Compares TRINITY_DBUF=0 (per-step pipelined DMA waves) against =1
(cross-grid-step double buffering) on the bench corpus's AND B=48 fused
kernel, using the serialized-scan methodology from CLAUDE.md: n kernel runs
chained by a data dependency inside ONE jit, per-iteration cost =
(T(n) - T(1)) / (n - 1) — blocking round-trip timing through the tunnel
lies in both directions.

Each variant runs in a SUBPROCESS (the toggle is import-time) and prints
one line; run ONE at a time (the parent serializes them).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time, os
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
deadline = time.time() + 420
while True:
    try:
        jax.block_until_ready(jnp.arange(4.0).sum()); break
    except Exception:
        if time.time() > deadline: raise
        time.sleep(30)
import numpy as np
import bench
from trinity_tpu.exec import Executor
from trinity_tpu.exec.executor import _pad_T
from trinity_tpu.ops.postings import compute_cells, USE_DBUF
from trinity_tpu.ops.fusedscore import fused_score_tiles
from trinity_tpu.plan.compile import compile_plan
from trinity_tpu.query.parser import parse_query

seg = bench.build_corpus()
ex = Executor(seg)
rng = np.random.default_rng(bench.SEED + 1)
queries = bench.make_queries(rng)
and_qs = [q for i, q in enumerate(queries) if i %% 10 < 4]
T = _pad_T(2); B = 48; W = seg.n_windows
cs = np.zeros((W, B * T), np.int32)
cn = np.zeros((W, B * T), np.int32)
tape = None
for bi, q in enumerate(and_qs):
    plan = compile_plan(parse_query(q).root)
    tids = [seg.term_id(t) for t in plan.term_texts]
    c_s, c_n = compute_cells(seg, tids)
    cs[:, bi * T : bi * T + plan.n_slots] = c_s
    cn[:, bi * T : bi * T + plan.n_slots] = c_n
    if tape is None:
        tape = plan.tape
csj, cnj = jnp.asarray(cs), jnp.asarray(cn)
wts = jnp.ones((B, 8), jnp.float32)
nd = jnp.int32(seg.n_docs)
bmeta, planes = ex.bmeta, ex.planes  # hoist the lazy upload out of traces

def chain(L):
    @jax.jit
    def run(csj):
        def body(carry, _):
            out, rmax = fused_score_tiles(
                bmeta, planes, carry, cnj, wts, nd, None,
                tape=tape, scorer_name="bm25", n_windows=W,
                n_terms=T, batch=B)
            # runtime-zero but not provably zero: scores never exceed 1e30,
            # yet XLA cannot fold the compare, so every iteration's kernel
            # output feeds the next iteration's cell_start (a `* 0` here
            # got the whole chain dead-code-eliminated: 0.16 ms/iter
            # reported for a kernel measured at ~8 ms)
            dep = (jnp.max(rmax) > jnp.float32(1e30)).astype(jnp.int32)
            return carry + dep, ()
        c, _ = jax.lax.scan(body, csj, None, length=L)
        return c[0, 0]
    return run

r1 = chain(1); r9 = chain(9)
jax.block_until_ready(r1(csj)); jax.block_until_ready(r9(csj))
t1s, t9s = [], []
for _ in range(5):
    t0 = time.perf_counter(); jax.block_until_ready(r1(csj))
    t1s.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); jax.block_until_ready(r9(csj))
    t9s.append(time.perf_counter() - t0)
T1, T9 = min(t1s), min(t9s)
print("RESULT %%s" %% __import__("json").dumps({
    "dbuf": USE_DBUF, "per_iter_ms": (T9 - T1) / 8 * 1e3,
    "T1_ms": T1 * 1e3, "T9_ms": T9 * 1e3}), flush=True)
""" % {"repo": REPO}


def main():
    for flag in ("0", "1"):
        env = dict(os.environ, TRINITY_DBUF=flag)
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True,
            text=True, cwd=REPO,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                print(f"dbuf={flag}: {line[7:]} (wall {time.time()-t0:.0f}s)",
                      flush=True)
                break
        else:
            print(f"dbuf={flag}: FAILED\n{out.stdout}\n{out.stderr[-2000:]}",
                  flush=True)


if __name__ == "__main__":
    main()
