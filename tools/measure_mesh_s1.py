"""Measure the single-chip-mesh (S=1) batched-search overhead vs Executor.

VERDICT r2 item #1's done-criterion asks for "a measured single-chip-mesh
(S=1) batch number showing no regression vs Executor": the mesh combined
batch program wraps the same kernels in shard_map + a cross-shard merge,
and this script quantifies what that wrapper costs when there is nothing
to shard. It runs BOTH paths over the same segment and mixed workload and
prints one JSON line with batch-seconds for each and the ratio.

Runs on the CPU backend (forced, like tests/conftest.py) so it is cheap
and deterministic on this 1-core host; the wrapper overhead it measures
(program structure, packing, host merge) is backend-independent. Usage:

    python tools/measure_mesh_s1.py [n_docs] [n_batches]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build_segment(n_docs, vocab=2000, seed=7):
    from trinity_tpu.index.builder import SegmentIndexSession

    rng = np.random.default_rng(seed)
    zipf = 1.0 / np.arange(1, vocab + 1) ** 1.07
    zipf /= zipf.sum()
    names = np.array([f"w{i}" for i in range(vocab)], dtype=object)
    lengths = rng.integers(6, 24, size=n_docs)
    toks = rng.choice(vocab, size=int(lengths.sum()), p=zipf)
    b = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lengths, out=b[1:])
    sess = SegmentIndexSession()
    sess.bulk_index(
        range(n_docs), [names[toks[b[d] : b[d + 1]]].tolist() for d in range(n_docs)]
    )
    return sess.commit()


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from trinity_tpu.exec import Executor
    from trinity_tpu.parallel import MeshExecutor

    seg = build_segment(n_docs)
    queries = [
        "w0 w3", "w1 OR w9", "w2 NOT w5", '"w0 w1"', "w4 w7 OR w11",
        "w6 OR w13 OR w21", "w8 NOT w1", "w10 w2",
    ] * 3  # 24-query mixed batch, every tape-shape family

    ex = Executor(seg)
    mex = MeshExecutor(seg, n_shards=1)

    # parity first (the measurement is meaningless if results differ)
    got_e = ex.search_batch(queries, k=10)
    got_m = mex.search_batch(queries, k=10)
    for q, a, b in zip(queries, got_e, got_m):
        assert [r.doc_id for r in a] == [r.doc_id for r in b], q
        # ids exact AND scores within 2 ulp — the repo invariant
        np.testing.assert_allclose(
            [r.score for r in a], [r.score for r in b],
            rtol=2.4e-7, atol=0, err_msg=q,
        )

    def timed(fn):
        fn()  # warm (compiles)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            fn()
        return (time.perf_counter() - t0) / n_batches

    t_ex = timed(lambda: ex.search_batch(queries, k=10))
    t_mex = timed(lambda: mex.search_batch(queries, k=10))
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "batch": len(queries),
                "executor_s": round(t_ex, 4),
                "mesh_s1_s": round(t_mex, 4),
                "mesh_over_executor": round(t_mex / t_ex, 3),
                "backend": "cpu",
            }
        )
    )


if __name__ == "__main__":
    main()
