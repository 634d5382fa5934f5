"""Cross-validate the measured baseline engine against this engine.

The vs_baseline denominator (baseline/engine.cpp) is only a fair baseline
if it returns the RIGHT top-10 — a broken engine could be arbitrarily fast.
This tool runs the exact bench workload through both engines and compares
ranked ids, tolerating order swaps among near-equal scores (the two engines
accumulate f32 in different orders, so exact ulp equality is not expected —
CLAUDE.md invariants; same reason XLA FMA contraction forbids bit-exact
oracle comparisons).

Usage: python tools/check_baseline_parity.py   (TPU job: run alone)
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    seg = bench.build_corpus()
    rng = np.random.default_rng(bench.SEED + 1)
    queries, id_lines = bench.make_queries(seg, rng)

    # baseline top-10 dump
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "baseline")], check=True)
    qfile = os.path.join(bench._cache_dir(), "queries.ids")
    with open(qfile, "w") as f:
        f.write("\n".join(id_lines) + "\n")
    dump = os.path.join(bench._cache_dir(), "baseline_topk.txt")
    subprocess.run(
        [
            os.path.join(root, "baseline", "trinity_baseline"),
            bench._docs_bin(), qfile,
            "--dump-topk", dump, "--min-seconds", "0",
        ],
        check=True,
    )
    base = bench.load_topk_dump(dump)

    bench._wait_for_device()
    from trinity_tpu.config import configure
    from trinity_tpu.exec import Executor

    configure(aot_cache_dir="/root/repo/.aot_cache")
    ex = Executor(seg)
    ours = ex.search_batch(queries, k=10)

    bad = 0
    for qi, (q, b, o) in enumerate(zip(queries, base, ours)):
        oset = [(r.doc_id, r.score) for r in o]
        if not bench.topk_agree(b, oset):
            bad += 1
            print(f"MISMATCH q{qi} {q!r}")
            print("  baseline:", b[:5])
            print("  ours:    ", oset[:5])
    print(f"{len(queries) - bad}/{len(queries)} queries agree")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
