"""Merge-at-scale measurement: monolithic merge() vs bounded-memory
merge_partitioned() on two bench-scale segments with deletion masks.

The reference's codec-native N-way merge streams per-participant block
cursors and bounds RAM at N cursors + output (lucene_codec.cpp:963-1393,
dispatched at merge.cpp:256-287); merge_partitioned is its term-range
analog. This tool quantifies the difference and proves bit-parity:

  1. --prepare : split the bench docs.bin into two ~N/2-doc segments; the
     newer one carries updated_ids shadowing ~5% of the older's docs
     (a deletion mask the merge must apply).
  2. --run mono|part : load both, merge with the named path, persist the
     output, print JSON {wall_s, peak_rss_mb, out_sha}.
  3. default: orchestrate 1+2 in subprocesses (clean peak-RSS baselines),
     assert the two outputs hash-identical, print a summary JSON line.

Usage: python tools/measure_merge.py [--scale N_DOCS]
Results recorded in COMPONENTS.md (bounded-memory merge row).
"""

import hashlib
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

WORK = "/tmp/trinity_merge_measure"
BUDGET = 8_000_000  # partition budget (hits); ~64 MB order of working set


def _bench_docs():
    import bench

    if not os.path.exists(bench._docs_bin()):
        print("bench corpus missing; building (2-3 min)...", file=sys.stderr)
        bench.build_corpus()
    return bench._read_docs_bin()


def prepare(scale=None):
    from trinity_tpu.index.builder import SegmentIndexSession

    n_docs, vocab, bounds, tokens = _bench_docs()
    if scale:
        n_docs = min(n_docs, scale)
    names = [f"w{i}" for i in range(vocab)]
    half = n_docs // 2
    os.makedirs(WORK, exist_ok=True)
    for name, lo, hi in (("a", 0, half), ("b", half, n_docs)):
        t0 = time.time()
        sess = SegmentIndexSession()
        sub_bounds = bounds[lo : hi + 1] - bounds[lo]
        sub_tokens = tokens[bounds[lo] : bounds[hi]]
        sess.bulk_index_ids(
            np.arange(lo, hi), sub_tokens.astype(np.int64), sub_bounds, names
        )
        seg = sess.commit()
        if name == "b":
            # deletion mask: segment B (newer) shadows ~5% of A's docs
            rng = np.random.default_rng(99)
            seg.updated_ids = np.unique(
                rng.integers(0, half, size=half // 20)
            ).astype(np.uint32)
        seg.persist(os.path.join(WORK, f"seg_{name}"))
        print(
            f"seg_{name}: {hi - lo} docs in {time.time()-t0:.0f}s",
            file=sys.stderr,
        )


def run_one(which):
    from trinity_tpu.index.format import SegmentData
    from trinity_tpu.index.merge import MergeCandidatesCollection

    mc = MergeCandidatesCollection()
    mc.insert(SegmentData.load(os.path.join(WORK, "seg_a")), generation=1)
    mc.insert(SegmentData.load(os.path.join(WORK, "seg_b")), generation=2)
    rss_loaded = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.time()
    if which == "mono":
        out = mc.merge(keep_updated_ids=False)
    else:
        out = mc.merge_partitioned(
            keep_updated_ids=False, budget_hits=BUDGET, spill_dir=WORK
        )
    wall = time.time() - t0
    out_dir = os.path.join(WORK, f"out_{which}")
    out.persist(out_dir)
    sha = hashlib.sha256()
    for fn in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, fn), "rb") as f:
            sha.update(fn.encode())
            sha.update(f.read())
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(
        json.dumps(
            {
                "which": which,
                "wall_s": round(wall, 1),
                "rss_loaded_mb": round(rss_loaded),
                "peak_rss_mb": round(peak),
                "merge_rss_mb": round(peak - rss_loaded),
                "n_docs": out.n_docs,
                "sum_hits": int(out.stats.sum_term_hits),
                "out_sha": sha.hexdigest()[:16],
            }
        )
    )


def main():
    scale = None
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])
    if "--prepare" in sys.argv:
        prepare(scale)
        return
    if "--run" in sys.argv:
        run_one(sys.argv[sys.argv.index("--run") + 1])
        return

    me = os.path.abspath(__file__)
    if not os.path.exists(os.path.join(WORK, "seg_b", "id")):
        sc = ["--scale", str(scale)] if scale else []
        r = subprocess.run([sys.executable, me, "--prepare"] + sc)
        assert r.returncode == 0
    results = {}
    for which in ("part", "mono"):
        r = subprocess.run(
            [sys.executable, me, "--run", which], capture_output=True, text=True
        )
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"{which} merge failed")
        results[which] = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps(results[which]), file=sys.stderr)
    parity = results["mono"]["out_sha"] == results["part"]["out_sha"]
    print(
        json.dumps(
            {
                "tool": "measure_merge",
                "parity": parity,
                "mono_wall_s": results["mono"]["wall_s"],
                "part_wall_s": results["part"]["wall_s"],
                "mono_merge_rss_mb": results["mono"]["merge_rss_mb"],
                "part_merge_rss_mb": results["part"]["merge_rss_mb"],
                "budget_hits": BUDGET,
                "n_docs": results["mono"]["n_docs"],
                "sum_hits": results["mono"]["sum_hits"],
            }
        )
    )
    if not parity:
        raise SystemExit("PARITY FAILURE: outputs differ")


if __name__ == "__main__":
    main()
