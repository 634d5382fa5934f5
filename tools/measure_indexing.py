"""Indexing-throughput artifact: time this framework's bulk ingest +
commit (encode) + persist on the bench corpus, next to the baseline
engine's build_s over the same docs.bin.

The reference documents its indexing hot-loop breakdown — ~69% encode,
~31% sort/IO (indexer.cpp:302-310); baseline/engine.cpp prints build_s for
the identical corpus. This tool produces the comparable numbers for the
COMPONENTS.md indexing row:

  {"tool": "measure_indexing", "ingest_s": ..., "commit_s": ...,
   "persist_s": ..., "total_s": ..., "hits": N, "hits_per_s": ...,
   "mb_per_s": ..., "peak_rss_mb": ..., "baseline_build_s": ...}

Usage: python tools/measure_indexing.py  (host-heavy: never run while a
TPU measurement is in flight)
"""

import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def baseline_build_s(repo, docs_bin, workdir):
    """Run the baseline engine for one pass over one trivial query — its
    JSON line carries build_s for the same docs.bin."""
    eng = os.path.join(repo, "baseline", "trinity_baseline")
    if not os.path.exists(eng):
        r = subprocess.run(
            ["make", "-C", os.path.join(repo, "baseline")], capture_output=True
        )
        if r.returncode != 0:
            return None
    qfile = os.path.join(workdir, "one_query.ids")
    with open(qfile, "w") as f:
        f.write("O 0\n")  # single-term disjunction over term id 0
    r = subprocess.run(
        [eng, docs_bin, qfile, "--min-seconds", "0"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        return None
    try:
        return float(
            json.loads(r.stdout.strip().splitlines()[-1])["build_s"]
        )
    except (ValueError, KeyError, IndexError):
        return None


def main():
    import bench
    from trinity_tpu.index.builder import SegmentIndexSession

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(bench._docs_bin()):
        print("bench corpus missing; building...", file=sys.stderr)
        bench.build_corpus()
    n_docs, vocab, bounds, tokens = bench._read_docs_bin()
    names = [f"w{i}" for i in range(vocab)]
    raw_mb = (tokens.nbytes + bounds.nbytes) / 1e6

    t0 = time.time()
    sess = SegmentIndexSession()
    sess.bulk_index_ids(
        np.arange(n_docs), tokens.astype(np.int64), bounds, names
    )
    t1 = time.time()
    seg = sess.commit()
    t2 = time.time()
    out_dir = "/tmp/trinity_indexing_measure_seg"
    seg.persist(out_dir)
    t3 = time.time()
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    base_s = baseline_build_s(repo, bench._docs_bin(), "/tmp")
    total = t3 - t0
    out = {
        "tool": "measure_indexing",
        "n_docs": n_docs,
        "hits": int(len(tokens)),
        "ingest_s": round(t1 - t0, 1),
        "commit_s": round(t2 - t1, 1),
        "persist_s": round(t3 - t2, 1),
        "total_s": round(total, 1),
        "hits_per_s": round(len(tokens) / total),
        "mb_per_s": round(raw_mb / total, 1),
        "peak_rss_mb": round(peak),
        "baseline_build_s": base_s,
        "vs_baseline_build": (
            round(base_s / total, 2) if base_s else None
        ),
    }
    print(json.dumps(out))
    with open(os.path.join(bench._cache_dir(), "indexing.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
