"""Measure peak RSS of a large commit: monolithic vs spill-partitioned.

The reference bounds indexing memory by its flush frequency (input flush
indexer.cpp:134-152, output sink codecs.h:76-90). This prints one JSON line
per mode with peak RSS (ru_maxrss) for an n-doc build so the bound in
COMPONENTS.md is a measured number, not a claim.

Each mode runs in a SUBPROCESS (ru_maxrss is a process-lifetime high-water
mark, so in-process comparison would be meaningless).

Usage: python tools/measure_commit_rss.py [n_docs] (default 1_000_000)
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, resource, sys
sys.path.insert(0, {root!r})
import numpy as np
from trinity_tpu.index.builder import SegmentIndexSession

mode, n = sys.argv[1], int(sys.argv[2])
rng = np.random.default_rng(7)
zipf = 1.0 / np.arange(1, 5001) ** 1.07
zipf /= zipf.sum()
kw = dict(spill_threshold=2_000_000, spill_dir="/tmp") if mode == "spill" else {{}}
sess = SegmentIndexSession(**kw)
names = np.array([f"w{{i}}" for i in range(5000)], dtype=object)
CHUNK = 50_000
for c0 in range(0, n, CHUNK):
    c1 = min(c0 + CHUNK, n)
    lengths = rng.integers(6, 24, size=c1 - c0)
    toks = rng.choice(5000, size=int(lengths.sum()), p=zipf)
    b = np.zeros(c1 - c0 + 1, np.int64)
    np.cumsum(lengths, out=b[1:])
    docs = [names[toks[b[d] : b[d + 1]]].tolist() for d in range(c1 - c0)]
    sess.bulk_index(range(c0, c1), docs)
seg = sess.commit()
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
print(json.dumps({{
    "mode": mode, "n_docs": n, "hits": int(seg.stats.sum_term_hits),
    "peak_rss_mb": round(peak / 1024, 1),
    "index_mb": round(seg.memory_report()["total"] / 2**20, 1),
}}))
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CHILD.format(root=root)
    for mode in ("mono", "spill"):
        r = subprocess.run(
            [sys.executable, "-c", code, mode, str(n)],
            capture_output=True,
            text=True,
        )
        if r.returncode:
            print(json.dumps({"mode": mode, "error": r.stderr[-400:]}))
        else:
            print(r.stdout.strip())


if __name__ == "__main__":
    main()
