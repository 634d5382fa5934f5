"""Terms-dictionary lookup microbench at bench-corpus vocabulary scale
(VERDICT r3 item 2: the reference's terms machinery — prefix-compressed
blocks + skiplist + in-block scan, terms.cpp:8-103 — must be exercised
under a real vocabulary, not a 20k toy).

Loads the cached bench segment (524,288-term Zipf vocabulary; terms stay
PACKED — index/terms.py serves lookups from the prefix-compressed blocks
through the skip-every-64 index, like the reference's terms_skiplist +
terms_data scan) and measures:

  - hit lookups/s: uniformly random EXISTING terms, cold per-term cache
    (cache cleared first, every term distinct)
  - hot-path lookups/s: Zipf-weighted repeats (the serving distribution —
    term_id()'s hot cache absorbs these, the analog of the reference's
    app-level term caching)
  - miss lookups/s: terms guaranteed absent
  - dictionary memory: packed bytes vs a naive list[bytes] materialization

Host-only (no TPU). Usage: python tools/measure_terms.py [n_lookups]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    seg = bench.build_corpus()
    nt = seg.n_terms
    rng = np.random.default_rng(7)

    # existing-term names: materialize the dictionary ONCE for sampling
    # (the measured lookups below go through the PACKED form)
    from trinity_tpu.index.terms import unpack_terms

    all_terms = unpack_terms(seg.terms_data, seg.terms_idx)
    ids = rng.integers(0, nt, size=n)
    names = [all_terms[int(i)] for i in rng.integers(0, nt, size=2000)]

    # cold-ish hits: distinct random ranks (per-term cache cleared)
    probe = [all_terms[int(i)] for i in ids[:20000]]
    seg._term_cache.clear()
    t0 = time.perf_counter()
    for t in probe:
        seg.term_id(t)
    cold = len(probe) / (time.perf_counter() - t0)

    # hot: Zipf-weighted repeats over 2000 names
    zipf = 1.0 / np.arange(1, len(names) + 1)
    zipf /= zipf.sum()
    hot_seq = rng.choice(len(names), size=n, p=zipf)
    t0 = time.perf_counter()
    for i in hot_seq:
        seg.term_id(names[i])
    hot = n / (time.perf_counter() - t0)

    # misses
    miss_terms = [f"zz-miss-{i}" for i in range(20000)]
    t0 = time.perf_counter()
    for t in miss_terms:
        seg.term_id(t)
    miss = len(miss_terms) / (time.perf_counter() - t0)

    packed = seg.terms_data.nbytes + seg.terms_idx.nbytes
    naive = sum(len(t) + 60 for t in all_terms)  # 60B/obj Python overhead
    print(
        f"terms={nt}  packed={packed/1e6:.1f}MB "
        f"(naive list est {naive/1e6:.0f}MB)\n"
        f"cold hit lookups/s: {cold:,.0f}\n"
        f"hot (cached) lookups/s: {hot:,.0f}\n"
        f"miss lookups/s: {miss:,.0f}"
    )


if __name__ == "__main__":
    main()
