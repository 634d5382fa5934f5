"""Measure the persisted size/speed tradeoff of the two codec families.

The reference ships two codecs with a stated tradeoff ("[the Google codec]
results in larger indices, and similar or slightly worse access times",
codecs.h:8) but publishes no numbers. This script persists the bench corpus
(1M docs) under both families and prints one JSON line per codec:
persist seconds, load seconds, and on-disk bytes per file — the numbers
behind the COMPONENTS.md codec-tradeoff statement.

Usage: python tools/measure_codecs.py [n_docs]  (default: full bench corpus)
       python tools/measure_codecs.py payloads [n_docs]
         — payload-bearing segment (1-byte per-hit payloads, the common
         application pattern per runtime.h:8-20): canonical persists the
         raw 9 B/hit PAYLOAD_DT stream while gv_streams group-varint-codes
         the values, so this is the axis where the byte-aligned family
         WINS on disk (the reference's streamvbyte rationale,
         lucene_codec.h:10-24, applied where byte alignment is native).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from trinity_tpu.index.format import SegmentData, persisted_size

    args = sys.argv[1:]
    payload_mode = bool(args) and args[0] == "payloads"
    if payload_mode:
        args = args[1:]
    if args or payload_mode:
        n = int(args[0]) if args else 200_000
        from trinity_tpu.index.builder import SegmentIndexSession

        rng = np.random.default_rng(7)
        zipf = 1.0 / np.arange(1, 5001) ** 1.07
        zipf /= zipf.sum()
        sess = SegmentIndexSession(track_payloads=payload_mode)
        lengths = rng.integers(6, 24, size=n)
        toks = rng.choice(5000, size=int(lengths.sum()), p=zipf)
        names = np.array([f"w{i}" for i in range(5000)], dtype=object)
        b = np.zeros(n + 1, np.int64)
        np.cumsum(lengths, out=b[1:])
        if payload_mode:
            # 1-byte app payload per hit (e.g. style/weight flags)
            pays = rng.integers(1, 256, size=int(b[-1])).astype(np.uint64)
            sess.bulk_index_ids(
                np.arange(n, dtype=np.int64), toks.astype(np.int64), b,
                [f"w{i}" for i in range(5000)],
                payloads=pays,
                payload_lens=np.ones(int(b[-1]), np.uint8),
            )
        else:
            docs = [names[toks[b[d] : b[d + 1]]].tolist() for d in range(n)]
            sess.bulk_index(range(n), docs)
        seg = sess.commit()
    else:
        from bench import build_corpus

        seg = build_corpus()

    for codec in ("tpu_planes", "gv_streams"):
        path = f"/tmp/trinity_codec_{codec}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        seg.persist(path, codec=codec)
        t_persist = time.time() - t0
        size = persisted_size(path)
        t0 = time.time()
        seg2 = SegmentData.load(path)
        t_load = time.time() - t0
        assert seg2.n_docs == seg.n_docs and seg2.n_terms == seg.n_terms
        print(
            json.dumps(
                {
                    "codec": codec,
                    "persist_s": round(t_persist, 2),
                    "load_s": round(t_load, 2),
                    "bytes": size,
                }
            )
        )


if __name__ == "__main__":
    main()
