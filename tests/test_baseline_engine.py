"""Cross-check baseline/engine.cpp (the measured vs_baseline denominator)
against the oracle on a tiny corpus, covering EVERY query-line kind the
bench emits: A (any arity), O (any arity), N, P (any arity, repeated
members), S (k-of-n, DisjunctionSome semantics), B (OR-of-AND).

A broken baseline engine could be arbitrarily fast; this pins its top-10
ids + scores to the same specification this engine is tested against."""

import os
import subprocess

import numpy as np
import pytest

from trinity_tpu.oracle import OracleCorpus, oracle_search
from trinity_tpu.query.parser import parse_query

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    r = subprocess.run(["make", "-C", os.path.join(ROOT, "baseline")],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    return os.path.join(ROOT, "baseline", "trinity_baseline")


@pytest.fixture(scope="module")
def corpus_bin(tmp_path_factory):
    """Tiny TBC1 corpus + matching OracleCorpus (vocab small so phrases
    and conjunctions actually hit)."""
    rng = np.random.default_rng(42)
    n_docs, vocab = 2500, 40
    lengths = rng.integers(6, 30, size=n_docs)
    bounds = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lengths, out=bounds[1:])
    zipf = 1.0 / np.arange(1, vocab + 1) ** 1.1
    zipf /= zipf.sum()
    tokens = rng.choice(vocab, size=int(bounds[-1]), p=zipf).astype(np.uint32)
    # plant phrase occurrences incl. a repeated-member trigram
    for d in range(0, n_docs, 7):
        b = int(bounds[d])
        tokens[b : b + 3] = [3, 5, 3]
    corpus = OracleCorpus()
    for d in range(n_docs):
        corpus.add(d, [f"w{int(t)}" for t in
                       tokens[bounds[d] : bounds[d + 1]]])
    path = tmp_path_factory.mktemp("bl") / "docs.bin"
    with open(path, "wb") as f:
        f.write(b"TBC1")
        np.array([n_docs, vocab], np.uint32).tofile(f)
        bounds.tofile(f)
        tokens.tofile(f)
    return str(path), corpus


# (id_line for the baseline binary, equivalent query text for the oracle)
CASES = [
    ("A 0 5", "w0 w5"),
    ("A 2 4 6 9", "w2 w4 w6 w9"),  # 4-term AND
    ("A 1 2 3 4 5 6", "w1 w2 w3 w4 w5 w6"),  # 6-term AND
    ("O 3 17 31", "w3 OR w17 OR w31"),
    ("O 1 9 19 29 39 7 27 37", "w1 OR w9 OR w19 OR w29 OR w39 OR w7 OR w27 OR w37"),
    ("N 4 0", "w4 NOT w0"),
    ("N 2 6 1", "w2 w6 NOT w1"),  # two positives
    ("P 3 5", '"w3 w5"'),
    ("P 3 5 3", '"w3 w5 w3"'),  # trigram with repeated member
    ("P 0 1 2", '"w0 w1 w2"'),
    ("S 2 0 9 19 29", "[w0,w9,w19,w29]/2"),
    ("S 3 1 5 11 21 31", "[w1,w5,w11,w21,w31]/3"),
    ("B 2 0 7 2 2 9", "(w0 w7) OR (w2 w9)"),
    ("B 2 1 33 3 2 4 6", "(w1 w33) OR (w2 w4 w6)"),
]


def test_baseline_engine_oracle_parity(engine, corpus_bin, tmp_path):
    docs_bin, corpus = corpus_bin
    qfile = tmp_path / "q.ids"
    qfile.write_text("\n".join(line for line, _ in CASES) + "\n")
    dump = tmp_path / "topk.txt"
    r = subprocess.run(
        [engine, docs_bin, str(qfile), "--dump-topk", str(dump),
         "--min-seconds", "0"],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr.decode()[-400:]
    rows = []
    for line in dump.read_text().splitlines():
        rows.append([
            (int(t.split(":")[0]), float(t.split(":")[1]))
            for t in line.split()
        ])
    assert len(rows) == len(CASES)
    for (line, qtext), got in zip(CASES, rows):
        want = oracle_search(corpus, parse_query(qtext).root, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], (line, qtext)
        if want:
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in want],
                rtol=1e-5, atol=0, err_msg=qtext,
            )
        assert got or not want, qtext
