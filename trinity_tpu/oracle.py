"""Naive reference engine — the golden oracle for parity testing.

The reference binary cannot be built in this environment (its FastPFor /
snappy submodules are not vendored), so exact-parity testing (SURVEY §4)
runs against this independent, deliberately-naive implementation of the
same specification:

- match semantics of the exec engine (exec.cpp:509+, docset_iterators.cpp):
  AND / STRICT_AND conjunction, OR disjunction, `lhs NOT rhs` filtering,
  ConstTrueExpr optional-match, MatchSome k-of-n, phrase adjacency
  verification (docset_iterators.cpp:66-224 consider_phrase_match);
- AccumulatedScoreScheme scoring (similarity.h): per term/phrase scores
  summed over *matching* iterators, f32, in query token-slot order;
  BM25 (similarity.h:165-255): idf = ln(1+(N-df+.5)/(df+.5)),
  score = idf * freq/(freq+k1), k1=1.2, norm fixed at k1;
  TF-IDF (similarity.h:75-163): idf = ln((N+1)/(df+1))+1, score=sqrt(f)*idf;
  Trivial (similarity.h:56-72): score = freq;
- deterministic ranking: score desc, doc id asc.

It operates on a plain token corpus (no index structures shared with the
real engine) so disagreements implicate the engine, not a common bug.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from trinity_tpu.query.ast import (
    BinOp,
    ConstFalse,
    ConstTrueExpr,
    Dummy,
    MatchSome,
    Node,
    Op,
    Phrase,
    UnaryOp,
)


@dataclass
class OracleCorpus:
    """Documents as term -> positions maps."""

    docs: Dict[int, Dict[str, List[int]]] = field(default_factory=dict)
    erased: set = field(default_factory=set)

    def add(self, doc_id: int, tokens: Sequence[str], first_pos: int = 1):
        d: Dict[str, List[int]] = {}
        for i, t in enumerate(tokens):
            d.setdefault(t, []).append(first_pos + i)
        self.docs[doc_id] = d

    def erase(self, doc_id: int):
        self.docs.pop(doc_id, None)
        self.erased.add(doc_id)

    # collection-level stats (field_statistics aggregation, similarity.h:146-158)
    def doc_freq(self, term: str) -> int:
        return sum(1 for d in self.docs.values() if term in d)

    @property
    def docs_cnt(self) -> int:
        return len(self.docs)

    @property
    def sum_terms_docs(self) -> int:
        return sum(len(d) for d in self.docs.values())


def phrase_freq(doc: Dict[str, List[int]], terms: List[str]) -> int:
    """Number of phrase occurrences: positions p with term[k] at p+k for all k
    (docwordspace.cpp:3-15 test_phrase reference impl)."""
    if any(t not in doc for t in terms):
        return 0
    first = doc[terms[0]]
    rest = [set(doc[t]) for t in terms[1:]]
    return sum(1 for p in first if all(p + k + 1 in s for k, s in enumerate(rest)))


class Scorer:
    """Per-(term-or-phrase) weight + per-doc score (similarity.h:22-41),
    delegating the actual formulas to the shared spec in
    trinity_tpu/models/similarity.py so oracle and engine cannot diverge.

    docs_cnt/df_of overrides mirror the reference's convention that field
    statistics and document frequencies are aggregated over *raw* segments,
    ignoring generation masking (similarity.h:209-217 sums
    resolve_term_ctx(term).documents per source as-is)."""

    def __init__(self, corpus: OracleCorpus, model, docs_cnt=None, df_of=None):
        self.corpus = corpus
        self.model = model
        self.docs_cnt = corpus.docs_cnt if docs_cnt is None else docs_cnt
        self.df_of = df_of or corpus.doc_freq

    def weight(self, terms: List[str]) -> float:
        dfs = [self.df_of(t) for t in terms]
        return self.model.weight(dfs, self.docs_cnt)

    def score(self, freq: int, weight: float) -> np.float32:
        return np.float32(self.model.host_score(freq, np.float32(weight)))


def _eval(
    n: Node, doc: Dict[str, List[int]], scorer: Scorer, weights: dict
) -> Tuple[bool, np.float32]:
    """Returns (matched, score). Score contributions only from matching
    subtrees, accumulated left-to-right in f32."""
    z = np.float32(0)
    if isinstance(n, Phrase):
        terms = [t.text for t in n.terms]
        if n.size == 1:
            freq = len(doc.get(terms[0], ()))
        else:
            freq = phrase_freq(doc, terms)
        if freq == 0:
            return False, z
        key = tuple(terms)
        if key not in weights:
            weights[key] = scorer.weight(terms)
        return True, scorer.score(freq, weights[key])
    if isinstance(n, BinOp):
        lm, ls = _eval(n.lhs, doc, scorer, weights)
        rm, rs = _eval(n.rhs, doc, scorer, weights)
        op = n.op.normalized()
        if op is Op.AND:
            return (lm and rm), np.float32(ls + rs) if (lm and rm) else z
        if op is Op.OR:
            if lm or rm:
                return True, np.float32(ls + rs)
            return False, z
        if op is Op.NOT:
            return (lm and not rm), ls if (lm and not rm) else z
        raise ValueError(op)
    if isinstance(n, UnaryOp):
        if n.op is Op.NOT:
            m, _ = _eval(n.expr, doc, scorer, weights)
            return (not m), z
        return _eval(n.expr, doc, scorer, weights)
    if isinstance(n, ConstTrueExpr):
        m, s = _eval(n.expr, doc, scorer, weights)
        return True, s if m else z
    if isinstance(n, MatchSome):
        cnt = 0
        total = z
        for c in n.nodes:
            m, s = _eval(c, doc, scorer, weights)
            if m:
                cnt += 1
                total = np.float32(total + s)
        ok = cnt >= n.min
        return ok, total if ok else z
    if isinstance(n, (ConstFalse,)):
        return False, z
    if isinstance(n, Dummy):
        return False, z
    raise TypeError(type(n))


def oracle_search(
    corpus: OracleCorpus,
    root: Optional[Node],
    k: int = 10,
    scorer: str = "bm25",
    masked: Optional[set] = None,
    docs_cnt=None,
    df_of=None,
) -> List[Tuple[int, float]]:
    """Exact ranked top-k: [(doc_id, score)] by (score desc, doc id asc)."""
    if root is None:
        return []
    from trinity_tpu.models.similarity import SIMILARITIES

    sc = Scorer(corpus, SIMILARITIES[scorer], docs_cnt=docs_cnt, df_of=df_of)
    weights: dict = {}
    out = []
    for doc_id in sorted(corpus.docs):
        if masked and doc_id in masked:
            continue
        m, s = _eval(root, corpus.docs[doc_id], sc, weights)
        if m:
            out.append((doc_id, float(s)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def oracle_match_ids(
    corpus: OracleCorpus, root: Optional[Node], masked: Optional[set] = None
) -> List[int]:
    """DocumentsOnly mode (exec.h:23): matching doc ids ascending."""
    if root is None:
        return []
    from trinity_tpu.models.similarity import SIMILARITIES

    sc = Scorer(corpus, SIMILARITIES["trivial"])
    weights: dict = {}
    return [
        doc_id
        for doc_id in sorted(corpus.docs)
        if not (masked and doc_id in masked)
        and _eval(root, corpus.docs[doc_id], sc, weights)[0]
    ]
