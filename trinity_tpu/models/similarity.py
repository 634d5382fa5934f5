"""Similarity models: BM25, TF-IDF, Trivial.

Re-specification of the reference's accumulated-score-scheme scorers
(similarity.h:56-255) split TPU-style into a *host* per-term weight
(f64 idf math, computed once per query like new_scorer_weight,
similarity.h:202-226) and a *device* elementwise tf over dense frequency
tiles (the score() hot path, similarity.h:228-235, fused into the tape-eval
XLA program instead of a per-doc virtual call).

All device math is f32 with a fixed operation order; the oracle
(trinity_tpu/oracle.py) uses these same functions through `host_score` so
engine-vs-oracle agreement is exact, not approximate.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


class Similarity:
    """Base: subclass and register in SIMILARITIES (the analog of
    subclassing IndexSourcesCollectionTermsScorer, similarity.h:43-53)."""

    name: str = "?"

    @staticmethod
    def weight(dfs: Sequence[int], docs_cnt: int) -> float:
        """Per-(term|phrase) weight from member-term document frequencies,
        aggregated across the collection (similarity.h:209-217). f64."""
        raise NotImplementedError

    @staticmethod
    def score_tile(freq, weight):
        """Device: f32 score from f32 freq tile and f32 weight (broadcast)."""
        raise NotImplementedError

    @classmethod
    def host_score(cls, freq: int, weight: float) -> np.float32:
        """Oracle path: identical f32 op order on scalars."""
        return cls.score_tile(np.float32(freq), np.float32(weight))


class BM25(Similarity):
    """similarity.h:165-255: idf = ln(1 + (N - df + .5)/(df + .5)) summed
    over member terms; score = idf * freq / (freq + k1); k1 = 1.2 and the
    norm is fixed at k1 (`const auto norm{k1}`, similarity.h:230 — no
    document-length normalization)."""

    name = "bm25"
    K1 = np.float32(1.2)

    @staticmethod
    def weight(dfs, docs_cnt):
        return sum(
            math.log(1.0 + (docs_cnt - df + 0.5) / (df + 0.5)) for df in dfs
        )

    @staticmethod
    def score_tile(freq, weight):
        return (weight * freq) / (freq + BM25.K1)


class TFIDF(Similarity):
    """similarity.h:75-163: idf = ln((N+1)/(df+1)) + 1 summed over member
    terms; score = sqrt(freq) * idf."""

    name = "tfidf"

    @staticmethod
    def weight(dfs, docs_cnt):
        return sum(math.log((docs_cnt + 1) / float(df + 1)) + 1.0 for df in dfs)

    @staticmethod
    def score_tile(freq, weight):
        return _sqrt(freq) * weight


class Trivial(Similarity):
    """similarity.h:56-72: score = freq."""

    name = "trivial"

    @staticmethod
    def weight(dfs, docs_cnt):
        return 0.0

    @staticmethod
    def score_tile(freq, weight):
        return freq


def _sqrt(x):
    """f32 sqrt for both host scalars and device tiles (both IEEE-rounded,
    so oracle and engine agree bit-exactly)."""
    if isinstance(x, (float, np.floating, np.ndarray)):
        return np.sqrt(x)
    import jax.numpy as jnp

    return jnp.sqrt(x)


SIMILARITIES = {c.name: c for c in (BM25, TFIDF, Trivial)}
