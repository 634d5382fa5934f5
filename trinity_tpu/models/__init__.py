"""Similarity/scoring models (reference: similarity.h, SURVEY §2 L5)."""

from trinity_tpu.models.similarity import (
    BM25,
    TFIDF,
    SIMILARITIES,
    Similarity,
    Trivial,
)

__all__ = ["Similarity", "BM25", "TFIDF", "Trivial", "SIMILARITIES"]
