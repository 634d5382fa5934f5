"""trinity_tpu — a TPU-native information-retrieval framework.

Brand-new JAX/XLA/Pallas re-architecture of the capabilities of
phaistos-networks/Trinity (a C++17 IR library; see SURVEY.md): inverted
indexing with bit-packed block postings, a boolean/phrase query language
with an AST compiler, dense tiled execution of conjunction / disjunction /
k-of-n / phrase retrieval, BM25/TF-IDF scoring with exact top-k, deletion
masking, segment merge, a percolator, and multi-chip mesh serving.

Quick start::

    from trinity_tpu import SegmentIndexSession, Executor

    sess = SegmentIndexSession()
    proxy = sess.begin(doc_id=1)
    for pos, token in enumerate("hello brave new world".split(), start=1):
        proxy.insert(token, pos)
    sess.insert(proxy)
    ex = Executor(sess.commit())
    for hit in ex.search("hello world", k=10):
        print(hit.doc_id, hit.score)
"""

from trinity_tpu import limits
from trinity_tpu.config import configure, get_config
from trinity_tpu.exec.executor import ExecFlags, Executor, SearchResult
from trinity_tpu.exec.richmatch import (
    AbortSearch,
    DocWordsSpace,
    MatchedDocument,
    MatchedTerm,
    TermHit,
    exec_rich,
)
from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.index.format import SegmentData
from trinity_tpu.index.merge import MergeCandidatesCollection, Retention
from trinity_tpu.index.source import IndexSource, IndexSourcesCollection
from trinity_tpu.percolator import Percolator
from trinity_tpu.query.parser import ParserFlags, Query, parse_query
from trinity_tpu.query.rewrite import Alternative, rewrite_query
from trinity_tpu.utils.metrics import get_metrics

__version__ = "0.1.0"


def exec_query(query, source, k=10, scorer="bm25", flags=ExecFlags.ACCUMULATED_SCORE_SCHEME):
    """Convenience facade mirroring the reference's exec_query entry point
    (exec.h:50-52). `source` is a SegmentData, Executor, or
    IndexSourcesCollection."""
    if isinstance(source, IndexSourcesCollection):
        if flags & ExecFlags.DOCUMENTS_ONLY:
            return source.match_ids(query)
        return source.search(query, k=k, scorer=scorer)
    ex = source if isinstance(source, Executor) else Executor(source)
    if flags & ExecFlags.DOCUMENTS_ONLY:
        return ex.match_ids(query)
    return ex.search(query, k=k, scorer=scorer)


__all__ = [
    "limits",
    "configure",
    "get_config",
    "Executor",
    "ExecFlags",
    "SearchResult",
    "SegmentIndexSession",
    "SegmentData",
    "IndexSource",
    "IndexSourcesCollection",
    "MergeCandidatesCollection",
    "Retention",
    "Percolator",
    "Query",
    "parse_query",
    "ParserFlags",
    "Alternative",
    "rewrite_query",
    "exec_query",
    "get_metrics",
    "exec_rich",
    "AbortSearch",
    "MatchedDocument",
    "MatchedTerm",
    "TermHit",
    "DocWordsSpace",
    "__version__",
]
