"""Index sources and search-session collections.

The analog of index_source.h / index_source.cpp: an IndexSource wraps one
segment with a generation; an IndexSourcesCollection is a generation-ordered
set of sources where each source's documents are shadowed by the
updated/erased doc ids of all *newer* sources (scanner_registry_for,
index_source.cpp:3-30) — deletions and updates never touch old segments,
they are masked at query time (docidupdates semantics).

Where the reference fans out one thread per source (exec_query_par,
exec.h:86-177) and leaves top-k merging to the caller, the collection here
executes per-source device searches and merges deterministically
(score desc, app docid asc). Collection-level field statistics and document
frequencies are aggregated across sources exactly like
IndexSourcesCollectionBM25Scorer::reset/new_scorer_weight
(similarity.h:209-249).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from trinity_tpu.index.format import FieldStatistics, SegmentData


def now_generation() -> int:
    """Generations are microsecond timestamps, like segment dir names
    (segment_index_source.cpp:16-22)."""
    return time.time_ns() // 1000


@dataclass
class IndexSource:
    """One searchable segment + generation (index_source.h:18-155)."""

    seg: SegmentData
    generation: int
    _executor: object = None

    def executor(self):
        if self._executor is None:
            from trinity_tpu.exec.executor import Executor

            self._executor = Executor(self.seg)
        return self._executor

    @property
    def updated_ids(self) -> np.ndarray:
        return self.seg.updated_ids

    def index_empty(self) -> bool:
        return self.seg.n_docs == 0


class IndexSourcesCollection:
    """Generation-ordered sources + per-source masked registries
    (index_source.h:191-238)."""

    def __init__(self):
        self.sources: List[IndexSource] = []
        self._committed = False

    def insert(self, source: IndexSource) -> None:
        self.sources.append(source)
        self._committed = False

    def add_segment(self, seg: SegmentData, generation: Optional[int] = None):
        self.insert(IndexSource(seg, generation or now_generation()))
        return self

    def commit(self) -> "IndexSourcesCollection":
        """Sort newest-first and install masked registries: source i is
        masked by the union of updated ids of all newer sources
        (index_source.cpp:3-30)."""
        self.sources.sort(key=lambda s: -s.generation)
        newer_updates: List[np.ndarray] = []
        acc = np.zeros(0, np.uint32)
        for src in self.sources:  # newest -> oldest
            newer_updates.append(acc)
            if len(src.updated_ids):
                acc = np.union1d(acc, src.updated_ids)
        for src, masked_app in zip(self.sources, newer_updates):
            ex = src.executor()
            if len(masked_app) == 0:
                ex.set_masked_local_docs(None)
                continue
            # local ids whose app id is shadowed (sorted-array intersection,
            # the masked_documents_registry::test analog)
            idx = np.searchsorted(masked_app, src.seg.doc_map)
            idx = np.minimum(idx, len(masked_app) - 1)
            hit = masked_app[idx] == src.seg.doc_map
            ex.set_masked_local_docs(np.flatnonzero(hit))
        self._committed = True
        return self

    # -------------------------------------------------- aggregated scoring
    def aggregated_stats(self) -> FieldStatistics:
        """similarity.h:146-158 reset() aggregation."""
        st = FieldStatistics()
        for src in self.sources:
            s = src.seg.stats
            st.sum_term_hits += s.sum_term_hits
            st.total_terms += s.total_terms
            st.sum_terms_docs += s.sum_terms_docs
            st.docs_cnt += s.docs_cnt
        return st

    def doc_freq(self, term: str) -> int:
        """Aggregate df across sources (similarity.h:209-217)."""
        df = 0
        for src in self.sources:
            tid = src.seg.term_id(term)
            if tid >= 0:
                df += int(src.seg.term_df[tid])
        return df

    # ------------------------------------------------------------- search
    def search(self, query, k: int = 10, scorer: str = "bm25"):
        """exec_query over every source + deterministic top-k merge
        (exec.h:63-81; merging contract exec.h:55-58)."""
        return self.search_batch([query], k=k, scorer=scorer)[0]

    def search_batch(self, queries, k: int = 10, scorer: str = "bm25"):
        """Batched collection search: every source's combined device
        program is DISPATCHED before any is awaited (the async analog of
        the per-source std::async fan-out, exec.h:132-154 — but each
        source also batches all queries into one program), then per-query
        results merge deterministically (score desc, app docid asc)."""
        if not self._committed:
            self.commit()
        stats = self.aggregated_stats()
        handles = []
        for src in self.sources:
            if src.index_empty():
                continue
            ex = src.executor()
            handles.append(
                (ex, ex.launch_batch(queries, k=k, scorer=scorer,
                                     stats=stats, df_of=self.doc_freq))
            )
        per_source = [ex.finish_batch(h) for ex, h in handles]
        out = []
        for qi in range(len(queries)):
            merged = [r for res in per_source for r in res[qi]]
            merged.sort(key=lambda r: (-r.score, r.doc_id))
            out.append(merged[:k])
        return out

    def search_pruned(self, query, k: int = 10, scorer: str = "bm25",
                      chunk_windows: int = 16):
        return self.search_pruned_batch([query], k, scorer, chunk_windows)[0]

    def search_pruned_batch(self, queries, k: int = 10,
                            scorer: str = "bm25", chunk_windows: int = 16):
        """Block-max pruned search across generations: per-source pruned
        loops with collection-aggregated stats (scores identical to
        search_batch), deterministic merge."""
        if not self._committed:
            self.commit()
        stats = self.aggregated_stats()
        per_source = [
            src.executor().search_pruned_batch(
                queries, k, scorer, chunk_windows, stats, self.doc_freq
            )
            for src in self.sources
            if not src.index_empty()
        ]
        out = []
        for qi in range(len(queries)):
            merged = [r for res in per_source for r in res[qi]]
            merged.sort(key=lambda r: (-r.score, r.doc_id))
            out.append(merged[:k])
        return out

    def match_ids(self, query) -> np.ndarray:
        if not self._committed:
            self.commit()
        out = [src.executor().match_ids(query) for src in self.sources]
        return np.unique(np.concatenate(out)) if out else np.zeros(0, np.uint32)

    def exec_rich(self, query, on_match, **kwargs) -> int:
        """Default rich-match mode across generations: per-source
        exec_rich under the installed masked registries (newest source
        first). Callback order is ascending per source; cross-source
        merging is the caller's concern, exactly the reference's
        multi-source contract (exec.h:55-62). Returns total matches."""
        from trinity_tpu.exec.richmatch import exec_rich as _exec_rich

        if not self._committed:
            self.commit()
        total = 0
        for src in self.sources:
            if not src.index_empty():
                total += _exec_rich(src.executor(), query, on_match, **kwargs)
        return total

    # ------------------------------------------------------------ persist
    def persist(self, root: str) -> None:
        """One directory per generation (segment_index_source.cpp:16-22)."""
        for src in self.sources:
            src.seg.persist(os.path.join(root, str(src.generation)))

    @classmethod
    def load(cls, root: str) -> "IndexSourcesCollection":
        c = cls()
        for name in sorted(os.listdir(root)):
            path = os.path.join(root, name)
            if os.path.isdir(path) and os.path.exists(os.path.join(path, "id")):
                c.insert(IndexSource(SegmentData.load(path), int(name)))
        return c.commit()
