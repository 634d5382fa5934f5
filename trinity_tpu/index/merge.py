"""Segment merge / compaction.

The analog of merge.h / merge.cpp: a MergeCandidatesCollection gathers
generation-sorted segments, builds per-source masked registries from the
updated ids of newer candidates (merge.cpp:6-35), and merges them into one
segment, dropping masked documents. Where the reference dispatches between
raw chunk copy / codec-native merge / decode-reencode (merge.cpp:160-394),
the array format here makes one vectorized decode -> filter -> re-encode
pass both the simple and the fast path: postings decode to flat numpy
arrays, survivors are renumbered into the merged dense docid space, and the
standard builder re-blocks them.

Retention planning (consider_tracked_sources, merge.cpp:418-447) is exposed
as `retention_plan`.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from trinity_tpu.index.builder import _build_segment
from trinity_tpu.index.format import SegmentData, decode_block
from trinity_tpu.index.source import IndexSource


class Retention(enum.Enum):
    """merge.h:80-92."""

    RETAIN_ALL = 0  # keep the source as-is
    RETAIN_UPDATES_ONLY = 1  # only its updated-documents mask still matters
    DELETE = 2  # fully superseded


@dataclass
class MergeCandidate:
    seg: SegmentData
    generation: int


class MergeCandidatesCollection:
    """merge.h:33-93."""

    def __init__(self):
        self.candidates: List[MergeCandidate] = []

    def insert(self, seg: SegmentData, generation: int) -> None:
        self.candidates.append(MergeCandidate(seg, generation))

    def add_source(self, src: IndexSource) -> None:
        self.insert(src.seg, src.generation)

    def commit(self) -> None:
        """Sort newest-first (merge.cpp:6-25)."""
        self.candidates.sort(key=lambda c: -c.generation)

    def _masked_for(self, i: int) -> np.ndarray:
        """Union of updated ids of all *newer* candidates (merge.cpp:26-35)."""
        ids = [c.seg.updated_ids for c in self.candidates[:i] if len(c.seg.updated_ids)]
        return (
            np.unique(np.concatenate(ids)) if ids else np.zeros(0, np.uint32)
        )

    def merge(self, keep_updated_ids: bool = True) -> SegmentData:
        """N-way merge -> one SegmentData (merge.cpp:40-416).

        keep_updated_ids: if older segments outside this merge set still
        exist, the merged segment must keep shadowing them; pass False when
        merging the full collection.
        """
        self.commit()
        all_tid: List[np.ndarray] = []
        all_doc: List[np.ndarray] = []
        all_pos: List[np.ndarray] = []
        term_names: set = set()
        app_id_arrays = []
        seen_app: Optional[np.ndarray] = None

        # survivors per source, newest first: a doc survives if not masked by
        # newer candidates and not already contributed by a newer candidate
        # (duplicate app ids can only happen via update(); newest wins)
        survivors = []
        for i, cand in enumerate(self.candidates):
            seg = cand.seg
            masked_app = self._masked_for(i)
            keep = np.ones(seg.n_docs, bool)
            if len(masked_app):
                idx = np.searchsorted(masked_app, seg.doc_map)
                idx = np.minimum(idx, len(masked_app) - 1)
                keep &= masked_app[idx] != seg.doc_map
            if seen_app is not None and len(seen_app):
                idx = np.searchsorted(seen_app, seg.doc_map)
                idx = np.minimum(idx, len(seen_app) - 1)
                keep &= seen_app[idx] != seg.doc_map
            survivors.append(keep)
            kept_ids = seg.doc_map[keep]
            app_id_arrays.append(kept_ids)
            seen_app = (
                kept_ids
                if seen_app is None
                else np.union1d(seen_app, kept_ids)
            )
            term_names.update(seg.terms)

        new_app = (
            np.unique(np.concatenate(app_id_arrays))
            if app_id_arrays
            else np.zeros(0, np.uint32)
        )
        merged_terms = sorted(term_names)
        term_rank = {t: i for i, t in enumerate(merged_terms)}

        for cand, keep in zip(self.candidates, survivors):
            seg = cand.seg
            if not keep.any():
                continue
            # local -> merged-local docid translation
            trans = np.searchsorted(new_app, seg.doc_map).astype(np.int64)
            for tid in range(seg.n_terms):
                s = int(seg.term_block_start[tid])
                nb = int(seg.term_nblocks[tid])
                if nb == 0:
                    continue
                docs_parts, freqs_parts, pos_parts = [], [], []
                for b in range(s, s + nb):
                    docs, freqs = decode_block(seg, b)
                    h0 = int(seg.block_hits_off[b])
                    pos = seg.positions[h0 : h0 + int(freqs.sum())]
                    docs_parts.append(docs)
                    freqs_parts.append(freqs)
                    pos_parts.append(pos)
                docs = np.concatenate(docs_parts)
                freqs = np.concatenate(freqs_parts)
                pos = np.concatenate(pos_parts)
                alive = keep[docs]
                if not alive.any():
                    continue
                # expand to per-hit rows, filter by surviving docs
                hit_doc = np.repeat(docs, freqs)
                hit_alive = keep[hit_doc]
                hd = trans[hit_doc[hit_alive]]
                hp = pos[hit_alive].astype(np.int64)
                ht = np.full(len(hd), term_rank[seg.terms[tid]], np.int64)
                all_tid.append(ht)
                all_doc.append(hd)
                all_pos.append(hp)

        if all_tid:
            tid_a = np.concatenate(all_tid)
            doc_a = np.concatenate(all_doc)
            pos_a = np.concatenate(all_pos)
            perm = np.lexsort((pos_a, doc_a, tid_a))
            tid_a, doc_a, pos_a = tid_a[perm], doc_a[perm], pos_a[perm]
        else:
            tid_a = doc_a = pos_a = np.zeros(0, np.int64)

        updated = (
            np.unique(
                np.concatenate(
                    [c.seg.updated_ids for c in self.candidates]
                    + [np.zeros(0, np.uint32)]
                )
            )
            if keep_updated_ids
            else np.zeros(0, np.uint32)
        )
        merged_term_list = [
            t if isinstance(t, bytes) else t.encode() for t in merged_terms
        ]
        return _build_segment(
            new_app.astype(np.uint32),
            merged_term_list,
            tid_a,
            doc_a,
            pos_a,
            None,
            updated.astype(np.uint32),
            len(new_app),
        )

    def retention_plan(
        self, merged_generations: Sequence[int]
    ) -> Dict[int, Retention]:
        """consider_tracked_sources (merge.cpp:418-447): after merging the
        given generations, what should happen to each tracked source."""
        merged = set(merged_generations)
        newest_merged = max(merged) if merged else -1
        plan: Dict[int, Retention] = {}
        for c in self.candidates:
            if c.generation in merged:
                plan[c.generation] = Retention.DELETE
            elif c.generation < newest_merged:
                # fully shadowed content may still be masked by its updates
                plan[c.generation] = (
                    Retention.RETAIN_UPDATES_ONLY
                    if len(c.seg.updated_ids)
                    else Retention.RETAIN_ALL
                )
            else:
                plan[c.generation] = Retention.RETAIN_ALL
        return plan
