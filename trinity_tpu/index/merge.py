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
from trinity_tpu.index.format import PAYLOAD_DT, SegmentData, decode_block
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

        Fast path: a single candidate with nothing masked is returned
        structurally unchanged (the whole-segment analog of the reference's
        per-term append_index_chunk raw copy, merge.cpp:166-180 — with one
        array layout there is nothing to re-encode).

        Slow path is still one vectorized pass per source: whole-segment
        native decode (format.decode_all_postings), repeat-mask filtering of
        the parallel positions/payloads streams, renumbering into the merged
        docid space, one lexsort, one native re-encode. No per-term or
        per-block Python loops.

        keep_updated_ids: if older segments outside this merge set still
        exist, the merged segment must keep shadowing them; pass False when
        merging the full collection.
        """
        from trinity_tpu.index.format import decode_all_postings

        self.commit()

        updated_all = np.unique(
            np.concatenate(
                [c.seg.updated_ids for c in self.candidates]
                + [np.zeros(0, np.uint32)]
            )
        )
        updated = (
            updated_all if keep_updated_ids else np.zeros(0, np.uint32)
        )

        # ---- raw-copy fast path (merge.cpp:166-180 analog) ----
        # a single candidate has no newer in-set candidates, so nothing is
        # masked and nothing needs renumbering: share the arrays as-is
        if len(self.candidates) == 1:
            import copy as _copy

            out = _copy.copy(self.candidates[0].seg)
            out.updated_ids = updated.astype(np.uint32)
            return out

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
            term_names.update(seg.terms_list())

        new_app = (
            np.unique(np.concatenate(app_id_arrays))
            if app_id_arrays
            else np.zeros(0, np.uint32)
        )
        merged_terms = sorted(term_names)
        term_rank = {t: i for i, t in enumerate(merged_terms)}

        all_tid: List[np.ndarray] = []
        all_doc: List[np.ndarray] = []
        all_pos: List[np.ndarray] = []
        all_pay: List[np.ndarray] = []
        any_payloads = any(
            c.seg.payloads is not None for c in self.candidates
        )
        for cand, keep in zip(self.candidates, survivors):
            seg = cand.seg
            if not keep.any():
                continue
            tids, docs, freqs = decode_all_postings(seg)
            # per-hit expansion; positions (and payloads) are parallel to
            # this exact order, so one repeat-mask filters all streams
            hit_doc = np.repeat(docs.astype(np.int64), freqs)
            hit_tid = np.repeat(tids, freqs)
            hit_alive = keep[hit_doc]
            total_hits = len(hit_doc)
            pos = np.asarray(seg.positions[np.flatnonzero(hit_alive)])
            trans = np.searchsorted(new_app, seg.doc_map).astype(np.int64)
            rank_of = np.array(
                [term_rank[t] for t in seg.terms_list()], np.int64
            )
            all_doc.append(trans[hit_doc[hit_alive]])
            all_tid.append(rank_of[hit_tid[hit_alive]])
            all_pos.append(pos.astype(np.int64))
            if any_payloads:
                if seg.payloads is not None:
                    all_pay.append(seg.payloads[: total_hits][hit_alive])
                else:
                    all_pay.append(
                        np.zeros(int(hit_alive.sum()), PAYLOAD_DT)
                    )

        if all_tid:
            tid_a = np.concatenate(all_tid)
            doc_a = np.concatenate(all_doc)
            pos_a = np.concatenate(all_pos)
            pay_a = np.concatenate(all_pay) if any_payloads else None
            perm = np.lexsort((pos_a, doc_a, tid_a))
            tid_a, doc_a, pos_a = tid_a[perm], doc_a[perm], pos_a[perm]
            if pay_a is not None:
                pay_a = pay_a[perm]
        else:
            tid_a = doc_a = pos_a = np.zeros(0, np.int64)
            pay_a = np.zeros(0, PAYLOAD_DT) if any_payloads else None

        merged_term_list = [
            t if isinstance(t, bytes) else t.encode() for t in merged_terms
        ]
        return _build_segment(
            new_app.astype(np.uint32),
            merged_term_list,
            tid_a,
            doc_a,
            pos_a,
            pay_a,
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
