"""Default (rich-match) execution mode: matched documents with term hits.

The reference's default mode hands the application a `matched_document` per
match — matched terms, their freqs and materialized hits (positions +
payloads), plus a DocWordsSpace for proximity tests (matches.h:117-186,
queryexec_ctx.cpp:535-648). Virtual-call-per-document doesn't fit a TPU, so
the equivalent here is batched: the device computes the matched-doc set and
each matched doc's per-term (freq, hits offset) in one program; the host
materializes MatchedDocument objects from the positions stream and invokes
the callback — same information, amortized transfer.

Phrases are handled by relaxing the plan for the device mask (phrase ->
member conjunction at positive polarity, const-false at negated polarity,
so the candidate set is a superset) and exact-re-evaluating each candidate
on the host over its materialized positions (oracle._eval, the spec
evaluator). An AbortSearch raised by the callback stops enumeration — the
aborted_search_exception analog (matches.h:132-137)."""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from trinity_tpu.limits import MAX_POSITION, WINDOW_SIZE


class AbortSearch(Exception):
    """Raise from a match callback to abort (matches.h:132-137)."""


@dataclass
class TermHit:
    """runtime.h:8-20 term_hit."""

    pos: int
    payload: int = 0


@dataclass
class MatchedTerm:
    """One matched term with materialized hits (matches.h:36-71 term_hits)."""

    term: str
    freq: int
    hits: List[TermHit]


@dataclass
class MatchedDocument:
    """matches.h:117-130 matched_document."""

    doc_id: int
    matched_terms: List[MatchedTerm]
    dws: "DocWordsSpace"

    def term(self, text: str) -> Optional[MatchedTerm]:
        for mt in self.matched_terms:
            if mt.term == text:
                return mt
        return None


class DocWordsSpace:
    """Positional scratchpad (docwordspace.h:40-127): O(1) set/test of
    (term, position), plus the reference phrase test (docwordspace.cpp:3-15)."""

    def __init__(self, max_pos: int = MAX_POSITION):
        self._pos: Dict[int, str] = {}

    def set(self, term: str, pos: int) -> None:
        self._pos[pos] = term

    def test(self, term: str, pos: int) -> bool:
        return self._pos.get(pos) == term

    def test_phrase(self, terms: List[str], first_pos: int) -> bool:
        return all(
            self.test(t, first_pos + i) for i, t in enumerate(terms)
        )


def _relax_tape(tape, polarity=True):
    """Phrase -> member AND at positive polarity (superset), const-false /
    const-true swaps at negative polarity so the device mask stays a
    superset of the exact matches."""
    kind = tape[0]
    if kind == "phrase":
        _, slots, widx = tape
        if not polarity:
            return ("false",)
        out = ("tok", slots[0], widx)
        for s in slots[1:]:
            out = ("and", out, ("tok", s, widx))
        return out
    if kind in ("and", "or"):
        return (kind, _relax_tape(tape[1], polarity), _relax_tape(tape[2], polarity))
    if kind == "not":
        return ("not", _relax_tape(tape[1], polarity), _relax_tape(tape[2], not polarity))
    if kind == "unot":
        return ("unot", _relax_tape(tape[1], not polarity))
    if kind == "opt":
        # optional-match contributes capture only; keep for slot gathering
        return ("opt", _relax_tape(tape[1], polarity))
    if kind == "some":
        return ("some", tape[1], tuple(_relax_tape(c, polarity) for c in tape[2]))
    return tape


@functools.lru_cache(maxsize=256)
def _build_rich_fn(relaxed_tape, W, T, C, interpret):
    """Device pass: matched-doc candidates + per-slot (freq, hits offset)."""
    import jax
    import jax.numpy as jnp

    from trinity_tpu.exec.executor import _eval_tape
    from trinity_tpu.models.similarity import Trivial
    from trinity_tpu.ops.postings import materialize_freq_tiles

    def run(bmeta, planes, cs, cn, n_docs, deleted):
        tiles, offs = materialize_freq_tiles(
            bmeta,
            planes,
            cs,
            cn,
            n_windows=W,
            n_terms=T,
            interpret=interpret,
            with_offsets=True,
        )
        freq = tiles.reshape(W, T, WINDOW_SIZE)
        offv = offs.reshape(W, T, WINDOW_SIZE)
        mask, _ = _eval_tape(relaxed_tape, freq, lambda i: 0.0, Trivial, jnp)
        gid = (
            jnp.arange(W, dtype=jnp.int32)[:, None] * WINDOW_SIZE
            + jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
        )
        mask = mask & (gid < n_docs)
        if deleted is not None:
            mask = mask & ~deleted.reshape(W, WINDOW_SIZE)
        iota = jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
        key = jnp.where(mask, WINDOW_SIZE - iota, 0)
        kv, ki = jax.lax.top_k(key, C)  # candidates, docid-ascending
        valid = kv > 0
        cnt = mask.sum(axis=1)
        pf = jnp.stack(
            [jnp.take_along_axis(freq[:, s, :], ki, axis=1) for s in range(T)],
            axis=-1,
        ).astype(jnp.int32)
        po = jnp.stack(
            [jnp.take_along_axis(offv[:, s, :], ki, axis=1) for s in range(T)],
            axis=-1,
        )
        return ki, valid, cnt, pf, po

    return jax.jit(run)


def exec_rich(
    executor,
    query,
    on_match: Callable[[MatchedDocument], None],
    candidate_cap: Optional[int] = None,
) -> int:
    """Default-mode execution: invokes on_match(MatchedDocument) for every
    matching document in ascending doc order (exec.cpp default mode).
    Returns the number of matches delivered."""
    import jax.numpy as jnp

    from trinity_tpu.oracle import Scorer, _eval
    from trinity_tpu.models.similarity import Trivial
    from trinity_tpu.ops.postings import compute_cells
    from trinity_tpu.plan.compile import compile_plan
    from trinity_tpu.query.parser import Query, parse_query

    if isinstance(query, str):
        query = parse_query(query)
    root = query.root if isinstance(query, Query) else query
    if root is None:
        return 0
    seg = executor.seg
    plan = compile_plan(root)
    relaxed = _relax_tape(plan.tape)
    tids = [seg.term_id(t) for t in plan.term_texts]
    cs, cn = compute_cells(seg, tids)
    from trinity_tpu.exec.executor import _pad_T

    W, T = seg.n_windows, _pad_T(plan.n_slots)
    pad = T - plan.n_slots
    if pad:
        cs = np.pad(cs, ((0, 0), (0, pad)))
        cn = np.pad(cn, ((0, 0), (0, pad)))
    if candidate_cap is None:
        from trinity_tpu.config import get_config

        candidate_cap = get_config().rich_candidate_cap
    C = min(candidate_cap, WINDOW_SIZE)
    while True:
        fn = _build_rich_fn(relaxed, W, T, C, executor.interpret)
        ki, valid, cnt, pf, po = (
            np.asarray(x)
            for x in fn(
                executor.bmeta,
                executor.planes,
                jnp.asarray(cs),
                jnp.asarray(cn),
                np.int32(seg.n_docs),
                executor._deleted,
            )
        )
        max_cnt = int(cnt.max(initial=0))
        if max_cnt <= C or C >= WINDOW_SIZE:
            break
        C = WINDOW_SIZE if max_cnt > 8192 else 8192

    # host materialization + exact evaluation, window by window
    class _NullScorer(Scorer):
        def __init__(self):
            self.model = Trivial

        def weight(self, terms):
            return 0.0

    sc = _NullScorer()
    weights_cache: dict = {}
    delivered = 0
    positions = seg.positions
    for w in range(W):
        for c in range(C):
            if not valid[w, c]:
                break
            local = w * WINDOW_SIZE + int(ki[w, c])
            doc_terms: Dict[str, List[int]] = {}
            doc_offs: Dict[str, int] = {}
            for s, text in enumerate(plan.term_texts):
                f = int(pf[w, c, s])
                if f > 0:
                    o = int(po[w, c, s])
                    doc_terms[text] = [int(p) for p in positions[o : o + f]]
                    doc_offs[text] = o
            matched, _ = _eval(root, doc_terms, sc, weights_cache)
            if not matched:
                continue  # relaxed candidate that fails exact (phrase) check
            dws = DocWordsSpace()
            mts = []
            payloads = seg.payloads
            for text, pos_list in doc_terms.items():
                for p in pos_list:
                    dws.set(text, p)
                o = doc_offs[text]
                hits = [
                    TermHit(
                        p,
                        int(payloads[o + i]) if payloads is not None else 0,
                    )
                    for i, p in enumerate(pos_list)
                ]
                mts.append(
                    MatchedTerm(term=text, freq=len(pos_list), hits=hits)
                )
            md = MatchedDocument(
                doc_id=int(seg.doc_map[local]), matched_terms=mts, dws=dws
            )
            try:
                on_match(md)
            except AbortSearch:
                return delivered
            delivered += 1
    return delivered
