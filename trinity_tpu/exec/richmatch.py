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
from trinity_tpu.ops.select import gather_cols


class AbortSearch(Exception):
    """Raise from a match callback to abort (matches.h:132-137)."""


@dataclass
class TermHit:
    """runtime.h:8-20 term_hit: payload value + how many of its 8 bytes
    the application wrote (payloadLen)."""

    pos: int
    payload: int = 0
    payload_len: int = 0

    def payload_bytes(self) -> bytes:
        """The term_hit::bytes() view: the meaningful payload bytes."""
        return int(self.payload).to_bytes(8, "little")[: self.payload_len]


@dataclass
class MatchedTerm:
    """One matched term with materialized hits (matches.h:36-71 term_hits)."""

    term: str
    freq: int
    hits: List[TermHit]


@dataclass(frozen=True)
class QueryIndexTerm:
    """matches.h:17-24 query_index_term: one term that may match at a query
    index, with the span distance to the next AND-sibling group — the
    metadata applications use for sequence/proximity scoring."""

    term: str
    flags: int
    to_next_span: int


@dataclass(frozen=True)
class TermInstance:
    """query_term_ctx::instance_struct (matches.h:86-99): one occurrence of
    a term in the original query, with rewrite provenance."""

    index: int
    rep: int
    flags: int
    to_next_span: int
    app_phrase_id: int
    rewrite_range: tuple  # (start, stop) token range of the rewrite source
    translation_coefficient: float
    src_seq_size: int


@dataclass
class QueryTermCtx:
    """query_term_ctx (matches.h:76-108): all original-query instances of
    one term, sorted by query index."""

    term: str
    instances: List[TermInstance]


def collect_query_index_terms(root, disregard_token_flags: bool = False):
    """Build the proximity-scoring context the reference hands to
    MatchedIndexDocumentsFilter::prepare() (exec.cpp:585-657 instance
    collection + exec.cpp:694-873 per-index dedup):

    Returns (term_ctxs: Dict[term, QueryTermCtx],
             query_index_terms: Dict[index, Tuple[QueryIndexTerm, ...]]).

    Collection walks only positively-reachable nodes (NOT rhs and unary-NOT
    subtrees are skipped); each phrase member i lands at index + i with
    toNextSpan = 1 except the last member, which carries the phrase's span
    distance (exec.cpp:649-655). disregard_token_flags switches the
    per-index dedup key from (term, toNextSpan, flags) to
    (term, toNextSpan) with flags zeroed
    (ExecFlags::DisregardTokenFlagsForQueryIndicesTerms, exec.h:36-42)."""
    from trinity_tpu.query.ast import (
        BinOp,
        ConstTrueExpr,
        MatchSome,
        Op,
        Phrase,
        UnaryOp,
    )

    instances: List[tuple] = []  # (term, TermInstance)
    stack = [root] if root is not None else []
    while stack:
        n = stack.pop()
        if isinstance(n, Phrase):
            rep = n.rep if n.size == 1 else 1
            for i, t in enumerate(n.terms):
                instances.append(
                    (
                        t.text,
                        TermInstance(
                            index=n.index + i,
                            rep=rep,
                            flags=n.flags,
                            to_next_span=(
                                n.to_next_span if i == n.size - 1 else 1
                            ),
                            app_phrase_id=n.app_phrase_id,
                            rewrite_range=n.rewrite_ctx.range,
                            translation_coefficient=(
                                n.rewrite_ctx.translation_coefficient
                            ),
                            src_seq_size=n.rewrite_ctx.src_seq_size,
                        ),
                    )
                )
        elif isinstance(n, MatchSome):
            stack.extend(n.nodes)
        elif isinstance(n, UnaryOp):
            if n.op is not Op.NOT:
                stack.append(n.expr)
        elif isinstance(n, ConstTrueExpr):
            stack.append(n.expr)
        elif isinstance(n, BinOp):
            stack.append(n.lhs)
            if n.op in (Op.AND, Op.STRICT_AND, Op.OR):
                stack.append(n.rhs)

    term_ctxs: Dict[str, QueryTermCtx] = {}
    for term, inst in sorted(
        instances, key=lambda x: (x[0], x[1].index)
    ):
        term_ctxs.setdefault(term, QueryTermCtx(term, [])).instances.append(
            inst
        )

    per_index: Dict[int, list] = {}
    for term, inst in instances:
        flags = 0 if disregard_token_flags else inst.flags
        per_index.setdefault(inst.index, []).append(
            QueryIndexTerm(term, flags, inst.to_next_span)
        )
    query_index_terms = {
        idx: tuple(
            sorted(
                set(lst),
                key=lambda q: (q.term, q.to_next_span, q.flags),
            )
        )
        for idx, lst in per_index.items()
    }
    return term_ctxs, query_index_terms


@dataclass
class MatchedDocument:
    """matches.h:117-130 matched_document. query_index_terms /term_ctxs are
    the shared per-query proximity context (matches.h:27-32) — per query
    index, the unique (term, flags, toNextSpan) triples that may match
    there — so applications can implement the reference's
    sequence/proximity scoring from callback data alone."""

    doc_id: int
    matched_terms: List[MatchedTerm]
    dws: "DocWordsSpace"
    query_index_terms: Dict[int, tuple] = field(default_factory=dict)
    term_ctxs: Dict[str, QueryTermCtx] = field(default_factory=dict)

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
            [gather_cols(freq[:, s, :], ki) for s in range(T)],
            axis=-1,
        ).astype(jnp.int32)
        po = jnp.stack(
            [gather_cols(offv[:, s, :], ki) for s in range(T)],
            axis=-1,
        )
        return ki, valid, cnt, pf, po

    from trinity_tpu.utils.aotcache import aot_jit

    return aot_jit(run, "_build_rich_fn", relaxed_tape, W, T, C, interpret)


def exec_rich(
    executor,
    query,
    on_match: Callable[[MatchedDocument], None],
    candidate_cap: Optional[int] = None,
    disregard_token_flags: bool = False,
    on_prepare: Optional[Callable[[dict], None]] = None,
    doc_filter: Optional[Callable[[int], bool]] = None,
    doc_set=None,
) -> int:
    """Default-mode execution: invokes on_match(MatchedDocument) for every
    matching document in ascending doc order (exec.cpp default mode).
    Returns the number of matches delivered.

    The per-query proximity context (query_index_terms) is built once and
    surfaced both through on_prepare (the MatchedIndexDocumentsFilter::
    prepare() analog, matches.h:139-147) and on every MatchedDocument.
    disregard_token_flags = ExecFlags::DisregardTokenFlagsForQueryIndicesTerms
    (exec.h:36-42): dedup per-index terms by (term, toNextSpan) and zero the
    flags.

    doc_filter(app_docid) -> True to disregard the document BEFORE it is
    materialized/evaluated — the IndexDocumentsFilter pre-veto
    (matches.h:198-201). doc_set: optional app docid array the query is
    ANDed against (VectorIDs, docset_iterators.cpp:415-452)."""
    if doc_set is not None:
        saved = executor._doc_set_masks(doc_set)
        try:
            return exec_rich(
                executor, query, on_match, candidate_cap,
                disregard_token_flags, on_prepare, doc_filter,
            )
        finally:
            executor._restore_masks(saved)
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
    term_ctxs, qit = collect_query_index_terms(root, disregard_token_flags)
    if on_prepare is not None:
        on_prepare(qit)
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

    # host materialization, BULK: the reference materializes hits per
    # document inside the exec loop (queryexec_ctx.cpp:317-351); a Python
    # per-candidate loop over PositionsView slices was O(matches) numpy
    # calls, so instead every surviving candidate's positions/payloads
    # decode in ONE vectorized gather, and the per-match loop only
    # assembles objects from pre-gathered arrays. Candidate order is
    # (window, in-window docid) ascending == global docid ascending, same
    # as the reference's forward iteration.
    from trinity_tpu.utils.bitpack import unpack_value_groups

    vw, vc = np.nonzero(valid)  # row-major -> ascending docid order
    if len(vw) == 0:
        return 0
    local = vw.astype(np.int64) * WINDOW_SIZE + ki[vw, vc]
    app = seg.doc_map[local].astype(np.int64)
    if doc_filter is not None:
        # pre-eval veto (matches.h:198-201), BEFORE any materialization
        keep = np.fromiter(
            (not doc_filter(int(a)) for a in app), bool, len(app)
        )
        vw, vc, app = vw[keep], vc[keep], app[keep]
        if len(vw) == 0:
            return 0
    Tn = plan.n_slots
    fr = pf[vw[:, None], vc[:, None], np.arange(Tn)[None, :]].astype(
        np.int64
    ).ravel()  # (M*Tn,) per-candidate per-slot freqs
    orv = po[vw[:, None], vc[:, None], np.arange(Tn)[None, :]].astype(
        np.int64
    ).ravel()
    tot = int(fr.sum())
    bounds = np.zeros(len(fr) + 1, np.int64)
    np.cumsum(fr, out=bounds[1:])
    flat_idx = np.repeat(orv, fr) + (
        np.arange(tot, dtype=np.int64) - np.repeat(bounds[:-1], fr)
    )
    allpos = unpack_value_groups(seg.hit_planes, seg.hit_group_off, flat_idx)
    payloads = seg.payloads
    allpay = payloads[flat_idx] if payloads is not None else None

    # exact re-evaluation is only needed when the device mask was RELAXED
    # (phrase -> member conjunction superset); for phrase-free queries the
    # device mask is already exact (engine-vs-oracle parity tests)
    need_exact = plan.has_phrase

    class _NullScorer(Scorer):
        def __init__(self):
            self.model = Trivial

        def weight(self, terms):
            return 0.0

    sc = _NullScorer()
    weights_cache: dict = {}
    delivered = 0
    texts = plan.term_texts
    for m in range(len(vw)):
        base = m * Tn
        doc_terms: Dict[str, List[int]] = {}
        slot_of: Dict[str, int] = {}
        for s in range(Tn):
            f = int(fr[base + s])
            if f > 0:
                b0 = int(bounds[base + s])
                doc_terms[texts[s]] = allpos[b0 : b0 + f].tolist()
                slot_of[texts[s]] = base + s
        if need_exact:
            matched, _ = _eval(root, doc_terms, sc, weights_cache)
            if not matched:
                continue  # relaxed candidate failing the exact phrase check
        dws = DocWordsSpace()
        pos_map = dws._pos
        mts = []
        for text, pos_list in doc_terms.items():
            for p in pos_list:
                pos_map[p] = text
            if allpay is not None:
                b0 = int(bounds[slot_of[text]])
                hits = [
                    TermHit(
                        p,
                        int(allpay["val"][b0 + i]),
                        int(allpay["len"][b0 + i]),
                    )
                    for i, p in enumerate(pos_list)
                ]
            else:
                hits = [TermHit(p) for p in pos_list]
            mts.append(
                MatchedTerm(term=text, freq=len(pos_list), hits=hits)
            )
        md = MatchedDocument(
            doc_id=int(app[m]),
            matched_terms=mts,
            dws=dws,
            query_index_terms=qit,
            term_ctxs=term_ctxs,
        )
        try:
            on_match(md)
        except AbortSearch:
            return delivered
        delivered += 1
    return delivered
