"""Percolator: reverse search — match streaming documents against
registered queries.

The analog of percolator.{h,cpp}: the reference compiles a query once into
exec nodes with percolator-local term ids (percolator.h:21-44) and walks the
node tree per document, calling the application proxy's
match_term/match_phrase (percolator.cpp:9-137). Twitter's predicate-index
idea (percolator.h:1-3).

TPU-native design: thousands of registered queries are the batch axis.
Each query's plan tape is lowered to a fixed-width **postfix (RPN) program**
over a uniform opcode set; all programs evaluate data-parallel with one
`lax.scan` over instruction slots, vmapped over queries, against a dense
document x term incidence matrix. Every opcode has static stack movement
(MatchSome is lowered to chained ADD + GE-const), so the whole registered
query set is ONE compiled XLA program regardless of query shapes — the
moral equivalent of group_execnodes flattening (compilation_ctx.cpp:1760-1837)
taken to its SIMD conclusion.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from trinity_tpu.plan.compile import compile_plan
from trinity_tpu.query.parser import Query, parse_query

# opcodes (arg meaning in parens)
OP_NOP = 0
OP_PUSH_FALSE = 1
OP_PUSH_TRUE = 2
OP_PUSH_TERM = 3  # (term slot)
OP_PUSH_PHRASE = 4  # (phrase id)
OP_AND = 5
OP_OR = 6
OP_ANDNOT = 7  # lhs NOT rhs
OP_UNOT = 8
OP_OPT = 9  # ConstTrueExpr: pop, push true
OP_ADD = 10  # integer add of top two (MatchSome lowering)
OP_GE = 11  # (min): top = top >= min


def _lower_rpn(tape, code: List[Tuple[int, int]], phrases: List[tuple]):
    """Plan tape -> postfix code with static stack movement per op."""
    kind = tape[0]
    if kind == "tok":
        code.append((OP_PUSH_TERM, tape[1]))
    elif kind == "phrase":
        pid = len(phrases)
        phrases.append(tape[1])
        code.append((OP_PUSH_PHRASE, pid))
    elif kind == "and":
        _lower_rpn(tape[1], code, phrases)
        _lower_rpn(tape[2], code, phrases)
        code.append((OP_AND, 0))
    elif kind == "or":
        _lower_rpn(tape[1], code, phrases)
        _lower_rpn(tape[2], code, phrases)
        code.append((OP_OR, 0))
    elif kind == "not":
        _lower_rpn(tape[1], code, phrases)
        _lower_rpn(tape[2], code, phrases)
        code.append((OP_ANDNOT, 0))
    elif kind == "unot":
        _lower_rpn(tape[1], code, phrases)
        code.append((OP_UNOT, 0))
    elif kind == "opt":
        _lower_rpn(tape[1], code, phrases)
        code.append((OP_OPT, 0))
    elif kind == "some":
        _, kmin, children = tape
        for i, c in enumerate(children):
            _lower_rpn(c, code, phrases)
            # children push 0/1; fold into a running count
            if i > 0:
                code.append((OP_ADD, 0))
        code.append((OP_GE, kmin))
    elif kind == "false":
        code.append((OP_PUSH_FALSE, 0))
    else:
        raise ValueError(kind)


def _phrase_match(token_positions: Dict[str, List[int]], terms: Sequence[str]) -> bool:
    """Default match_phrase: exact adjacency (percolator_document_proxy
    analog; the app can pre-supply richer semantics via incidence rows)."""
    if any(t not in token_positions for t in terms):
        return False
    rest = [set(token_positions[t]) for t in terms[1:]]
    return any(
        all(p + i + 1 in s for i, s in enumerate(rest))
        for p in token_positions[terms[0]]
    )


@dataclass
class _Registered:
    code: List[Tuple[int, int]]
    term_slots: List[int]  # global percolator term ids per plan slot
    phrase_terms: List[Tuple[str, ...]]  # phrase id -> member terms


class Percolator:
    """Register queries once, match documents forever (percolator.h:63-85)."""

    def __init__(self):
        self._vocab: Dict[str, int] = {}
        self._queries: List[Optional[_Registered]] = []
        self._device_state = None  # invalidated on register
        self._ops_dev = None  # staged device copy of the packed programs

    # ---------------------------------------------------------- register
    def _term_id(self, text: str) -> int:
        tid = self._vocab.get(text)
        if tid is None:
            tid = len(self._vocab)
            self._vocab[text] = tid
        return tid

    def register(self, query) -> int:
        """Compile once; returns query id. Null queries register as
        never-matching (reference: percolator_query on empty query)."""
        if isinstance(query, str):
            query = parse_query(query)
        root = query.root if isinstance(query, Query) else query
        self._device_state = None
        self._ops_dev = None
        qid = len(self._queries)
        if root is None:
            self._queries.append(None)
            return qid
        plan = compile_plan(root)
        code: List[Tuple[int, int]] = []
        phrases: List[tuple] = []
        _lower_rpn(plan.tape, code, phrases)
        # plan slots -> global percolator term ids
        term_slots = [self._term_id(t) for t in plan.term_texts]
        phrase_terms = [
            tuple(plan.term_texts[s] for s in slots) for slots in phrases
        ]
        self._queries.append(_Registered(code, term_slots, phrase_terms))
        return qid

    @property
    def n_queries(self) -> int:
        return len(self._queries)

    # ------------------------------------------------------------- state
    def _pack(self):
        """Pack registered programs into dense arrays for device eval,
        including the unique-phrase table and PUSH_PHRASE arg rewrite —
        computed ONCE per registration epoch, not per match_batch call."""
        if self._device_state is not None:
            return self._device_state
        n = len(self._queries)
        max_ops = max((len(q.code) for q in self._queries if q), default=1)
        ops = np.zeros((n, max_ops, 2), np.int32)
        ph_index: Dict[Tuple[str, ...], int] = {}
        uniq_phrases: List[Tuple[str, ...]] = []
        for qi, q in enumerate(self._queries):
            if q is None:
                ops[qi, 0] = (OP_PUSH_FALSE, 0)
                continue
            for i, (op, arg) in enumerate(q.code):
                if op == OP_PUSH_TERM:
                    arg = q.term_slots[arg]  # global term id
                elif op == OP_PUSH_PHRASE:
                    terms = q.phrase_terms[arg]
                    pid = ph_index.get(terms)
                    if pid is None:
                        pid = len(uniq_phrases)
                        ph_index[terms] = pid
                        uniq_phrases.append(terms)
                    arg = pid
                ops[qi, i] = (op, arg)
        self._device_state = (ops, tuple(uniq_phrases))
        return self._device_state

    # -------------------------------------------------------------- match
    def match(self, tokens: Sequence[str], first_pos: int = 1) -> List[int]:
        """Single document -> sorted matching query ids (pq.match analog,
        percolator.cpp:5-7)."""
        return [
            qid
            for qid, hit in enumerate(self.match_batch([list(tokens)], first_pos)[0])
            if hit
        ]

    def match_batch(
        self, docs: Sequence[Sequence[str]], first_pos: int = 1
    ) -> np.ndarray:
        """Batch documents x registered queries -> bool (n_docs, n_queries).

        Incidence construction is host-side but fully vectorized: one
        np.unique interning pass builds the (doc, term) incidence, and
        phrase incidence is a sorted-key membership test over packed
        (doc, term, position) keys — all phrase occurrences across all docs
        verify in one searchsorted per member (replacing the per-(doc,
        phrase) Python adjacency loops). The boolean program evaluation is
        one jitted device scan over all queries and documents.
        """
        ops, uniq_phrases = self._pack()
        incidence, ph_inc = self.build_incidence(docs, uniq_phrases, first_pos)
        return _eval_finalize(
            *_eval_dispatch(ops, incidence, ph_inc, self._ops_device())
        )

    def match_stream(self, doc_batches, first_pos: int = 1):
        """Streaming match: yields one (n_docs, n_queries) bool array per
        input batch, in order, overlapping the HOST incidence construction
        of batch k+1 with the DEVICE evaluation of batch k (JAX async
        dispatch). This is the production serving shape — the reference
        percolator is likewise stream-oriented (percolator.h:63-85)."""
        ops, uniq_phrases = self._pack()
        pending = None
        for docs in doc_batches:
            incidence, ph_inc = self.build_incidence(docs, uniq_phrases, first_pos)
            nxt = _eval_dispatch(ops, incidence, ph_inc, self._ops_device())
            if pending is not None:
                yield _eval_finalize(*pending)
            pending = nxt
        if pending is not None:
            yield _eval_finalize(*pending)

    def _ops_device(self):
        """Packed programs staged to the device once per registration epoch
        (they are query-set state, not per-batch data — re-uploading 5000
        programs per batch was a measurable slice of the tunnel bill)."""
        if self._ops_dev is None:
            import jax.numpy as jnp

            self._ops_dev = jnp.asarray(self._pack()[0])
        return self._ops_dev

    def build_incidence(
        self, docs, uniq_phrases, first_pos: int = 1
    ) -> tuple:
        """Host incidence construction (shared by match_batch and the perf
        tool's host denominator, tools/measure_percolator.py, so both sides
        are charged the identical preprocessing cost)."""
        n_docs = len(docs)
        n_terms = max(1, len(self._vocab))
        docs = [list(toks) for toks in docs]
        lens = np.array([len(t) for t in docs], np.int64)
        flat = [t for toks in docs for t in toks]
        incidence = np.zeros((n_docs, n_terms), bool)
        ph_inc = np.zeros((n_docs, max(1, len(uniq_phrases))), bool)
        if flat:
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            bounds = np.zeros(n_docs + 1, np.int64)
            np.cumsum(lens, out=bounds[1:])
            pos_of = (
                np.arange(len(flat), dtype=np.int64)
                - np.repeat(bounds[:-1], lens)
                + first_pos
            )
            uniq, inv = np.unique(
                np.asarray(flat, dtype=object), return_inverse=True
            )
            tid_of_uniq = np.array(
                [self._vocab.get(t, -1) for t in uniq.tolist()], np.int64
            )
            tid_of = tid_of_uniq[inv]
            keep = tid_of >= 0
            incidence[doc_of[keep], tid_of[keep]] = True
            if uniq_phrases:
                # packed keys: doc (22 bits) | term (21) | position (21)
                if (
                    n_docs >= (1 << 22)
                    or n_terms >= (1 << 21)
                    or (first_pos + int(lens.max(initial=0))) >= (1 << 21)
                ):
                    raise ValueError(
                        "percolator batch exceeds packed-key bounds "
                        "(docs < 2^22, terms < 2^21, positions < 2^21)"
                    )
                d_k, t_k, p_k = doc_of[keep], tid_of[keep], pos_of[keep]
                keys = np.sort((d_k << 42) | (t_k << 21) | p_k)
                if not len(keys):
                    uniq_phrases = ()
                # Vectorized ACROSS phrases (a per-phrase Python loop was the
                # host bottleneck at predicate-index scale: ~5k unique
                # phrases x searchsorted each = ~1 s/batch at 50k registered
                # queries). One candidate row per (phrase, first-member
                # occurrence), built by grouped-range expansion over the
                # term-sorted occurrence table; then ONE searchsorted probe
                # pass per member index (max phrase length passes total).
                n_ph = len(uniq_phrases)
                if n_ph:
                    maxlen = max(len(t) for t in uniq_phrases)
                    tids_mat = np.full((n_ph, maxlen), -1, np.int64)
                    lens_ph = np.zeros(n_ph, np.int64)
                    for pi, terms in enumerate(uniq_phrases):
                        lens_ph[pi] = len(terms)
                        for i, t in enumerate(terms):
                            tids_mat[pi, i] = self._vocab.get(t, -1)
                    # a member never registered -> phrase can never match
                    valid = (tids_mat >= 0) | (
                        np.arange(maxlen)[None, :] >= lens_ph[:, None]
                    )
                    valid = valid.all(axis=1)
                    order = np.argsort(t_k, kind="stable")
                    t_s, d_s, p_s = t_k[order], d_k[order], p_k[order]
                    first = np.where(valid, tids_mat[:, 0], -1)
                    lo = np.searchsorted(t_s, first, "left")
                    hi = np.searchsorted(t_s, first, "right")
                    cnt = np.where(valid, hi - lo, 0)
                    total = int(cnt.sum())
                    if total:
                        pid_rep = np.repeat(np.arange(n_ph), cnt)
                        starts = np.cumsum(cnt) - cnt
                        occ = (
                            np.arange(total)
                            - np.repeat(starts, cnt)
                            + np.repeat(lo, cnt)
                        )
                        d0, p0 = d_s[occ], p_s[occ]
                        ok = np.ones(total, bool)
                        for i in range(1, maxlen):
                            active = lens_ph[pid_rep] > i
                            pk = p0 + i
                            # probes past the 21-bit position field would
                            # alias into the term bits and could
                            # false-positive against a real key; no true
                            # position lives there (bounds check above)
                            in_field = pk < (1 << 21)
                            tk = (
                                (d0 << 42)
                                | (np.maximum(tids_mat[pid_rep, i], 0) << 21)
                                | np.where(in_field, pk, 0)
                            )
                            idx = np.searchsorted(keys, tk)
                            idx_c = np.minimum(idx, len(keys) - 1)
                            found = in_field & (keys[idx_c] == tk)
                            ok &= np.where(active, found, True)
                        ph_inc[d0[ok], pid_rep[ok]] = True
        return incidence, ph_inc

    def match_ids_for_corpus(self, docs):
        """Convenience for tests: {qid: [doc indices]}."""
        m = self.match_batch(docs)
        return {q: list(np.flatnonzero(m[:, q])) for q in range(m.shape[1])}


@functools.lru_cache(maxsize=64)
def _eval_fn(max_ops: int, stack_depth: int, n_terms: int, n_phrases: int):
    import jax
    import jax.numpy as jnp

    def run(ops, inc_packed, ph_packed):
        # incidence arrives bit-packed along the term axis (host np.packbits,
        # bitorder='little') — 8x less tunnel upload; unpack with shifts.
        d = inc_packed.shape[0]

        def unpack(bits_u8, n):
            b = bits_u8.astype(jnp.int32)[:, :, None]  # (D, T/8, 1)
            b = (b >> jnp.arange(8, dtype=jnp.int32)) & 1
            return b.reshape(d, -1)[:, :n]  # (D, n)

        inc_i = unpack(inc_packed, n_terms)
        ph_i = unpack(ph_packed, n_phrases)
        # Hoist every PUSH_TERM / PUSH_PHRASE operand OUT of the per-step
        # switch: one row gather over the combined [terms | phrases]
        # incidence (row gathers are the cheap gather on TPU), indexed by
        # (query, op slot), fed to the scan as xs. Inside a vmapped
        # lax.switch a batched jnp.take broadcasts its operand across the
        # query axis — measured OOM at (5000 q, 512 docs, 1789 terms):
        # an 18.3 GB s32 broadcast. This keeps the gather un-vmapped.
        op_all, arg_all = ops[..., 0], ops[..., 1]
        push_id = jnp.where(
            op_all == OP_PUSH_TERM,
            arg_all,
            jnp.where(op_all == OP_PUSH_PHRASE, arg_all + n_terms, 0),
        )
        combined_t = jnp.concatenate([inc_i, ph_i], axis=1).T  # (T+P, D)
        # MATERIALIZE before gathering: without the barrier XLA fuses the
        # bit-unpack + transpose INTO the gather, degrading a (1, D) row
        # gather (fast) into a strided element gather (~7 ns/element —
        # measured 768 ms for the 5000x9x2048 push table, which is exactly
        # 92M elements at element-gather speed).
        combined_t = jax.lax.optimization_barrier(combined_t)
        pushes = combined_t[push_id]  # (N, max_ops, D)

        # Shift-stack evaluation: the stack is (D, S) with the TOP at
        # column 0; push = prepend + drop last, pop2+push = replace the top
        # two with one, pop1+push = replace the top — ALL static slices and
        # concats. The earlier design indexed the stack at a per-query
        # stack-pointer with dynamic_update_slice; under vmap that lowers to
        # an XLA scatter, which TPU serializes (measured 1300 ms/batch at
        # 5000 q x 512 docs — the scatter, not the boolean work, was the
        # entire bill). Every opcode moves the stack by a static amount, so
        # the per-step state transition is: (1) compute 12 candidate new
        # TOP rows (cheap, (D,) each), (2) row-gather the real one by
        # opcode, (3) 3-way select of the statically-shifted rest.
        shift_tab = jnp.array(
            [0, 1, 1, 1, 1, -1, -1, -1, 0, 0, -1, 0], jnp.int32
        )  # NOP FALSE TRUE TERM PHRASE AND OR ANDNOT UNOT OPT ADD GE

        def step(stack, xs):
            op_arg, push_row = xs
            op = op_arg[0]
            arg = op_arg[1]
            t0 = stack[:, 0]  # top (pushed second)
            t1 = stack[:, 1]  # under top (pushed first)
            as_i = lambda x: x.astype(jnp.int32)
            zeros = jnp.zeros((d,), jnp.int32)
            ones = jnp.ones((d,), jnp.int32)
            cands = [
                t0,  # NOP
                zeros,  # FALSE
                ones,  # TRUE
                push_row,  # TERM (pre-gathered)
                push_row,  # PHRASE (pre-gathered)
                as_i((t1 > 0) & (t0 > 0)),  # AND
                as_i((t1 > 0) | (t0 > 0)),  # OR
                as_i((t1 > 0) & (t0 == 0)),  # ANDNOT
                as_i(t0 == 0),  # UNOT
                ones,  # OPT
                t1 + t0,  # ADD
                as_i(t0 >= arg),  # GE
            ]
            # where-chain, not a stacked gather: elementwise selects are
            # effectively free on the VPU; an indexed pick under vmap risks
            # another degenerate-gather lowering
            new_top = cands[0]
            for code in range(1, len(cands)):
                new_top = jnp.where(op == code, cands[code], new_top)
            shift = shift_tab[op]
            rest = jnp.where(
                shift == 1,
                stack[:, :-1],  # push: old stack slides down
                jnp.where(
                    shift == -1,
                    # pop2+push: drop top two, backfill a zero column
                    jnp.concatenate(
                        [stack[:, 2:], jnp.zeros((d, 1), jnp.int32)], axis=1
                    ),
                    stack[:, 1:],  # replace-top / NOP
                ),
            )
            return jnp.concatenate([new_top[:, None], rest], axis=1), None

        def per_query(code, push_rows):
            stack0 = jnp.zeros((d, stack_depth), jnp.int32)
            stack, _ = jax.lax.scan(step, stack0, (code, push_rows))
            return stack[:, 0] > 0

        res = jax.vmap(per_query)(ops, pushes)  # (N, D) bool
        # pack the result bits along the query axis (8x less tunnel fetch);
        # host side unpacks with np.unpackbits(bitorder='little')
        n = res.shape[0]
        n_pad = -(-n // 8) * 8
        r = res.T.astype(jnp.int32)  # (D, N)
        if n_pad != n:
            r = jnp.concatenate(
                [r, jnp.zeros((d, n_pad - n), jnp.int32)], axis=1
            )
        packed = (
            (r.reshape(d, n_pad // 8, 8) << jnp.arange(8, dtype=jnp.int32))
            .sum(axis=-1)
            .astype(jnp.uint8)
        )
        return packed  # (D, ceil(N/8)) u8

    from trinity_tpu.utils.aotcache import aot_jit

    return aot_jit(run, "_eval_fn", max_ops, stack_depth, n_terms, n_phrases)


# device-memory budget for the per-chunk push table / stack carry
# (patchable in tests to force the chunked path on tiny corpora).
# 256 MB measured best end-to-end: async dispatch keeps several chunks'
# push tables + scan intermediates live at once, and 1 GB chunks at 50k
# queries x 2048 docs degraded p50 ~2x (HBM pressure), while the
# per-chunk dispatch tax is already amortized at this size.
_CHUNK_BUDGET_BYTES = 256 << 20


def _static_stack_depth(ops: np.ndarray) -> int:
    """Exact max stack depth across programs — every opcode has static
    stack movement, so this is a host-side prefix-max, not max_ops+1
    (which scaled the vmapped carry as (N, D, max_ops+1))."""
    op = ops[..., 0]
    delta = np.zeros_like(op)
    delta[np.isin(op, (OP_PUSH_FALSE, OP_PUSH_TRUE, OP_PUSH_TERM, OP_PUSH_PHRASE))] = 1
    delta[np.isin(op, (OP_AND, OP_OR, OP_ANDNOT, OP_ADD))] = -1
    # >= 2: the shift-stack step statically reads stack[:, 1] (pop2 ops)
    return max(2, int(np.cumsum(delta, axis=1).max(initial=1)))


def _eval_dispatch(
    ops: np.ndarray,
    incidence: np.ndarray,
    ph_inc: np.ndarray,
    ops_dev=None,
):
    """Stage inputs (bit-packed along the term axis) and dispatch the device
    eval WITHOUT blocking — JAX's async dispatch returns futures, so a
    caller can do host work (the next batch's incidence) while the device
    runs. Returns (pending chunk list, n_q) for `_eval_finalize`."""
    import jax.numpy as jnp

    max_ops = ops.shape[1]
    depth = _static_stack_depth(ops)
    n_q, n_docs = ops.shape[0], incidence.shape[0]
    fn = _eval_fn(max_ops, depth, incidence.shape[1], ph_inc.shape[1])
    inc_p = jnp.asarray(np.packbits(incidence, axis=1, bitorder="little"))
    ph_p = jnp.asarray(np.packbits(ph_inc, axis=1, bitorder="little"))
    # bound device memory: the pre-gathered push table is
    # (chunk, max_ops, n_docs) i32 and the vmapped stack carry
    # (chunk, n_docs, depth) i32 — chunk the QUERY axis so the larger
    # stays under ~256 MB (one program per (chunk, ...) shape; the tail
    # chunk pads up to the chunk size so it reuses the same program).
    per_q = 4 * n_docs * max(max_ops, depth)
    chunk = max(256, min(n_q, _CHUNK_BUDGET_BYTES // max(1, per_q)))
    if n_q <= chunk:
        dev = ops_dev if ops_dev is not None else jnp.asarray(ops)
        return [fn(dev, inc_p, ph_p)], n_q
    outs = []
    for s in range(0, n_q, chunk):
        part = ops[s : s + chunk]
        if part.shape[0] < chunk:  # pad; extra programs are NOPs -> False
            pad = np.zeros((chunk - part.shape[0],) + ops.shape[1:], ops.dtype)
            part = np.concatenate([part, pad])
        outs.append(fn(jnp.asarray(part), inc_p, ph_p))
    return outs, n_q


def _eval_finalize(pending, n_q: int) -> np.ndarray:
    """Fetch + unpack the dispatched chunks -> (n_docs, n_q) bool."""
    chunks = []
    done = 0
    for arr in pending:
        bits = np.unpackbits(np.asarray(arr), axis=1, bitorder="little")
        take = min(bits.shape[1], n_q - done)
        chunks.append(bits[:, :take].astype(bool))
        done += take
    return chunks[0] if len(chunks) == 1 else np.concatenate(chunks, axis=1)


def _eval_programs(ops: np.ndarray, incidence: np.ndarray, ph_inc: np.ndarray):
    return _eval_finalize(*_eval_dispatch(ops, incidence, ph_inc))
