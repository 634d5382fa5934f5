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
        return np.asarray(_eval_programs(ops, incidence, ph_inc))

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
                for pi, terms in enumerate(uniq_phrases):
                    tids = [self._vocab.get(t, -1) for t in terms]
                    if any(t < 0 for t in tids):
                        continue  # a member never registered -> no match
                    sel = t_k == tids[0]
                    d0, p0 = d_k[sel], p_k[sel]
                    ok = np.ones(len(d0), bool)
                    for i in range(1, len(terms)):
                        pk = p0 + i
                        # probes past the 21-bit position field would alias
                        # into the term bits and could false-positive against
                        # a real (doc, term, pos) key; no true position can
                        # live there (the bounds check above), so mask them
                        in_field = pk < (1 << 21)
                        tk = (
                            (d0 << 42)
                            | (tids[i] << 21)
                            | np.where(in_field, pk, 0)
                        )
                        idx = np.searchsorted(keys, tk)
                        idx_c = np.minimum(idx, len(keys) - 1)
                        ok &= in_field & (keys[idx_c] == tk)
                    ph_inc[d0[ok], pi] = True
        return incidence, ph_inc

    def match_ids_for_corpus(self, docs):
        """Convenience for tests: {qid: [doc indices]}."""
        m = self.match_batch(docs)
        return {q: list(np.flatnonzero(m[:, q])) for q in range(m.shape[1])}


@functools.lru_cache(maxsize=64)
def _eval_fn(max_ops: int, stack_depth: int):
    import jax
    import jax.numpy as jnp

    def run(ops, incidence, ph_inc):
        d = incidence.shape[0]
        inc_i = incidence.astype(jnp.int32)
        ph_i = ph_inc.astype(jnp.int32)

        def step(carry, op_arg):
            stack, sp = carry  # stack (D, S) i32, sp scalar
            op = op_arg[0]
            arg = op_arg[1]

            def push(val):
                return (
                    jax.lax.dynamic_update_slice(stack, val[:, None], (0, sp)),
                    sp + 1,
                )

            def pop2_push(fn):
                a = jax.lax.dynamic_slice(stack, (0, sp - 2), (d, 1))[:, 0]
                b = jax.lax.dynamic_slice(stack, (0, sp - 1), (d, 1))[:, 0]
                return (
                    jax.lax.dynamic_update_slice(
                        stack, fn(a, b)[:, None], (0, sp - 2)
                    ),
                    sp - 1,
                )

            def pop1_push(fn):
                a = jax.lax.dynamic_slice(stack, (0, sp - 1), (d, 1))[:, 0]
                return (
                    jax.lax.dynamic_update_slice(
                        stack, fn(a)[:, None], (0, sp - 1)
                    ),
                    sp,
                )

            as_bool = lambda x: (x > 0).astype(jnp.int32)
            branches = [
                lambda: (stack, sp),  # NOP
                lambda: push(jnp.zeros((d,), jnp.int32)),  # FALSE
                lambda: push(jnp.ones((d,), jnp.int32)),  # TRUE
                lambda: push(jnp.take(inc_i, arg, axis=1)),  # TERM
                lambda: push(jnp.take(ph_i, arg, axis=1)),  # PHRASE
                lambda: pop2_push(
                    lambda a, b: ((a > 0) & (b > 0)).astype(jnp.int32)
                ),  # AND
                lambda: pop2_push(
                    lambda a, b: ((a > 0) | (b > 0)).astype(jnp.int32)
                ),  # OR
                lambda: pop2_push(
                    lambda a, b: ((a > 0) & (b == 0)).astype(jnp.int32)
                ),  # ANDNOT
                lambda: pop1_push(lambda a: (a == 0).astype(jnp.int32)),  # UNOT
                lambda: pop1_push(lambda a: jnp.ones_like(a)),  # OPT
                lambda: pop2_push(lambda a, b: a + b),  # ADD
                lambda: pop1_push(lambda a: (a >= arg).astype(jnp.int32)),  # GE
            ]
            new_stack, new_sp = jax.lax.switch(op, branches)
            return (new_stack, new_sp), None

        def per_query(code):
            stack0 = jnp.zeros((d, stack_depth), jnp.int32)
            (stack, _), _ = jax.lax.scan(step, (stack0, jnp.int32(0)), code)
            return stack[:, 0] > 0

        return jax.vmap(per_query)(ops).T  # (D, N)

    from trinity_tpu.utils.aotcache import aot_jit

    return aot_jit(run, "_eval_fn", max_ops, stack_depth)


def _eval_programs(ops: np.ndarray, incidence: np.ndarray, ph_inc: np.ndarray):
    import jax.numpy as jnp

    max_ops = ops.shape[1]
    # stack depth: worst case every op pushes
    fn = _eval_fn(max_ops, max_ops + 1)
    return fn(jnp.asarray(ops), jnp.asarray(incidence), jnp.asarray(ph_inc))
