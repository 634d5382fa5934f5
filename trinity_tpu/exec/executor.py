"""Query executor: dense tiled evaluation of a compiled plan on one segment.

The TPU replacement for the reference's execution engine
(exec.cpp:509 exec_query, docset_iterators.cpp, docset_spans.cpp):

  parse/normalize (host) -> compile_plan (host) -> cell tables via skip-array
  searchsorted (host numpy, the skiplist-seek analog) -> ONE jitted XLA
  program per plan shape:
    stage 1: Pallas freq-tile materialization (ops/postings.py)
    stage 2: tape evaluation as dense tile algebra — the vectorization of
       the per-window (score, count) trackers of docset_spans.cpp:681-789 —
       fused with similarity scoring and per-window top-k, then a global
       top-k merge.

Exec modes mirror ExecFlags (exec.h:11-43): AccumulatedScoreScheme is
`search()`; DocumentsOnly is `match_ids()`. Ranking is deterministic:
score desc, local docid asc — `lax.top_k` breaks ties toward lower indices
and tiles flatten in docid order, so the tie-break falls out of the layout.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from trinity_tpu.index.format import SegmentData
from trinity_tpu.limits import WINDOW_SIZE
from trinity_tpu.models.similarity import SIMILARITIES
from trinity_tpu.plan.compile import CompiledPlan, compile_plan
from trinity_tpu.query.parser import Query, parse_query

NEG_INF = float("-inf")


class ExecFlags(enum.IntFlag):
    """exec.h:11-43."""

    NONE = 0
    DOCUMENTS_ONLY = 1
    ACCUMULATED_SCORE_SCHEME = 2
    DISREGARD_TOKEN_FLAGS = 4


@dataclass
class SearchResult:
    doc_id: int  # application doc id (translated via doc_map)
    score: float


def _lazy_jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# --------------------------------------------------------------------------
# stage 2: tape evaluation over (W, WINDOW_SIZE) flattened tiles
# --------------------------------------------------------------------------
def _eval_tape(tape, freq, weights, scorer_cls, jnp):
    """freq: f32 (W, T, N). Returns (mask bool (W,N), score f32 (W,N)).

    Mirrors oracle._eval semantics exactly: score contributions only from
    matching subtrees, f32 accumulation in tree order.
    """
    kind = tape[0]
    if kind == "tok":
        _, slot, widx = tape
        f = freq[:, slot, :]
        mask = f > 0
        score = scorer_cls.score_tile(f, weights[widx])
        return mask, jnp.where(mask, score, 0.0)
    if kind == "phrase":
        raise NotImplementedError("phrase evaluation lands with ops/phrase")
    if kind in ("and", "or", "not"):
        _, lt, rt = tape
        lm, ls = _eval_tape(lt, freq, weights, scorer_cls, jnp)
        rm, rs = _eval_tape(rt, freq, weights, scorer_cls, jnp)
        if kind == "and":
            m = lm & rm
            return m, jnp.where(m, ls + rs, 0.0)
        if kind == "or":
            m = lm | rm
            return m, jnp.where(m, ls + rs, 0.0)
        m = lm & ~rm
        return m, jnp.where(m, ls, 0.0)
    if kind == "unot":
        cm, _ = _eval_tape(tape[1], freq, weights, scorer_cls, jnp)
        return ~cm, jnp.zeros_like(freq[:, 0, :])
    if kind == "opt":
        cm, cs = _eval_tape(tape[1], freq, weights, scorer_cls, jnp)
        return jnp.ones_like(cm) | cm, jnp.where(cm, cs, 0.0)
    if kind == "some":
        _, kmin, children = tape
        cnt = None
        tot = None
        for c in children:
            cm, cs = _eval_tape(c, freq, weights, scorer_cls, jnp)
            ci = cm.astype(jnp.int32)
            cnt = ci if cnt is None else cnt + ci
            tot = cs if tot is None else tot + cs
        m = cnt >= kmin
        return m, jnp.where(m, tot, 0.0)
    if kind == "false":
        z = jnp.zeros_like(freq[:, 0, :])
        return z > 1, z
    raise ValueError(kind)


@functools.lru_cache(maxsize=512)
def _build_search_fn(tape, scorer_name, W, T, k, interpret, mode):
    """One compiled XLA program per (plan shape, scorer, geometry, mode)."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.postings import materialize_freq_tiles

    scorer_cls = SIMILARITIES[scorer_name]

    def run(bmeta, planes, cell_start, cell_nblocks, weights, n_docs, deleted):
        tiles = materialize_freq_tiles(
            bmeta,
            planes,
            cell_start,
            cell_nblocks,
            n_windows=W,
            n_terms=T,
            interpret=interpret,
        )
        freq = tiles.reshape(W, T, WINDOW_SIZE)
        mask, score = _eval_tape(tape, freq, weights, scorer_cls, jnp)
        gid = (
            jnp.arange(W, dtype=jnp.int32)[:, None] * WINDOW_SIZE
            + jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
        )
        mask = mask & (gid < n_docs)
        if deleted is not None:
            mask = mask & ~deleted.reshape(W, WINDOW_SIZE)
        if mode == "docs":
            return mask
        scores = jnp.where(mask, score, NEG_INF)
        pv, pi = jax.lax.top_k(scores, k)  # (W, k); ties -> lower docid
        cand_v = pv.reshape(-1)
        cand_i = (pi + jnp.arange(W, dtype=jnp.int32)[:, None] * WINDOW_SIZE).reshape(
            -1
        )
        gv, gidx = jax.lax.top_k(cand_v, k)
        return gv, cand_i[gidx]

    return jax.jit(run, static_argnames=())


class Executor:
    """Per-segment search session (the IndexSource + exec_query analog).

    Device-resident state: packed plane matrix + block metadata uploaded
    once (the mmap'd-segment analog, segment_index_source.cpp:5-186).
    """

    def __init__(self, seg: SegmentData, interpret: Optional[bool] = None):
        jax, jnp = _lazy_jax()
        from trinity_tpu.ops.postings import pack_block_meta, pad_planes

        self.seg = seg
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.bmeta = jnp.asarray(pack_block_meta(seg))
        self.planes = jnp.asarray(pad_planes(seg.planes))
        self._deleted = None  # optional bool (W*WINDOW,) mask of masked docs

    # ------------------------------------------------------------ plumbing
    def set_masked_local_docs(self, local_ids: Optional[np.ndarray]):
        """Install a masked-documents registry for this source
        (masked_documents_registry analog, docidupdates.h:90-191): local ids
        whose documents are shadowed by newer segments."""
        _, jnp = _lazy_jax()
        if local_ids is None or len(local_ids) == 0:
            self._deleted = None
            return
        W = self.seg.n_windows
        m = np.zeros(W * WINDOW_SIZE, bool)
        m[local_ids] = True
        self._deleted = jnp.asarray(m)

    def _prepare(self, query, scorer, stats=None, df_of=None):
        """Resolve terms, compute cells and weights. stats/df_of allow
        collection-level aggregation (similarity.h:146-158,209-217)."""
        from trinity_tpu.ops.postings import compute_cells

        jax, jnp = _lazy_jax()
        if isinstance(query, str):
            query = parse_query(query)
        if isinstance(query, Query):
            root = query.root
        else:
            root = query
        if root is None:
            return None
        plan = compile_plan(root)
        seg = self.seg
        tids = [seg.term_id(t) for t in plan.term_texts]
        cell_start, cell_nblocks = compute_cells(seg, tids)
        docs_cnt = stats.docs_cnt if stats else seg.stats.docs_cnt
        if df_of is None:
            df_of = lambda t: (
                int(seg.term_df[seg.term_id(t)]) if seg.term_id(t) >= 0 else 0
            )
        model = SIMILARITIES[scorer]
        weights = np.array(
            [
                model.weight([df_of(t) for t in terms], docs_cnt)
                for terms in plan.weight_terms
            ],
            dtype=np.float32,
        )
        return (
            plan,
            jnp.asarray(cell_start),
            jnp.asarray(cell_nblocks),
            jnp.asarray(weights),
        )

    # -------------------------------------------------------------- search
    def search(
        self,
        query,
        k: int = 10,
        scorer: str = "bm25",
        stats=None,
        df_of=None,
    ) -> List[SearchResult]:
        """AccumulatedScoreScheme execution (exec.h:25-34): ranked top-k."""
        prep = self._prepare(query, scorer, stats, df_of)
        if prep is None:
            return []
        plan, cs, cn, weights = prep
        seg = self.seg
        fn = _build_search_fn(
            plan.tape,
            scorer,
            seg.n_windows,
            plan.n_slots,
            k,
            self.interpret,
            "search",
        )
        gv, gi = fn(
            self.bmeta,
            self.planes,
            cs,
            cn,
            weights,
            np.int32(seg.n_docs),
            self._deleted,
        )
        gv = np.asarray(gv)
        gi = np.asarray(gi)
        out = []
        for v, i in zip(gv, gi):
            if v == NEG_INF:
                break
            out.append(SearchResult(int(seg.doc_map[i]), float(v)))
        return out

    def match_ids(self, query, scorer: str = "trivial") -> np.ndarray:
        """DocumentsOnly execution (exec.h:12-23): matching app doc ids asc."""
        prep = self._prepare(query, scorer)
        if prep is None:
            return np.zeros(0, np.uint32)
        plan, cs, cn, weights = prep
        seg = self.seg
        fn = _build_search_fn(
            plan.tape,
            scorer,
            seg.n_windows,
            plan.n_slots,
            0,
            self.interpret,
            "docs",
        )
        mask = np.asarray(
            fn(
                self.bmeta,
                self.planes,
                cs,
                cn,
                weights,
                np.int32(seg.n_docs),
                self._deleted,
            )
        )
        local = np.flatnonzero(mask.reshape(-1))
        return seg.doc_map[local]
