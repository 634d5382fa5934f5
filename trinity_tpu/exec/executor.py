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
import threading
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from trinity_tpu.index.format import SegmentData
from trinity_tpu.limits import TILE, WINDOW_SIZE
from trinity_tpu.ops.select import gather_cols
from trinity_tpu.models.similarity import SIMILARITIES
from trinity_tpu.plan.compile import CompiledPlan, compile_plan
from trinity_tpu.query.parser import Query, parse_query
from trinity_tpu.utils.aotcache import aot_jit

NEG_INF = float("-inf")

# Candidate-capacity ladder for fused phrase programs: C is chosen from the
# per-window candidate BOUND (min member blocks * BLOCK_SIZE, known on host
# from the cell tables), so pass A can never overflow and the program runs
# without any host sync. Bucketing bounds compile variants per tape shape.
PHRASE_C_LADDER = (128, 512, 2048, 8192, 16384)


def _phrase_c_bound(cn_h, phrase_slots, col=None):
    """Upper bound on per-window phrase candidates from block counts.
    cn_h: (W, T*) host block-count table; col maps a slot to its column."""
    from trinity_tpu.limits import BLOCK_SIZE

    if col is None:
        col = lambda s: s
    bound = 0
    for slots in phrase_slots:
        per_w = np.min(
            np.stack([cn_h[:, col(s)] for s in slots]), axis=0
        ) * BLOCK_SIZE
        bound = max(bound, int(per_w.max(initial=0)))
    return min(bound, WINDOW_SIZE)


def _phrase_c_bucket(bound):
    for b in PHRASE_C_LADDER:
        if bound <= b:
            return min(b, WINDOW_SIZE)
    return WINDOW_SIZE


def _pad_T(t: int) -> int:
    """Pad the term axis to a bucket: the Pallas kernel is compiled per
    (W, n_terms), so bucketing bounds kernel variants across query shapes."""
    from trinity_tpu.config import get_config

    for b in get_config().term_buckets:
        if t <= b:
            return b
    return t


class ExecFlags(enum.IntFlag):
    """exec.h:11-43. DOCUMENTS_ONLY = match_ids(); ACCUMULATED_SCORE_SCHEME
    = search(); DISREGARD_TOKEN_FLAGS switches the rich-match
    query_index_terms dedup key (exec_rich(disregard_token_flags=True),
    exec/richmatch.py:collect_query_index_terms)."""

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


@functools.lru_cache(maxsize=1)
def _pos_dummy():
    """Stable placeholder for the posmask-cache operand of combined batch
    programs that contain no cache-reading posph entry."""
    jax, jnp = _lazy_jax()
    with jax.ensure_compile_time_eval():
        return jnp.zeros((1, 1, 1, 1, 1), jnp.int32)


@functools.lru_cache(maxsize=8192)
def _plan_for_text(qtext: str):
    """Parse + normalize + compile, cached by query text. The reference
    re-parses per call because C++ parsing is ~microseconds
    (exec.cpp:529-539); Python parsing measures ~175 us/query, so repeated
    query texts (hot queries in serving) hit this cache instead. The
    returned root/plan are treated as immutable by all engine paths."""
    q = parse_query(qtext)
    if q.root is None:
        return None, None
    return q.root, compile_plan(q.root)


# --------------------------------------------------------------------------
# stage 2: tape evaluation over (W, WINDOW_SIZE) flattened tiles
# --------------------------------------------------------------------------
def _eval_tape(tape, freq, weights, scorer_cls, jnp, phrase_tiles=None, _pc=None):
    """freq: f32 (..., T, N) with any leading batch dims. Returns
    (mask bool (..., N), score f32 (..., N)).

    Mirrors oracle._eval semantics exactly: score contributions only from
    matching subtrees, f32 accumulation in tree order. phrase_tiles holds
    verified phrase-frequency tiles (..., N) in collect_phrases order.
    weights: callable widx -> broadcastable weight, or a 1-D array.
    """
    if _pc is None:
        _pc = [0]
    wsel = weights if callable(weights) else (lambda i: weights[i])
    kind = tape[0]
    if kind == "tok":
        _, slot, widx = tape
        f = freq[..., slot, :]
        mask = f > 0
        score = scorer_cls.score_tile(f, wsel(widx))
        return mask, jnp.where(mask, score, 0.0)
    if kind == "phrase":
        _, slots, widx = tape
        pf = phrase_tiles[_pc[0]]
        _pc[0] += 1
        mask = pf > 0
        score = scorer_cls.score_tile(pf, wsel(widx))
        return mask, jnp.where(mask, score, 0.0)
    if kind in ("and", "or", "not"):
        _, lt, rt = tape
        lm, ls = _eval_tape(lt, freq, weights, scorer_cls, jnp, phrase_tiles, _pc)
        rm, rs = _eval_tape(rt, freq, weights, scorer_cls, jnp, phrase_tiles, _pc)
        if kind == "and":
            m = lm & rm
            return m, jnp.where(m, ls + rs, 0.0)
        if kind == "or":
            m = lm | rm
            return m, jnp.where(m, ls + rs, 0.0)
        m = lm & ~rm
        return m, jnp.where(m, ls, 0.0)
    if kind == "unot":
        cm, _ = _eval_tape(tape[1], freq, weights, scorer_cls, jnp, phrase_tiles, _pc)
        return ~cm, jnp.zeros_like(freq[..., 0, :])
    if kind == "opt":
        cm, cs = _eval_tape(tape[1], freq, weights, scorer_cls, jnp, phrase_tiles, _pc)
        return jnp.ones_like(cm) | cm, jnp.where(cm, cs, 0.0)
    if kind == "some":
        _, kmin, children = tape
        cnt = None
        tot = None
        for c in children:
            cm, cs = _eval_tape(c, freq, weights, scorer_cls, jnp, phrase_tiles, _pc)
            ci = cm.astype(jnp.int32)
            cnt = ci if cnt is None else cnt + ci
            tot = cs if tot is None else tot + cs
        m = cnt >= kmin
        return m, jnp.where(m, tot, 0.0)
    if kind == "false":
        z = jnp.zeros_like(freq[..., 0, :])
        return z > 1, z
    raise ValueError(kind)


# fused-path bound: tapes reading more slots fall back to the two-stage
# path (VMEM holds one decoded tile per used slot)
FUSED_MAX_SLOTS = 8


def _fused_used_slots(tape):
    """Used slots if the tape is fused-kernel eligible, else None."""
    from trinity_tpu.ops.fusedscore import tape_used_slots

    try:
        used = tape_used_slots(tape)
    except ValueError:  # phrase node
        return None
    if not (1 <= len(used) <= FUSED_MAX_SLOTS):
        return None
    return used


@functools.lru_cache(maxsize=512)
def _build_fused_fn(tape, scorer_name, W, T, B, k, interpret):
    """ONE Pallas program per (tape, geometry): decode + tape eval + score
    + window maxima fused (ops/fusedscore.py), then the two-phase exact
    top-k. Replaces stage1+stage2 for boolean tapes: one HBM tile pass
    instead of 2(T+1), and a 16-window top_k domain instead of W windows."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.fusedscore import exact_window_topk, fused_score_tiles

    def run(bmeta, planes, tfp, cs, cn, weights, cids, n_docs, deleted):
        # cached slots must not ALSO decode (their tile arrives by DMA)
        cn = cn * (cids[None, :] < 0)
        scores, rmax = fused_score_tiles(
            bmeta, planes, cs, cn, weights, cids, tfp, n_docs, deleted,
            tape=tape, scorer_name=scorer_name, n_windows=W, n_terms=T,
            batch=B, interpret=interpret,
        )
        return exact_window_topk(scores, rmax, k)

    return aot_jit(run, "_build_fused_fn", tape, scorer_name, W, T, B, k, interpret)


# ------------------------------------------------------ flat boolean path
# Tape-INDEPENDENT kernel for flat boolean shapes: the query structure
# rides as data (per-slot req/neg/opt flags + a k-of-n threshold), so one
# compiled program serves every flat AND/OR/NOT/MatchSome/optional query
# of a (T, B) bucket — the TPU analog of the reference's zero-compile-cost
# execution of arbitrary query shapes (exec.cpp:662-666). Toggle for A/B
# and fallback: TRINITY_FLATKERNEL=0 restores per-tape programs.
USE_FLAT = os.environ.get("TRINITY_FLATKERNEL", "1") != "0"

_FLAG_REQ, _FLAG_NEG, _FLAG_OPT = 1, 2, 4


class _NotFlat(Exception):
    pass


@functools.lru_cache(maxsize=8192)
def _flatten_tape(tape, n_slots):
    """Flatten a boolean tape into (per-slot flags, per-slot widx, kmin),
    or None when the shape can't be expressed flat.

    Accepted shapes: left-leaning AND/NOT chains whose items are tokens,
    opt(token), unot(token|or-chain) or not-with-token/or-chain rhs;
    top-level OR chains of tokens; MatchSome over tokens. The grouping
    restriction (left-leaning, right children contribute <= 1 scored leaf)
    guarantees the kernel's slot-order f32 accumulation is bit-identical
    to _eval_tape's tree-order accumulation — absent/unscored slots add
    +0.0, exact for the non-negative scores. Rejected shapes (nested
    OR-of-AND, slot reuse, phrase) keep their per-tape programs."""
    flags: dict = {}
    widxs: dict = {}
    scored_order: list = []

    def add(slot, bit, widx=None):
        if slot in flags:
            raise _NotFlat  # slot reuse (e.g. rep-dedup kept both tokens)
        flags[slot] = bit
        if widx is not None:
            widxs[slot] = widx
            scored_order.append(slot)

    def negs(t):
        # a pure negation operand: token or OR-chain (¬(a∨b) = ¬a ∧ ¬b)
        if t[0] == "tok":
            add(t[1], _FLAG_NEG)
        elif t[0] == "or":
            negs(t[1])
            negs(t[2])
        else:
            raise _NotFlat

    def item(t):
        # a conjunction item contributing <= 1 scored leaf (so tree
        # grouping == left-assoc accumulation)
        k = t[0]
        if k == "tok":
            add(t[1], _FLAG_REQ, t[2])
        elif k == "opt":
            c = t[1]
            if c[0] != "tok":
                raise _NotFlat
            add(c[1], _FLAG_OPT, c[2])
        elif k == "unot":
            negs(t[1])
        elif k == "not":
            item(t[1])
            negs(t[2])
        else:
            raise _NotFlat

    def conj(t):
        k = t[0]
        if k == "and":
            conj(t[1])
            item(t[2])
        elif k == "not":
            conj(t[1])
            negs(t[2])
        else:
            item(t)

    try:
        k0 = tape[0]
        if k0 == "or":

            def orchain(t):
                if t[0] == "or":
                    orchain(t[1])
                    if t[2][0] != "tok":
                        raise _NotFlat
                    add(t[2][1], _FLAG_REQ, t[2][2])
                elif t[0] == "tok":
                    add(t[1], _FLAG_REQ, t[2])
                else:
                    raise _NotFlat

            orchain(tape)
            kmin = 1
        elif k0 == "some":
            _, kmin, children = tape
            for c in children:
                if c[0] != "tok":
                    raise _NotFlat
                add(c[1], _FLAG_REQ, c[2])
        elif k0 in ("and", "not", "tok", "opt", "unot"):
            conj(tape)
            kmin = sum(1 for b in flags.values() if b == _FLAG_REQ)
        else:
            return None
    except _NotFlat:
        return None
    # slot-order accumulation must equal tree leaf order (slots are
    # assigned at first use in traversal order, so this holds unless a
    # widx remap reordered them — check anyway)
    if scored_order != sorted(scored_order):
        return None
    if any(s >= n_slots for s in flags):
        return None
    return (
        tuple(flags.get(s, 0) for s in range(n_slots)),
        tuple(widxs.get(s, -1) for s in range(n_slots)),
        kmin,
    )


@functools.lru_cache(maxsize=64)
def _build_flat_fn(scorer_name, W, T, B, k, interpret):
    """ONE Pallas program per (T, B) bucket serving EVERY flat boolean
    shape (structure = data): decode + flat eval + score + window maxima
    fused, then the two-phase exact top-k."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.fusedscore import (
        exact_window_topk,
        fused_flat_score_tiles,
    )

    def run(bmeta, planes, tfp, cs, cn, wts, flags, kmin, cids, n_docs,
            deleted):
        # cached slots must not ALSO decode (their tile arrives by DMA)
        cn = cn * (cids[None, :] < 0)
        scores, rmax = fused_flat_score_tiles(
            bmeta, planes, cs, cn, wts, flags, kmin, cids, tfp, n_docs,
            deleted, scorer_name=scorer_name, n_windows=W, n_terms=T,
            batch=B, interpret=interpret,
        )
        return exact_window_topk(scores, rmax, k)

    return aot_jit(run, "_build_flat_fn", scorer_name, W, T, B, k, interpret)


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
        # ONE flat top-k over the docid-major layout: ties break toward the
        # lower flat index = lower docid (the invariant), and it measures
        # ~7x faster than per-window top-k + merge on TPU
        gv, gi = jax.lax.top_k(scores.reshape(-1), k)
        return gv, gi

    return aot_jit(run, "_build_search_fn", tape, scorer_name, W, T, k, interpret, mode)


@functools.lru_cache(maxsize=512)
def _build_batch_combined(spec, layout, scorer_name, W, k, interpret):
    """ALL of a batch's groups in ONE jitted program with ONE packed f32
    output AND one packed input per dtype. Through the remote-device tunnel
    each dispatch and each fetched result array pays a fixed ~11-18 ms
    round trip (measured: 9 result leaves over 5 calls ~= 160 ms of a
    198 ms batch), so the per-group programs are inlined into a single pjit
    call and their (gv, gi[, resolved]) outputs concatenate into one
    (sum rows, k) f32 array — docids < 2^24 are f32-exact. The same
    economics apply on the INPUT side: the r5 launch profile measured the
    per-batch host planning at ~41 ms, ~37 ms of it in ~38 small
    device_put transfers, so the per-group input arrays concatenate
    host-side into ONE i32 and ONE f32 buffer and are re-sliced here with
    static offsets (`layout` = ((dtype_str, shape), ...) per array, part
    of the program key). The reference never pays a per-call cost like
    this (in-process execution, exec.cpp:509); this is the TPU-tunnel
    analog of its one-call-per-query model.

    spec entries: ("fused", tape, T, B) | ("flat", T, B) |
    ("dense", tape, T, B) | ("lazyph", slots, T, B, C2, fcaps,
    no_overflow) | ("posph", K, M, B, PW, rpos, goffr, cached). Row layout:
    B rows gv, B rows gi, (+ B rows resolved-flag for lazyph). Input arity
    per entry: 3 arrays (cs, cn, wts) — fused entries take 4 (+ cids), flat
    entries 6 (cs, cn, wts, flags, kmin, cids), posph entries 8 (cs, cn,
    dpr, ppr, gor, memidx, cidx, wts)."""
    jax, jnp = _lazy_jax()
    fns = []
    for ent in spec:
        if ent[0] == "fused":
            _, tape, T, B = ent
            fns.append(_build_fused_fn(tape, scorer_name, W, T, B, k, interpret))
        elif ent[0] == "flat":
            _, T, B = ent
            fns.append(_build_flat_fn(scorer_name, W, T, B, k, interpret))
        elif ent[0] == "dense":
            _, tape, T, B = ent
            fns.append(_build_batch_fn(tape, scorer_name, W, T, B, k, interpret))
        elif ent[0] == "posph":
            _, K, M, B, PW, rpos, goffr, cached = ent
            fns.append(
                _build_phrase_pos_fused(
                    K, W, M, B, PW, rpos, goffr, cached, scorer_name, k,
                    interpret,
                )
            )
        else:
            _, slots, T, B, C2, fcaps, noov = ent
            fns.append(
                _build_phrase_lazy_fused(
                    slots, W, T, B, C2, fcaps, scorer_name, k, interpret,
                    no_overflow=noov,
                )
            )

    def run(bmeta, planes, tfp, hit_pw, hit_off, hit_goff, pplanes, n_docs,
            deleted_tiles, deleted_flat, ibuf, fbuf):
        # re-slice the two packed input buffers into the per-group arrays
        # (static offsets — `layout` is part of the lru/aot key)
        flat = []
        io = fo = 0
        for dt, shp in layout:
            n = 1
            for d in shp:
                n *= d
            if dt == "f4":
                flat.append(fbuf[fo : fo + n].reshape(shp))
                fo += n
            else:
                flat.append(ibuf[io : io + n].reshape(shp))
                io += n
        rows = []
        off = 0
        for ent, fn in zip(spec, fns):
            nargs = {"flat": 6, "fused": 4, "posph": 8}.get(ent[0], 3)
            gargs = flat[off : off + nargs]
            off += nargs
            if ent[0] == "fused":
                cs, cn, wts, cids = gargs
                gv, gidx = fn(
                    bmeta, planes, tfp, cs, cn, wts, cids, n_docs,
                    deleted_tiles,
                )
            elif ent[0] == "flat":
                cs, cn, wts, gflags, gkmin, cids = gargs
                gv, gidx = fn(
                    bmeta, planes, tfp, cs, cn, wts, gflags, gkmin, cids,
                    n_docs, deleted_tiles,
                )
            elif ent[0] == "dense":
                cs, cn, wts = gargs
                gv, gidx = fn(bmeta, planes, cs, cn, wts, n_docs, deleted_flat)
            elif ent[0] == "posph":
                cs, cn, dpr, ppr, gor, memidx, cidx, wts = gargs
                gv, gidx = fn(
                    bmeta, planes, hit_pw, hit_goff, pplanes, cs, cn, dpr,
                    ppr, gor, memidx, cidx, wts, n_docs, deleted_flat,
                )
            else:
                cs, cn, wts = gargs
                gv, gidx, res = fn(
                    bmeta, planes, cs, cn, hit_pw, hit_off, wts, n_docs,
                    deleted_flat,
                )
            rows.append(gv)
            rows.append(gidx.astype(jnp.float32))
            if ent[0] == "lazyph":
                rows.append(
                    jnp.broadcast_to(
                        res[:, None].astype(jnp.float32), gv.shape
                    )
                )
        return jnp.concatenate(rows, axis=0)

    return aot_jit(
        run, "_build_batch_combined", spec, layout, scorer_name, W, k,
        interpret,
    )


def _tape_matches_empty(tape) -> bool:
    """True when the tape matches a document containing NONE of its terms
    (all-optional roots, pure negation, MatchSome with kmin=0, ...).

    Such queries match docs in windows where no query term is present, so
    the presence half of the WAND bound is unsound for them, and the
    pruned chunk evaluators' zeroed-cell trick (padding-duplicate window
    neutralization) would turn dead rows into score-0 matches. The pruned
    path routes them to the dense batch — they have nothing to prune
    anyway (every window contains matches)."""
    kind = tape[0]
    if kind in ("tok", "phrase", "false"):
        return False
    if kind == "and":
        return _tape_matches_empty(tape[1]) and _tape_matches_empty(tape[2])
    if kind == "or":
        return _tape_matches_empty(tape[1]) or _tape_matches_empty(tape[2])
    if kind == "not":
        return _tape_matches_empty(tape[1]) and not _tape_matches_empty(tape[2])
    if kind == "unot":
        return not _tape_matches_empty(tape[1])
    if kind == "opt":
        return True
    if kind == "some":
        _, kmin, children = tape
        return sum(_tape_matches_empty(c) for c in children) >= kmin
    return True  # unknown node: conservative — keep it on the dense path


def _tape_window_bounds(seg, tape, cs_h, cn_h, w_h, model, col):
    """Per-window (score upper bound, presence) for ANY boolean tape — the
    generalized WAND bound (docset_iterators.h:38-60), round 3 extension of
    the flat-AND/OR-only bound: token bounds come from per-block max
    frequencies; AND/OR sum child bounds under joint/either presence (each
    child's contribution is zeroed when it can't match); NOT keeps the lhs
    bound (the rhs only removes matches); MatchSome sums member bounds
    under a k-of-n presence count; ConstTrueExpr and unary-NOT can match
    anywhere with zero own contribution. Scores are non-negative (BM25/
    TF-IDF/Trivial weights >= 0), so summed child bounds are sound.

    All sums are f32 in the SAME tree order as the kernel's accumulation
    (_eval_tape / eval_flat_tiles slot order): f32 addition is monotone,
    and each leaf bound >= the leaf's f32 doc score, so every f32 partial
    sum — and hence the final bound — is >= any achievable f32 doc score.
    An f64 bound sum can round BELOW the kernel's rounded-up f32 score and
    wrongfully early-resolve a tie. Over-inclusive at window boundaries —
    safe for an upper bound. Phrase tapes and matches-empty tapes are
    excluded by the caller (no verification machinery; unsound presence)."""
    W = cs_h.shape[0]
    kind = tape[0]
    if kind == "tok":
        _, ti, widx = tape
        c = col(ti)
        starts = cs_h[:, c]
        counts = cn_h[:, c]
        has = counts > 0
        ub = np.zeros(W, np.float32)
        if has.any():
            mf = np.zeros(W, np.int64)
            idx = np.flatnonzero(has)
            red = np.maximum.reduceat(
                np.asarray(seg.block_max_freq, np.int64), starts[idx]
            )
            # reduceat segments run to the next start; also include the last
            # block of each cell (cells can overlap at window boundaries)
            mf[idx] = np.maximum(
                red[: len(idx)],
                seg.block_max_freq[starts[idx] + counts[idx] - 1],
            )
            ub = np.where(
                has,
                np.asarray(
                    model.score_tile(mf.astype(np.float32), w_h[widx]),
                    np.float32,
                ),
                np.float32(0.0),
            )
        return ub, has
    if kind in ("and", "or"):
        lu, lp = _tape_window_bounds(seg, tape[1], cs_h, cn_h, w_h, model, col)
        ru, rp = _tape_window_bounds(seg, tape[2], cs_h, cn_h, w_h, model, col)
        present = (lp & rp) if kind == "and" else (lp | rp)
        return np.where(present, lu + ru, np.float32(0.0)), present
    if kind == "not":
        lu, lp = _tape_window_bounds(seg, tape[1], cs_h, cn_h, w_h, model, col)
        return lu, lp
    if kind == "unot":
        return np.zeros(W, np.float32), np.ones(W, bool)
    if kind == "opt":
        cu, cp = _tape_window_bounds(seg, tape[1], cs_h, cn_h, w_h, model, col)
        return np.where(cp, cu, np.float32(0.0)), np.ones(W, bool)
    if kind == "some":
        _, kmin, children = tape
        tot = np.zeros(W, np.float32)
        cnt = np.zeros(W, np.int64)
        for ch in children:
            cu, cp = _tape_window_bounds(seg, ch, cs_h, cn_h, w_h, model, col)
            tot += cu
            cnt += cp
        present = cnt >= kmin
        return np.where(present, tot, np.float32(0.0)), present
    if kind == "false":
        return np.zeros(W, np.float32), np.zeros(W, bool)
    raise ValueError(kind)


def deleted_take(deleted, window_base, jnp):
    """Gather ~deleted for a window subset (pruned path) as ROW gathers:
    each window is a contiguous WINDOW_SIZE-doc range, so this is M row
    pulls instead of M*16384 element gathers (~7 ns/element on v5e)."""
    return ~deleted.reshape(-1, WINDOW_SIZE)[window_base]


def _pruned_pack_topk(jax, jnp, mask, score, window_base, n_docs, deleted, B, k):
    """Shared tail of the pruned chunk evaluators: liveness + deletion
    masking, NEG_INF fill, flat top_k (docid-asc ties hold because
    window_base is ascending within the chunk), and the packed single
    output (B gv rows, then B f32 docid rows — docids < 2^24 f32-exact,
    guarded by limits.MAX_SEGMENT_DOCS)."""
    M = mask.shape[1]
    gid = (
        window_base[:, None] * WINDOW_SIZE
        + jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
    )  # (M, N)
    mask = mask & (gid < n_docs)[None]
    if deleted is not None:
        mask = mask & deleted_take(deleted, window_base, jnp)[None]
    scores = jnp.where(mask, score, NEG_INF)  # (B, M, N)
    gv, gidx = jax.lax.top_k(scores.reshape(B, -1), k)
    w_of = gidx // WINDOW_SIZE
    gdoc = (
        jnp.take_along_axis(
            jnp.broadcast_to(window_base[None, :], (B, M)), w_of, axis=1
        )
        * WINDOW_SIZE
        + gidx % WINDOW_SIZE
    )
    return jnp.concatenate([gv, gdoc.astype(jnp.float32)], axis=0)


@functools.lru_cache(maxsize=256)
def _build_pruned_batch_fn(tape, scorer_name, M, T, B, k, interpret):
    """Chunk evaluator for BATCHED pruned search: B same-shape queries over
    M gathered windows in one program, packed single-array output (gv rows
    then f32 docid rows). window_base must be ascending within the chunk so
    the flat top_k keeps the docid-asc tie-break."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.postings import materialize_freq_tiles

    scorer_cls = SIMILARITIES[scorer_name]

    def run(bmeta, planes, cs, cn, window_base, weights, n_docs, deleted):
        tiles = materialize_freq_tiles(
            bmeta, planes, cs, cn, window_base,
            n_windows=M, n_terms=B * T, interpret=interpret,
        )
        freq = tiles.reshape(M, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        wsel = lambda i: weights[:, i, None, None]
        mask, score = _eval_tape(tape, freq, wsel, scorer_cls, jnp)
        return _pruned_pack_topk(
            jax, jnp, mask, score, window_base, n_docs, deleted, B, k
        )

    return aot_jit(run, "_build_pruned_batch_fn", tape, scorer_name, M, T, B, k, interpret)


@functools.lru_cache(maxsize=64)
def _build_pruned_flat_batch_fn(scorer_name, M, T, B, k, interpret):
    """Tape-INDEPENDENT chunk evaluator for batched pruned search: the flat
    query structure (per-slot flags + kmin) rides as data, so mixed flat
    shapes share one pruned program per (M, T, B) bucket — the pruned twin
    of _build_flat_fn."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.fusedscore import eval_flat_tiles
    from trinity_tpu.ops.postings import materialize_freq_tiles

    scorer_cls = SIMILARITIES[scorer_name]

    def run(bmeta, planes, cs, cn, window_base, weights, flags, kmin,
            n_docs, deleted):
        tiles = materialize_freq_tiles(
            bmeta, planes, cs, cn, window_base,
            n_windows=M, n_terms=B * T, interpret=interpret,
        )
        freq = tiles.reshape(M, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        mask, score = eval_flat_tiles(
            [freq[:, :, t, :] for t in range(T)],
            lambda t: flags[:, t, None, None],
            kmin[:, None, None],
            lambda t: weights[:, t, None, None],
            scorer_cls, T,
        )
        return _pruned_pack_topk(
            jax, jnp, mask, score, window_base, n_docs, deleted, B, k
        )

    return aot_jit(run, "_build_pruned_flat_batch_fn", scorer_name, M, T, B, k, interpret)


@functools.lru_cache(maxsize=512)
def _build_batch_fn(tape, scorer_name, W, T, B, k, interpret):
    """Batched execution: B same-shape queries share ONE device program —
    the extra parallelism axis the reference lacks (it executes one query
    per call, SURVEY §2.4). Stage 1 treats the batch as B*T term cells;
    stage 2 evaluates the tape with a leading batch dim."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.postings import materialize_freq_tiles

    scorer_cls = SIMILARITIES[scorer_name]

    def run(bmeta, planes, cell_start, cell_nblocks, weights, n_docs, deleted):
        # cell tables come in as (W, B*T)
        tiles = materialize_freq_tiles(
            bmeta,
            planes,
            cell_start,
            cell_nblocks,
            n_windows=W,
            n_terms=B * T,
            interpret=interpret,
        )
        # (W, B*T, 128, 128) -> (B, W, T, WINDOW)
        freq = (
            tiles.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        )
        wsel = lambda i: weights[:, i, None, None]  # (B,1,1) broadcast
        mask, score = _eval_tape(tape, freq, wsel, scorer_cls, jnp)
        gid = (
            jnp.arange(W, dtype=jnp.int32)[:, None] * WINDOW_SIZE
            + jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
        )
        mask = mask & (gid < n_docs)[None]
        if deleted is not None:
            mask = mask & ~deleted.reshape(W, WINDOW_SIZE)[None]
        scores = jnp.where(mask, score, NEG_INF)  # (B, W, N)
        gv, gi = jax.lax.top_k(scores.reshape(B, -1), k)  # flat: docid ties
        return gv, gi

    return aot_jit(run, "_build_batch_fn", tape, scorer_name, W, T, B, k, interpret)


@functools.lru_cache(maxsize=256)
def _build_phrase_lazy_fused(
    slots, W, T, B, C2, fcaps, scorer_name, k, interpret, no_overflow=False
):
    """Fully-fused lazy phrase execution for pure-phrase tapes: ONE device
    program ranks ALL member-conjunction candidates by the phrase-score
    bound (min member freq), pulls the top C2 per query, verifies their
    positions ON DEVICE, scores, and selects top-k. Returns a per-query
    `resolved` flag: False when the conjunction overflowed C2 AND the k-th
    verified score doesn't strictly beat the best unpulled bound (the rare
    case where the dense fallback must run). Candidates are re-sorted by
    docid before scoring so score ties keep the docid-asc invariant."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.ops.postings import materialize_freq_tiles
    from trinity_tpu.ops.select import bound_select_candidates

    scorer_cls = SIMILARITIES[scorer_name]

    def run(bmeta, planes, cs, cn, hit_pw, hit_off, weights, n_docs, deleted):
        tiles, offs = materialize_freq_tiles(
            bmeta, planes, cs, cn,
            n_windows=W, n_terms=B * T, interpret=interpret,
            with_offsets=True,
        )
        n = W * WINDOW_SIZE
        freq = tiles.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        offv = offs.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        member_f = [freq[:, :, s, :].reshape(B, n) for s in slots]
        member_o = [offv[:, :, s, :].reshape(B, n) for s in slots]
        bound = member_f[0]
        for f in member_f[1:]:
            bound = jnp.minimum(bound, f)  # 0 if any member missing
        # exact top-C2 by (bound desc, docid asc) WITHOUT the 1M-domain
        # top_k (~20-33 ms at B=12): integer-threshold selection + docid-
        # order compaction (ops/select.py) — candidates land already docid-
        # sorted, so no argsort either. bound <= min(fcaps) by fcap_bucket.
        ki, valid, min_kept, overflow = bound_select_candidates(
            bound, C2, vmax=min(fcaps), assume_no_overflow=no_overflow
        )
        # row-gather + lane-extract: the element-gather form of these four
        # pulls was +3.3 ms/iter of the 10.2 ms program (profile_phrase_r3)
        pf = jnp.stack(
            [gather_cols(f, ki) for f in member_f], axis=-1
        ).astype(jnp.int32)
        po = jnp.stack(
            [gather_cols(o, ki) for o in member_o], axis=-1
        )
        pfreq = verify_phrases_device(hit_pw, hit_off, valid, pf, po, fcaps)
        live = (pfreq > 0) & valid
        if deleted is not None:
            live = live & ~gather_cols(
                jnp.broadcast_to(deleted[None], (B, deleted.shape[0])), ki
            )
        score = scorer_cls.score_tile(
            pfreq.astype(jnp.float32), weights[:, None]
        )
        scores = jnp.where(live, score, NEG_INF)
        kk = min(k, C2)
        gv, gidx = jax.lax.top_k(scores, kk)  # ties -> lower docid (sorted)
        gi = jnp.take_along_axis(ki, gidx, axis=1)
        if kk < k:  # C2 smaller than k: can only resolve via ~overflow
            gv = jnp.pad(gv, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
            gi = jnp.pad(gi, ((0, 0), (0, k - kk)))
        kth = gv[:, k - 1]
        thresh = scorer_cls.score_tile(min_kept.astype(jnp.float32), weights)
        # min_kept (tau) is the max UNPULLED bound: kth > score(tau) proves
        # the pulled set covers the true top-k
        resolved = (~overflow) | (kth > thresh)
        return gv, gi, resolved

    return aot_jit(run, "_build_phrase_lazy_fused", slots, W, T, B, C2, fcaps, scorer_name, k, interpret, no_overflow)


@functools.lru_cache(maxsize=256)
def _build_phrase_pos_fused(K, W, M, B, PW, rpos, goffr, cached, scorer_name,
                            k, interpret):
    """Dense positional-bitmask phrase execution (ops/posmask.py): ONE
    device program scatters each UNIQUE member term's per-doc position
    bitmask over all windows, then computes every query's exact phrase
    frequency for EVERY doc as popcount(AND of member masks shifted by
    their phrase offset), scores, and selects top-k with the same two-phase
    exact selection as the boolean paths. No candidate ladder, no
    resolution flag — the evaluation is exhaustive and exact, and its cost
    is O(members' postings) scatter + O(n_docs * PW) elementwise work
    (the reference's per-doc DocWordsSpace adjacency test,
    docwordspace.h:58-127, vectorized over the corpus)."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.fusedscore import NSUB, exact_window_topk
    from trinity_tpu.ops.posmask import (
        materialize_posmask_tiles,
        phrase_freq_from_masks,
    )

    scorer_cls = SIMILARITIES[scorer_name]

    def run(bmeta, planes, hit_pw, hit_goff, pplanes, cs, cn, dpr, ppr, gor,
            memidx, cidx, weights, n_docs, deleted):
        masks = materialize_posmask_tiles(
            bmeta, planes, hit_pw, hit_goff, cs, cn, dpr, ppr, gor,
            n_windows=W, n_members=M, pw_words=PW, rpos_rows=rpos,
            goff_rows=goffr, interpret=interpret,
        )  # (W, M, PW, 128, 128) i32
        if cached:
            # cached members scattered ZERO tiles (cn forced 0); overlay
            # their precomputed planes from the hot posmask cache
            cm = jnp.take(pplanes, jnp.clip(cidx, 0), axis=1)
            masks = jnp.where(
                (cidx >= 0)[None, :, None, None, None], cm, masks
            )
        dead = (
            None if deleted is None else deleted.reshape(W, TILE, TILE)
        )
        scores = []
        for b in range(B):
            mm = jnp.moveaxis(
                jnp.take(masks, memidx[b], axis=1), 1, 0
            )  # (K, W, PW, 128, 128)
            freq = phrase_freq_from_masks(mm, K, PW)  # (W, 128, 128) i32
            live = freq > 0
            if dead is not None:
                live = live & ~dead
            sc = scorer_cls.score_tile(freq.astype(jnp.float32), weights[b])
            scores.append(jnp.where(live, sc, NEG_INF))
        scores = jnp.stack(scores)  # (B, W, 128, 128)
        sbmax = scores.reshape(B, W, NSUB, (TILE // NSUB) * TILE).max(axis=3)
        rmax = jnp.broadcast_to(sbmax[..., None], (B, W, NSUB, TILE))
        return exact_window_topk(scores, rmax, k)

    return aot_jit(run, "_build_phrase_pos_fused", K, W, M, B, PW, rpos,
                   goffr, cached, scorer_name, k, interpret)


@functools.lru_cache(maxsize=256)
def _build_phrase_lazy_a(slots, W, T, B, C2, interpret):
    """Device pass for lazy single-phrase execution: rank ALL member-
    conjunction candidates by the phrase-score bound (min member freq) with
    one global top_k — flat index IS the local docid, so bound ties order
    docid-ascending for free."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.postings import materialize_freq_tiles

    def run(bmeta, planes, cell_start, cell_nblocks):
        tiles, offs = materialize_freq_tiles(
            bmeta,
            planes,
            cell_start,
            cell_nblocks,
            n_windows=W,
            n_terms=B * T,
            interpret=interpret,
            with_offsets=True,
        )
        freq = tiles.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        offv = offs.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        n = W * WINDOW_SIZE
        member_f = [freq[:, :, s, :].reshape(B, n) for s in slots]
        member_o = [offv[:, :, s, :].reshape(B, n) for s in slots]
        bound = member_f[0]
        for f in member_f[1:]:
            bound = jnp.minimum(bound, f)  # 0 if any member missing
        kb, ki = jax.lax.top_k(bound, C2)  # (B, C2), ties -> lower docid
        pf = jnp.stack(
            [gather_cols(f, ki) for f in member_f], axis=-1
        ).astype(jnp.int32)
        po = jnp.stack(
            [gather_cols(o, ki) for o in member_o], axis=-1
        )
        overflow = (bound > 0).sum(axis=1) > C2
        return ki, kb.astype(jnp.int32), pf, po, overflow

    return aot_jit(run, "_build_phrase_lazy_a", slots, W, T, B, C2, interpret)


def _phrase_a_eval(freq, offv, phrase_slots, C, jax, jnp):
    """Candidate extraction shared by all phrase pass-A variants: for each
    phrase, docs where every member occurs (the member conjunction of
    Phrase::next_impl, docset_iterators.cpp:66-150), compacted to the first
    C docids per window via top_k on a descending-docid key. freq/offv have
    shape (..., T, WINDOW_SIZE) with any leading dims."""
    iota = jnp.arange(WINDOW_SIZE, dtype=jnp.int32)
    per_phrase = []
    for slots in phrase_slots:
        m = freq[..., slots[0], :] > 0
        for s in slots[1:]:
            m = m & (freq[..., s, :] > 0)
        key = jnp.where(m, WINDOW_SIZE - iota, 0)
        kv, ki = jax.lax.top_k(key, C)  # ascending docid among candidates
        valid = kv > 0
        cnt = m.sum(axis=-1)
        pf = jnp.stack(
            [gather_cols(freq[..., s, :], ki) for s in slots],
            axis=-1,
        ).astype(jnp.int32)
        po = jnp.stack(
            [gather_cols(offv[..., s, :], ki) for s in slots],
            axis=-1,
        )
        per_phrase.append((ki, valid, cnt, pf, po))
    return per_phrase


@functools.lru_cache(maxsize=256)
def _build_phrase_batch_a(phrase_slots, W, T, B, C, interpret):
    """Batched phrase pass A: B same-shape phrase queries in one program.
    Returns per-query freq (B, W, T, N) plus per-phrase candidate data."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.postings import materialize_freq_tiles

    def run(bmeta, planes, cell_start, cell_nblocks):
        tiles, offs = materialize_freq_tiles(
            bmeta,
            planes,
            cell_start,
            cell_nblocks,
            n_windows=W,
            n_terms=B * T,
            interpret=interpret,
            with_offsets=True,
        )
        freq = tiles.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        offv = offs.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        per_phrase = _phrase_a_eval(freq, offv, phrase_slots, C, jax, jnp)
        return freq, per_phrase

    return aot_jit(run, "_build_phrase_batch_a", phrase_slots, W, T, B, C, interpret)


@functools.lru_cache(maxsize=512)
def _build_phrase_batch_c(tape, scorer_name, W, T, B, k, C, n_phrases, interpret):
    """Batched phrase pass C: tape eval with injected (B, W, C) phrase
    scatters + per-query top-k."""
    jax, jnp = _lazy_jax()
    scorer_cls = SIMILARITIES[scorer_name]

    def run(freq, phrase_ids, phrase_freqs, weights, n_docs, deleted):
        rows_b = jnp.arange(B, dtype=jnp.int32)[:, None, None]
        rows_w = jnp.arange(W, dtype=jnp.int32)[None, :, None]
        phrase_tiles = []
        for p in range(n_phrases):
            tile = jnp.zeros((B, W, WINDOW_SIZE), jnp.float32)
            tile = tile.at[rows_b, rows_w, phrase_ids[p]].add(phrase_freqs[p])
            phrase_tiles.append(tile)
        wsel = lambda i: weights[:, i, None, None]
        mask, score = _eval_tape(tape, freq, wsel, scorer_cls, jnp, phrase_tiles)
        gid = (
            jnp.arange(W, dtype=jnp.int32)[:, None] * WINDOW_SIZE
            + jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
        )
        mask = mask & (gid < n_docs)[None]
        if deleted is not None:
            mask = mask & ~deleted.reshape(W, WINDOW_SIZE)[None]
        scores = jnp.where(mask, score, NEG_INF)
        gv, gi = jax.lax.top_k(scores.reshape(B, -1), k)  # flat: docid ties
        return gv, gi

    return aot_jit(run, "_build_phrase_batch_c", tape, scorer_name, W, T, B, k, C, n_phrases, interpret)


@functools.lru_cache(maxsize=256)
def _build_phrase_pass_a(phrase_slots, W, T, C, interpret):
    """Device pass A for phrase queries: stage-1 tiles WITH hits offsets +
    per-phrase candidate compaction. Candidates of a phrase are docs where
    every member term occurs (the member conjunction the reference leapfrogs
    in Phrase::next_impl, docset_iterators.cpp:66-150), compacted to the
    first C docids per window via stable top_k on a descending docid key."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.ops.postings import materialize_freq_tiles

    def run(bmeta, planes, cell_start, cell_nblocks):
        tiles, offs = materialize_freq_tiles(
            bmeta,
            planes,
            cell_start,
            cell_nblocks,
            n_windows=W,
            n_terms=T,
            interpret=interpret,
            with_offsets=True,
        )
        freq = tiles.reshape(W, T, WINDOW_SIZE)
        offv = offs.reshape(W, T, WINDOW_SIZE)
        per_phrase = _phrase_a_eval(freq, offv, phrase_slots, C, jax, jnp)
        return freq, per_phrase

    return aot_jit(run, "_build_phrase_pass_a", phrase_slots, W, T, C, interpret)


@functools.lru_cache(maxsize=512)
def _build_phrase_pass_c(tape, scorer_name, W, T, k, C, n_phrases, interpret, mode):
    """Device pass C: tape evaluation with verified phrase-frequency tiles
    injected as sparse (candidate-id, freq) scatters, then top-k."""
    jax, jnp = _lazy_jax()
    scorer_cls = SIMILARITIES[scorer_name]

    def run(freq, phrase_ids, phrase_freqs, weights, n_docs, deleted):
        rows = jnp.arange(W, dtype=jnp.int32)[:, None]
        phrase_tiles = []
        for p in range(n_phrases):
            tile = jnp.zeros((W, WINDOW_SIZE), jnp.float32)
            tile = tile.at[rows, phrase_ids[p]].add(phrase_freqs[p])
            phrase_tiles.append(tile)
        mask, score = _eval_tape(
            tape, freq, weights, scorer_cls, jnp, phrase_tiles
        )
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
        return jax.lax.top_k(scores.reshape(-1), k)  # flat: docid-asc ties

    return aot_jit(run, "_build_phrase_pass_c", tape, scorer_name, W, T, k, C, n_phrases, interpret, mode)


def _phrase_c_eval(
    tape, scorer_cls, freq, phrase_ids, phrase_freqs, weights, n_docs,
    deleted, W, k, mode, jax, jnp, B=None,
):
    """Tape evaluation with verified phrase tiles + top-k (pass C core).
    B=None is the single-query shape (W, ...); otherwise (B, W, ...)."""
    phrase_tiles = []
    if B is None:
        rows = jnp.arange(W, dtype=jnp.int32)[:, None]
        for ids, pfr in zip(phrase_ids, phrase_freqs):
            tile = jnp.zeros((W, WINDOW_SIZE), jnp.float32)
            phrase_tiles.append(tile.at[rows, ids].add(pfr))
    else:
        rows_b = jnp.arange(B, dtype=jnp.int32)[:, None, None]
        rows_w = jnp.arange(W, dtype=jnp.int32)[None, :, None]
        for ids, pfr in zip(phrase_ids, phrase_freqs):
            tile = jnp.zeros((B, W, WINDOW_SIZE), jnp.float32)
            phrase_tiles.append(tile.at[rows_b, rows_w, ids].add(pfr))
    mask, score = _eval_tape(tape, freq, weights, scorer_cls, jnp, phrase_tiles)
    gid = (
        jnp.arange(W, dtype=jnp.int32)[:, None] * WINDOW_SIZE
        + jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
    )
    live = gid < n_docs
    if deleted is not None:
        live = live & ~deleted.reshape(W, WINDOW_SIZE)
    mask = mask & (live if B is None else live[None])
    if mode == "docs":
        return mask
    scores = jnp.where(mask, score, NEG_INF)
    if B is None:
        return jax.lax.top_k(scores.reshape(-1), k)  # flat: docid-asc ties
    return jax.lax.top_k(scores.reshape(B, -1), k)


@functools.lru_cache(maxsize=512)
def _build_phrase_fused(
    tape, scorer_name, W, T, k, C, phrase_slots, fcaps, interpret, mode
):
    """Single-program phrase execution: candidate extraction (pass A),
    device position verification, and tape eval + top-k (pass C) in ONE
    jitted program — the fully on-device analog of Phrase::next_impl +
    consider_phrase_match (docset_iterators.cpp:66-224), with no host
    round-trip. fcaps[p][m] is phrase p member m's static position cap."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.ops.postings import materialize_freq_tiles

    scorer_cls = SIMILARITIES[scorer_name]

    def run(bmeta, planes, cs, cn, hit_pw, hit_off, weights, n_docs, deleted):
        tiles, offs = materialize_freq_tiles(
            bmeta, planes, cs, cn,
            n_windows=W, n_terms=T, interpret=interpret, with_offsets=True,
        )
        freq = tiles.reshape(W, T, WINDOW_SIZE)
        offv = offs.reshape(W, T, WINDOW_SIZE)
        per_phrase = _phrase_a_eval(freq, offv, phrase_slots, C, jax, jnp)
        cnts = jnp.stack([p[2] for p in per_phrase])  # (P, W) overflow check
        phrase_ids, phrase_freqs = [], []
        for fc, (ki, valid, _, pf, po) in zip(fcaps, per_phrase):
            pfreq = verify_phrases_device(hit_pw, hit_off, valid, pf, po, fc)
            phrase_ids.append(ki)
            phrase_freqs.append(pfreq.astype(jnp.float32))
        res = _phrase_c_eval(
            tape, scorer_cls, freq, phrase_ids, phrase_freqs, weights,
            n_docs, deleted, W, k, mode, jax, jnp,
        )
        return cnts, res

    return aot_jit(run, "_build_phrase_fused", tape, scorer_name, W, T, k, C, phrase_slots, fcaps, interpret, mode)


@functools.lru_cache(maxsize=512)
def _build_phrase_batch_fused(
    tape, scorer_name, W, T, B, k, C, phrase_slots, fcaps, interpret
):
    """Batched fused phrase execution: B same-shape queries, pass A +
    device verification + pass C in one program."""
    jax, jnp = _lazy_jax()
    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.ops.postings import materialize_freq_tiles

    scorer_cls = SIMILARITIES[scorer_name]

    def run(bmeta, planes, cs, cn, hit_pw, hit_off, weights, n_docs, deleted):
        tiles, offs = materialize_freq_tiles(
            bmeta, planes, cs, cn,
            n_windows=W, n_terms=B * T, interpret=interpret, with_offsets=True,
        )
        freq = tiles.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        offv = offs.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        per_phrase = _phrase_a_eval(freq, offv, phrase_slots, C, jax, jnp)
        cnts = jnp.stack([p[2] for p in per_phrase])  # (P, B, W)
        phrase_ids, phrase_freqs = [], []
        for fc, (ki, valid, _, pf, po) in zip(fcaps, per_phrase):
            pfreq = verify_phrases_device(hit_pw, hit_off, valid, pf, po, fc)
            phrase_ids.append(ki)
            phrase_freqs.append(pfreq.astype(jnp.float32))
        wsel = lambda i: weights[:, i, None, None]
        res = _phrase_c_eval(
            tape, scorer_cls, freq, phrase_ids, phrase_freqs, wsel,
            n_docs, deleted, W, k, "search", jax, jnp, B=B,
        )
        return cnts, res

    return aot_jit(run, "_build_phrase_batch_fused", tape, scorer_name, W, T, B, k, C, phrase_slots, fcaps, interpret)


def _pick_c2(total_bound: int, c2_cap: int, k: int) -> int:
    """Smallest lazy-phrase candidate-capacity bucket covering the group's
    largest min-member df (and k) — shared by the single-chip and mesh
    lazyph preps so both compile the same variant ladder (warmup coverage
    keys on C2).

    Above the configured cap the ladder KEEPS GROWING (sparse power-of-4
    rungs) instead of conceding to overflow: a C2 >= min-member-df makes
    overflow impossible, so stopword bigrams stay on the lazy path — the
    flat device verify scales near-linearly with C2 (bytes/vol-bounded
    auto-chunking, exec/phrases.py), while the dense positional fallback
    they previously triggered measured 100-277 ms/query (r4)."""
    from trinity_tpu.config import get_config

    for c2b in (256, 512, 1024, 2048, 4096):
        if total_bound <= c2b <= c2_cap and k <= c2b:
            return c2b
    if total_bound <= c2_cap:
        return c2_cap
    c2_max = get_config().phrase_lazy_max_candidates
    c2b = max(4 * c2_cap, 256)
    while c2b < total_bound and c2b * 4 <= max(c2_max, c2_cap):
        c2b *= 4
    return min(c2b, max(c2_max, c2_cap))


def _phrase_group_c2(df_of, plan, slots, k) -> int:
    """Per-QUERY lazy-phrase C2 bucket, used as part of the batch group
    key: the verify stage costs C2 x a fixed per-candidate DMA (~3.3 us),
    so grouping a rare bigram with a stopword bigram at the group-max C2
    multiplied the whole batch's phrase cost (measured r4: one min-df-445k
    phrase dragged 11 cheap phrases to C2=8192 -> 27 ms EACH). Same-bucket
    queries still share one program variant. Shared by the single-chip and
    mesh preps (bucket drift would hollow out warmup coverage)."""
    from trinity_tpu.config import get_config

    dfs = [int(df_of(plan.term_texts[s])) for s in slots]
    return _pick_c2(
        min(dfs) if dfs else 0, get_config().phrase_lazy_candidates, k
    )


def _pick_bucket(buckets, n: int) -> int:
    """Smallest batch bucket >= n, or n itself above the ladder — ONE
    policy for every grouped program (dense/flat/phrase/pruned, single-chip
    and mesh): bucket drift between prep paths would compile distinct
    variants for the same workload and hollow out warmup coverage."""
    return next((b for b in buckets if b >= n), n)


def warmup_driver(target, queries, k, scorer, batch, threads) -> dict:
    """Shared warmup submission/accounting for Executor and the mesh
    executors. EVERY query goes through, not a tape-deduped sample:
    program variants are keyed by more than the tape (phrase C2/fcap
    ladder buckets, geometry buckets, mode), so a representative probe per
    tape misses variants that would then compile INSIDE the serving loop
    (observed: 14 s p99 from one in-loop phrase-ladder compile). Variant
    dedup happens in the builder lru caches and the per-variant _AotJit
    compile locks — duplicate submissions block on the first compile, then
    run in microseconds. The thread pool exploits that XLA/PJRT compiles
    release the GIL (remote RPCs on the axon backend), so warmup wall
    tracks the slowest variant, not the sum."""
    import concurrent.futures as cf
    import time as _time

    from trinity_tpu.utils.metrics import get_metrics

    def _count():
        snap = get_metrics().snapshot()
        return sum(
            v["value"]
            for kk, v in snap.items()
            if kk in ("aot.compiled", "aot.loaded")
        )

    t0 = _time.time()
    before = _count()
    qs = list(queries)
    with cf.ThreadPoolExecutor(max_workers=max(1, threads)) as pool:
        futs = [pool.submit(target.search, q, k=k, scorer=scorer) for q in qs]
        if batch and qs:
            futs.append(pool.submit(target.search_batch, qs, k=k, scorer=scorer))
        for f in futs:
            f.result()
    return {
        # aot-tracked compile/load events (0 when the cache is off)
        "programs": _count() - before,
        "variants": len(qs) + (1 if batch and qs else 0),
        "seconds": _time.time() - t0,
    }


class Executor:
    """Per-segment search session (the IndexSource + exec_query analog).

    Device-resident state: packed plane matrix + block metadata uploaded
    once (the mmap'd-segment analog, segment_index_source.cpp:5-186).
    """

    def __init__(self, seg: SegmentData, interpret: Optional[bool] = None):
        jax, jnp = _lazy_jax()
        from trinity_tpu.limits import MAX_SEGMENT_DOCS
        from trinity_tpu.ops.postings import pack_block_meta, pad_planes

        if seg.n_docs >= MAX_SEGMENT_DOCS:
            # combined-batch and pruned-batch programs return local docids
            # as f32 rows — exact only below 2^24 (limits.MAX_SEGMENT_DOCS).
            # Failing here beats silently corrupting ids past 16.8M docs.
            raise ValueError(
                f"segment has {seg.n_docs} docs >= 2^24 "
                "(f32-exact docid envelope, limits.MAX_SEGMENT_DOCS): "
                "shard it across executors (parallel.mesh) instead"
            )
        self.seg = seg
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        # packed HOST forms; device upload is LAZY through the HBM residency
        # manager (segment_index_source.cpp:5-186 maps on demand; here a
        # byte budget + LRU eviction stand in for demand paging — see
        # exec/residency.py). Accessed via the bmeta/planes/hit_pw/hit_off
        # properties, which touch the LRU and re-upload after eviction.
        self._bmeta_h = pack_block_meta(seg)
        self._planes_h = pad_planes(seg.planes)
        # plane-packed positions stream, padded so the posmask kernel's
        # fixed-size per-cell DMAs stay in bounds (also covers the fused
        # phrase verifier's word-pair guard read)
        from trinity_tpu.ops.posmask import GOFF_GUARD_ROWS, POS_GUARD_ROWS

        hp = np.ascontiguousarray(seg.hit_planes, dtype=np.uint32)
        self._hit_pw_h = np.vstack(
            [hp.reshape(-1, 128), np.zeros((POS_GUARD_ROWS, 128), np.uint32)]
        )
        self._hit_off_h = seg.hit_group_off.astype(np.int32)
        # group offsets as 128-lane rows (the posmask kernel DMAs them to
        # SMEM; dynamic-offset DMAs need 128-wide rows)
        goff_rows = -(-len(self._hit_off_h) // 128) + GOFF_GUARD_ROWS
        gr = np.zeros(goff_rows * 128, np.int32)
        gr[: len(self._hit_off_h)] = self._hit_off_h
        self._hit_goff_h = gr.reshape(-1, 128)
        self.device_bytes = (
            self._bmeta_h.nbytes
            + self._planes_h.nbytes
            + self._hit_pw_h.nbytes
            + self._hit_off_h.nbytes
            + self._hit_goff_h.nbytes
        )
        self._dev: Optional[dict] = None
        self._upload_lock = threading.Lock()  # serializes _upload per executor
        from trinity_tpu.exec.residency import get_residency

        self._residency = get_residency()
        self._max_freq_cache: dict = {}
        self._deleted = None  # optional bool (W*WINDOW,) mask of masked docs
        self._deleted_np = None  # host copy for lazy phrase verification
        self._deleted_tiles = None  # (W, 128, 128) f32 form (fused kernel)
        # hot-term plane cache: highest-df terms above the configured df
        # floor, within the byte budget (config.hot_cache_bytes). Planes
        # materialize lazily at the first batch that could use them (so
        # warmup builds them before the program seal); values come from
        # the same decode kernel, so cached results are bit-identical.
        from trinity_tpu.config import get_config

        cfg = get_config()
        # dense positional-bitmask phrase path gate (ops/posmask.py): the
        # segment's max position must fit the word budget and its positions
        # must be distinct per (term, doc) — else popcount != the anchored
        # multiplicity count and the candidate ladder runs instead
        self._pw_words = max(1, -(-(seg.max_position + 1) // 32))
        self._posmask_enabled = bool(
            cfg.use_posmask
            and seg.positions_distinct
            and self._pw_words <= cfg.posmask_max_words
        )
        self._hot: dict = {}
        self._tf_planes = None
        self._tf_lock = threading.Lock()
        if cfg.hot_cache_bytes > 0 and seg.n_terms > 0:
            per = seg.n_windows * (TILE * TILE * 4)
            cap = int(cfg.hot_cache_bytes // per)
            if cap > 0:
                df = np.asarray(seg.term_df)
                order = np.argsort(-df, kind="stable")
                order = order[df[order] >= cfg.hot_cache_min_df][:cap]
                self._hot = {int(t): i for i, t in enumerate(order)}
        # posmask hot cache: highest-df terms' position-bitmask planes,
        # built ONCE per executor (they are query-independent) — a cached
        # phrase member skips the per-query scatter, whose cost is linear
        # in the member's postings (a df~1M member measures ~tens of ms to
        # scatter but streams at HBM bandwidth once cached)
        self._pos_hot: dict = {}
        self._pos_planes = None
        self._pos_lock = threading.Lock()
        if (
            self._posmask_enabled
            and cfg.posmask_cache_bytes > 0
            and seg.n_terms > 0
        ):
            per = seg.n_windows * self._pw_words * (TILE * TILE * 4)
            cap = int(cfg.posmask_cache_bytes // per)
            if cap > 0:
                df = np.asarray(seg.term_df)
                order = np.argsort(-df, kind="stable")
                order = order[df[order] >= cfg.posmask_min_df][:cap]
                self._pos_hot = {int(t): i for i, t in enumerate(order)}

    # ------------------------------------------------- device residency
    def _upload(self) -> None:
        jax, jnp = _lazy_jax()
        # ensure_compile_time_eval: the first touch of .bmeta/.planes may
        # happen inside a jit trace (a caller passing executor arrays into
        # its own traced function) — the uploads must be CONCRETE device
        # arrays, never tracers captured into _dev (a tracer leak)
        with jax.ensure_compile_time_eval():
            self._dev = {
                "bmeta": jnp.asarray(self._bmeta_h),
                "planes": jnp.asarray(self._planes_h),
                "hit_pw": jnp.asarray(self._hit_pw_h),
                "hit_off": jnp.asarray(self._hit_off_h),
                "hit_goff": jnp.asarray(self._hit_goff_h),
            }

    def _drop_device(self) -> None:
        self._dev = None

    def evict(self) -> None:
        """Drop this segment's device arrays (HBM freed once XLA releases
        the buffers); the next search transparently re-uploads."""
        self._drop_device()

    @property
    def bmeta(self):
        # read from the RETURNED dict: self._dev may be concurrently
        # evicted the moment ensure() releases the manager lock
        return self._residency.ensure(self)["bmeta"]

    @property
    def planes(self):
        return self._residency.ensure(self)["planes"]

    @property
    def hit_pw(self):
        return self._residency.ensure(self)["hit_pw"]

    @property
    def hit_off(self):
        return self._residency.ensure(self)["hit_off"]

    @property
    def hit_goff(self):
        return self._residency.ensure(self)["hit_goff"]

    # -------------------------------------------------- hot-term plane cache
    @property
    def tf_planes(self):
        """(C, W, 128, 128) f32 cached frequency planes for the hot-term
        map built at __init__ (a (1, 1, 128, 128) zero dummy while empty /
        disabled — the kernels never read it when every cid is -1)."""
        if self._tf_planes is None:
            self._ensure_tf_planes()
        return self._tf_planes

    def _ensure_tf_planes(self):
        jax, jnp = _lazy_jax()
        if self._tf_planes is not None:
            return
        with self._tf_lock:
            self._ensure_tf_planes_locked()

    def _ensure_tf_planes_locked(self):
        """Build under _tf_lock: warmup fans search() across a thread pool,
        and an unlocked build raced N threads into N concurrent full plane
        materializations (N x hot_cache_bytes transient HBM = OOM)."""
        jax, jnp = _lazy_jax()
        if self._tf_planes is not None:
            return
        if not self._hot:
            with jax.ensure_compile_time_eval():
                self._tf_planes = jnp.zeros((1, 1, TILE, TILE), jnp.float32)
            return
        from trinity_tpu.ops.postings import (
            compute_cells, materialize_freq_tiles,
        )

        seg = self.seg
        W = seg.n_windows
        order = sorted(self._hot, key=self._hot.get)
        CH = 8  # terms per materialize call (bounds the per-call tile HBM)
        mat = jax.jit(
            functools.partial(
                materialize_freq_tiles, n_windows=W, n_terms=CH,
                interpret=self.interpret,
            )
        )
        chunks = []
        for i in range(0, len(order), CH):
            tids = order[i : i + CH]
            tids = tids + [-1] * (CH - len(tids))
            cs, cn = compute_cells(seg, tids)
            # same decode kernel the serving programs run -> identical f32
            tiles = mat(self.bmeta, self.planes, cs, cn)  # (W, CH, 128, 128)
            chunks.append(tiles.transpose(1, 0, 2, 3))
        planes = jnp.concatenate(chunks)[: len(order)]
        self._tf_planes = jax.block_until_ready(planes)
        # not folded into device_bytes: the residency manager's budget
        # covers the EVICTABLE segment arrays; these planes are a derived
        # cache pinned for the executor's lifetime (hot_cache_bytes bounds
        # them separately)

    def _cids_for(self, tids, T: int) -> np.ndarray:
        """Per-slot hot-cache plane ids (length T, -1 = decode)."""
        out = np.full(T, -1, np.int32)
        for s, tid in enumerate(tids):
            out[s] = self._hot.get(int(tid), -1)
        return out

    def _pos_cell_rows(self, cs, cn):
        """Host-precomputed per-cell plane-row starts for the posmask
        scatter kernel (one DMA wave per cell — ops/posmask.py): returns
        (dpr, ppr, gor, need_pos_rows, need_goff_rows)."""
        seg = self.seg
        bho = seg.block_hits_off.astype(np.int64)
        goff = seg.hit_group_off.astype(np.int64)
        n_blocks = len(bho)
        G = len(goff) - 1
        if n_blocks == 0 or G <= 0:
            # zero-block segment: empty shard or mask-only (erase-only)
            # generation (index_source.h:160-189) — nothing to scatter.
            # r4 regression: clamping to n_blocks-1 indexed an EMPTY array.
            z = np.zeros_like(np.asarray(cs), dtype=np.int32)
            return z, z, z, 0, 0
        e0 = bho[np.minimum(cs, max(0, n_blocks - 1))]
        nxt = cs.astype(np.int64) + cn
        e1 = np.where(
            nxt < n_blocks,
            bho[np.minimum(nxt, max(0, n_blocks - 1))],
            G * 128,  # padded stream element count (gend clamps to G)
        )
        g0 = e0 >> 7
        gend = np.minimum(-(-e1 // 128), G)
        dpr = (
            seg.block_plane_off.astype(np.int64)[
                np.minimum(cs, max(0, n_blocks - 1))
            ]
            >> 5
        ).astype(np.int32)
        ppr = (goff[np.minimum(g0, G)] >> 5).astype(np.int32)
        gor = (g0 >> 7).astype(np.int32)
        live = cn > 0
        pos_rows = np.where(
            live, (goff[np.minimum(gend, G)] >> 5) - ppr + 2, 0
        )
        goff_rows = np.where(live, (gend >> 7) - gor + 2, 0)
        return (
            dpr, ppr, gor,
            int(pos_rows.max(initial=0)),
            int(goff_rows.max(initial=0)),
        )

    @property
    def pos_planes(self):
        self._ensure_pos_planes()
        return self._pos_planes

    def _ensure_pos_planes(self):
        jax, jnp = _lazy_jax()
        if self._pos_planes is not None:
            return
        with self._pos_lock:
            self._ensure_pos_planes_locked()

    def _ensure_pos_planes_locked(self):
        """Build posmask planes under _pos_lock (same OOM-race rationale as
        _ensure_tf_planes_locked). Terms whose per-cell positions exceed
        the largest DMA bucket are dropped from the cache (groups holding
        them fall back to the candidate ladder anyway)."""
        jax, jnp = _lazy_jax()
        if self._pos_planes is not None:
            return
        from trinity_tpu.ops.posmask import (
            GOFF_ROWS,
            RPOS_BUCKETS,
            materialize_posmask_tiles,
        )
        from trinity_tpu.ops.postings import compute_cells

        PW = self._pw_words
        if not self._pos_hot:
            with jax.ensure_compile_time_eval():
                self._pos_planes = jnp.zeros((1, 1, 1, 1, 1), jnp.int32)
            return
        seg = self.seg
        W = seg.n_windows
        order = sorted(self._pos_hot, key=self._pos_hot.get)
        # per-term DMA-bucket feasibility (the biggest cells live here)
        keep = []
        rb_max = RPOS_BUCKETS[-1]
        for tid in order:
            cs1, cn1 = compute_cells(seg, [tid])
            _, _, _, np_, ng_ = self._pos_cell_rows(cs1, cn1)
            if np_ <= rb_max and ng_ <= GOFF_ROWS[rb_max]:
                keep.append(tid)
        self._pos_hot = {int(t): i for i, t in enumerate(keep)}
        if not keep:
            with jax.ensure_compile_time_eval():
                self._pos_planes = jnp.zeros((1, 1, 1, 1, 1), jnp.int32)
            return
        CH = 8  # terms per scatter call: ONE kernel variant, bounded HBM
        chunks = []
        for i in range(0, len(keep), CH):
            tids = keep[i : i + CH]
            tids = tids + [-1] * (CH - len(tids))
            cs, cn = compute_cells(seg, tids)
            dpr, ppr, gor, np_, ng_ = self._pos_cell_rows(cs, cn)
            rpos = next(
                rb for rb in RPOS_BUCKETS
                if np_ <= rb and ng_ <= GOFF_ROWS[rb]
            )
            # fixed largest bucket: every chunk shares ONE compiled variant
            rpos = rb_max if self.interpret is False else rpos
            tiles = materialize_posmask_tiles(
                self.bmeta, self.planes, self.hit_pw, self.hit_goff,
                jnp.asarray(cs), jnp.asarray(cn),
                jnp.asarray(dpr), jnp.asarray(ppr), jnp.asarray(gor),
                n_windows=W, n_members=CH, pw_words=PW,
                rpos_rows=rpos, goff_rows=GOFF_ROWS[rpos],
                interpret=self.interpret,
            )  # (W, CH, PW, 128, 128)
            chunks.append(tiles)
        planes = jnp.concatenate(chunks, axis=1)[:, : len(keep)]
        self._pos_planes = jax.block_until_ready(planes)

    # ------------------------------------------------------------ plumbing
    def set_masked_local_docs(self, local_ids: Optional[np.ndarray]):
        """Install a masked-documents registry for this source
        (masked_documents_registry analog, docidupdates.h:90-191): local ids
        whose documents are shadowed by newer segments."""
        _, jnp = _lazy_jax()
        if local_ids is None or len(local_ids) == 0:
            self._deleted = None
            self._deleted_np = None
            self._deleted_tiles = None
            return
        W = self.seg.n_windows
        m = np.zeros(W * WINDOW_SIZE, bool)
        m[local_ids] = True
        self._deleted = jnp.asarray(m)
        self._deleted_np = m
        # tile form for the fused score kernel (1.0 = masked)
        from trinity_tpu.limits import TILE

        self._deleted_tiles = jnp.asarray(
            m.reshape(W, TILE, TILE).astype(np.float32)
        )

    def _doc_set_masks(self, doc_set):
        """Fold an app-supplied docid set (the VectorIDs / AppIterator
        extension point, docset_iterators.cpp:415-452: AND the query against
        these ids) into the deletion-mask machinery: everything OUTSIDE the
        set is masked for this call. Returns the saved mask state."""
        _, jnp = _lazy_jax()
        from trinity_tpu.limits import TILE

        saved = (self._deleted, self._deleted_np, self._deleted_tiles)
        ids = np.asarray(doc_set, np.int64)
        # app ids -> local ids via the sorted doc_map
        idx = np.searchsorted(self.seg.doc_map, ids)
        idx = np.minimum(idx, self.seg.n_docs - 1)
        local = idx[self.seg.doc_map[idx] == ids]
        W = self.seg.n_windows
        m = np.ones(W * WINDOW_SIZE, bool)
        m[local] = False  # mask everything not in the set
        if self._deleted_np is not None:
            m |= self._deleted_np
        self._deleted = jnp.asarray(m)
        self._deleted_np = m
        self._deleted_tiles = jnp.asarray(
            m.reshape(W, TILE, TILE).astype(np.float32)
        )
        return saved

    def _restore_masks(self, saved):
        self._deleted, self._deleted_np, self._deleted_tiles = saved

    def _launch_bool(self, plan, cs, cn, weights, k, scorer):
        """Issue the boolean-tape device program; returns ((k,), (k,))
        pending device arrays. Prefers the fused score kernel."""
        seg = self.seg
        T = _pad_T(plan.n_slots)
        cids = np.full(T, -1, np.int32)
        if self._hot:
            cids[: plan.n_slots] = self._cids_for(
                [seg.term_id(t) for t in plan.term_texts], plan.n_slots
            )
        flat = (
            _flatten_tape(plan.tape, plan.n_slots)
            if USE_FLAT and T <= FUSED_MAX_SLOTS
            else None
        )
        if flat is not None:
            # tape-independent program: one compile variant per T bucket
            # covers every flat single-query shape (AND/OR/NOT/k-of-n/opt)
            fl, wsel, km = flat
            wnp = np.asarray(weights)
            wflat = np.zeros((1, T), np.float32)
            gflags = np.zeros((1, T), np.int32)
            for s in range(plan.n_slots):
                gflags[0, s] = fl[s]
                if wsel[s] >= 0:
                    wflat[0, s] = wnp[wsel[s]]
            fn = _build_flat_fn(scorer, seg.n_windows, T, 1, k, self.interpret)
            gv, gi = fn(
                self.bmeta, self.planes, self.tf_planes, cs, cn, wflat,
                gflags, np.array([km], np.int32), cids,
                np.int32(seg.n_docs), self._deleted_tiles,
            )
            return gv[0], gi[0]
        used = _fused_used_slots(plan.tape)
        if used is not None:
            fn = _build_fused_fn(
                plan.tape, scorer, seg.n_windows, _pad_T(plan.n_slots), 1, k,
                self.interpret,
            )
            gv, gi = fn(
                self.bmeta, self.planes, self.tf_planes, cs, cn,
                weights[None, :], cids, np.int32(seg.n_docs),
                self._deleted_tiles,
            )
            return gv[0], gi[0]
        fn = _build_search_fn(
            plan.tape, scorer, seg.n_windows, _pad_T(plan.n_slots), k,
            self.interpret, "search",
        )
        return fn(
            self.bmeta, self.planes, cs, cn, weights,
            np.int32(seg.n_docs), self._deleted,
        )

    def _prepare(self, query, scorer, stats=None, df_of=None):
        """Resolve terms, compute cells and weights. stats/df_of allow
        collection-level aggregation (similarity.h:146-158,209-217)."""
        from trinity_tpu.ops.postings import compute_cells

        jax, jnp = _lazy_jax()
        if isinstance(query, str):
            root, plan = _plan_for_text(query)
        else:
            root = query.root if isinstance(query, Query) else query
            plan = compile_plan(root) if root is not None else None
        if root is None:
            return None
        seg = self.seg
        tids = [seg.term_id(t) for t in plan.term_texts]
        cell_start, cell_nblocks = compute_cells(seg, tids)
        pad = _pad_T(plan.n_slots) - plan.n_slots
        if pad:
            cell_start = np.pad(cell_start, ((0, 0), (0, pad)))
            cell_nblocks = np.pad(cell_nblocks, ((0, 0), (0, pad)))
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

    def warmup(self, queries, k: int = 10, scorer: str = "bm25",
               batch: bool = True, threads: int = 8) -> dict:
        """Compile (or load from the persistent cache) every device-program
        variant the given workload can touch, so serving latency never pays
        an XLA compile. The reference executes any query shape with zero
        compile cost (exec.cpp:662-666); here compiled programs are keyed by
        (tape shape, geometry, candidate/fcap buckets), so a serving process
        should warm with a representative query sample at startup.

        Submission and accounting are shared with the mesh executors
        (warmup_driver below).
        Returns {"programs", "variants", "seconds"} for BENCH metadata."""
        return warmup_driver(self, queries, k, scorer, batch, threads)

    # -------------------------------------------------------------- search
    def launch(self, query, k=10, scorer="bm25", stats=None, df_of=None):
        """Issue the device program without waiting (multi-source pipelining;
        the async analog of exec_query_par's per-source futures,
        exec.h:132-154). Returns an opaque pending handle for finish().
        Phrase plans execute eagerly (they need a host round-trip)."""
        prep = self._prepare(query, scorer, stats, df_of)
        if prep is None:
            return None
        plan, cs, cn, weights = prep
        seg = self.seg
        if plan.has_phrase:
            return self._phrase_search_dispatch(
                plan, cs, cn, weights, scorer, k, stats, df_of
            )
        return self._launch_bool(plan, cs, cn, weights, k, scorer)

    def finish(self, pending) -> List[SearchResult]:
        """Resolve a launch() handle into results."""
        if pending is None:
            return []
        jax, _ = _lazy_jax()
        gv, gi = jax.device_get(pending)
        out = []
        for v, i in zip(gv, gi):
            if v == NEG_INF:
                break
            out.append(SearchResult(int(self.seg.doc_map[i]), float(v)))
        return out

    def search(
        self,
        query,
        k: int = 10,
        scorer: str = "bm25",
        stats=None,
        df_of=None,
        doc_set=None,
    ) -> List[SearchResult]:
        """AccumulatedScoreScheme execution (exec.h:25-34): ranked top-k.

        doc_set: optional app docid array the query is ANDed against — the
        application-supplied docid-set node (VectorIDs,
        docset_iterators.cpp:415-452). Executors are per-session
        single-threaded like the reference's per-query exec context."""
        from trinity_tpu.utils.timings import trace

        if doc_set is not None:
            saved = self._doc_set_masks(doc_set)
            try:
                return self.search(query, k, scorer, stats, df_of)
            finally:
                self._restore_masks(saved)

        # a single query is a batch of one: the combined-batch path runs
        # ONE device dispatch with ONE packed result array, where the
        # launch/finish path pays per-array tunnel round trips (~11-18 ms
        # each through the remote device)
        with trace("exec.search"):
            return self.search_batch(
                [query], k=k, scorer=scorer, stats=stats, df_of=df_of
            )[0]

    def search_many(
        self,
        queries: Sequence,
        k: int = 10,
        scorer: str = "bm25",
        stats=None,
        df_of=None,
    ) -> List[List[SearchResult]]:
        """Multi-query execution (the serving-loop analog of the
        reference's per-source std::async fan-out, exec.h:132-154 — but
        over the query axis). Delegates to search_batch: one combined
        device program with one packed result beats per-query async
        dispatch through the tunnel (each dispatch/fetch pays a fixed
        ~11-18 ms round trip). Cross-SOURCE pipelining still uses
        launch()/finish()."""
        return self.search_batch(queries, k=k, scorer=scorer, stats=stats,
                                 df_of=df_of)

    def search_pruned(
        self,
        query,
        k: int = 10,
        scorer: str = "bm25",
        chunk_windows: int = 16,
        stats=None,
        df_of=None,
    ) -> List[SearchResult]:
        """Block-max pruned top-k (the WAND/skip-based-pruning analog,
        BASELINE config #2; reference cost-ordered lazy advancement,
        docset_iterators.h:38-60). Exact results: a per-window score upper
        bound is computed from per-block max frequencies; windows are
        evaluated in descending-bound chunks and evaluation stops once the
        running k-th score strictly exceeds every remaining window's bound.

        A single query is a pruned batch of one: the batch path shares the
        tape-independent flat chunk evaluator and the generalized bounds
        (phrases fall back to search_batch inside it)."""
        return self.search_pruned_batch(
            [query], k, scorer, chunk_windows, stats, df_of
        )[0]

    def search_pruned_batch(
        self,
        queries: Sequence,
        k: int = 10,
        scorer: str = "bm25",
        chunk_windows: int = 16,
        stats=None,
        df_of=None,
    ) -> List[List[SearchResult]]:
        """Batched block-max pruned top-k: pruning composed with the batch
        axis. Queries group by tape shape (like search_batch); each group
        evaluates windows in ONE SHARED order — descending cross-query max
        upper bound — in chunks, with per-query exact stop conditions
        (theta_q strictly beats every window the group hasn't evaluated
        yet). Queries that resolve early zero their cells in later rounds
        so their decode work vanishes. Shapes without a tight bound (any
        non-flat tape, phrases) fall back to search_batch. Results are
        exact and identical to search_batch's."""
        jax, jnp = _lazy_jax()
        from trinity_tpu.config import get_config
        from trinity_tpu.ops.postings import compute_cells

        seg = self.seg
        W = seg.n_windows
        model = SIMILARITIES[scorer]
        docs_cnt = stats.docs_cnt if stats else seg.stats.docs_cnt
        if df_of is None:
            df_of = lambda t: (
                int(seg.term_df[seg.term_id(t)]) if seg.term_id(t) >= 0 else 0
            )
        parsed = []
        for q in queries:
            if isinstance(q, str):
                root, plan = _plan_for_text(q)
            else:
                root = q.root if isinstance(q, Query) else q
                plan = compile_plan(root) if root is not None else None
            parsed.append(plan)
        groups: dict = {}
        fallback_idx = []
        for qi, plan in enumerate(parsed):
            if plan is None:
                continue
            if plan.has_phrase or _tape_matches_empty(plan.tape):
                # phrase: no verification machinery here; matches-empty
                # (all-optional / pure-negation / kmin=0): WAND presence is
                # unsound and padding-duplicate windows would surface as
                # score-0 matches — both run dense, exactly.
                fallback_idx.append(qi)
                continue
            key = plan.tape
            # flat shapes share ONE tape-independent pruned program per
            # (T, B) bucket (no slot cap: this path materializes tiles)
            if USE_FLAT and _flatten_tape(key, plan.n_slots) is not None:
                key = ("flat", _pad_T(plan.n_slots))
            groups.setdefault(key, []).append((qi, plan))
        results: List[Optional[List[SearchResult]]] = [None] * len(parsed)
        if fallback_idx:
            fb = self.search_batch(
                [queries[qi] for qi in fallback_idx], k, scorer, stats, df_of
            )
            for qi, res in zip(fallback_idx, fb):
                results[qi] = res
        buckets = get_config().batch_buckets
        for key, members in groups.items():
            is_flat = key[0] == "flat"
            T = key[1] if is_flat else _pad_T(members[0][1].n_slots)
            B = _pick_bucket(buckets, len(members))
            nb = len(members)
            cs = np.zeros((W, B * T), np.int32)
            cn = np.zeros((W, B * T), np.int32)
            if is_flat:
                weights = np.zeros((B, T), np.float32)
                gflags = np.zeros((B, T), np.int32)
                gkmin = np.full(B, T + 1, np.int32)
            else:
                nw = len(members[0][1].weight_terms)
                weights = np.zeros((B, nw), np.float32)
            ub = np.zeros((B, W), np.float32)
            for bi, (qi, plan) in enumerate(members):
                tids = [seg.term_id(t) for t in plan.term_texts]
                c_s, c_n = compute_cells(seg, tids)
                cs[:, bi * T : bi * T + plan.n_slots] = c_s
                cn[:, bi * T : bi * T + plan.n_slots] = c_n
                wrow = [
                    model.weight([df_of(t) for t in terms], docs_cnt)
                    for terms in plan.weight_terms
                ]
                if is_flat:
                    fl, wsel, km = _flatten_tape(plan.tape, plan.n_slots)
                    gflags[bi, : plan.n_slots] = fl
                    gkmin[bi] = km
                    for s, wi in enumerate(wsel):
                        if wi >= 0:
                            weights[bi, s] = wrow[wi]
                else:
                    weights[bi] = wrow
                # the WAND bound always uses the member's OWN tape; weights
                # must be the f32 values the kernel scores with, and the
                # bound accumulates in f32 tree order (see
                # _tape_window_bounds) so no rounding can put it under an
                # achievable tie score -> wrongful early resolve
                ub[bi], _ = _tape_window_bounds(
                    seg, plan.tape, cs, cn, np.asarray(wrow, np.float32),
                    model, col=lambda ti, b=bi: b * T + ti,
                )
                # pad for the <=2-ulp/leaf device-vs-host score drift (XLA
                # FMA contraction, the engine-vs-oracle invariant): the
                # strict-< tie guard stays sound even when the kernel's
                # leaf score rounds above the host-computed leaf bound
                ub[bi] *= np.float32(1.0 + 6e-7 * max(1, plan.n_slots))
            order = np.argsort(-ub.max(axis=0), kind="stable").astype(np.int32)
            if is_flat:
                fn_flat = _build_pruned_flat_batch_fn(
                    scorer, chunk_windows, T, B, k, self.interpret
                )
                fj, kj = jnp.asarray(gflags), jnp.asarray(gkmin)
                fn = lambda bm, pl_, c1, c2, sp, wt, nd, dl: fn_flat(
                    bm, pl_, c1, c2, sp, wt, fj, kj, nd, dl
                )
            else:
                fn = _build_pruned_batch_fn(
                    key, scorer, chunk_windows, T, B, k, self.interpret
                )
            acc_v = [np.zeros(0, np.float32) for _ in range(B)]
            acc_i = [np.zeros(0, np.int64) for _ in range(B)]
            resolved = np.zeros(B, bool)
            resolved[nb:] = True  # padding lanes
            for c0 in range(0, W, chunk_windows):
                if resolved.all():
                    break
                rest = order[c0:]
                for bi in range(nb):
                    if resolved[bi] or len(acc_v[bi]) < k:
                        continue
                    if ub[bi, rest].max(initial=0.0) < acc_v[bi][k - 1]:
                        resolved[bi] = True  # strict: ties could still win
                if resolved.all():
                    break
                sel = order[c0 : c0 + chunk_windows]
                pad = chunk_windows - len(sel)
                # pad with a window FROM THIS CHUNK (a window outside it may
                # have been evaluated already — re-evaluating would duplicate
                # its docs); ascending sort: flat index order = docid order
                selp = np.sort(np.pad(sel, (0, pad), mode="edge"))
                csel = cs[selp]
                nsel = cn[selp].copy()
                if pad:
                    dup = np.zeros(len(selp), bool)
                    dup[1:] = selp[1:] == selp[:-1]
                    nsel[dup] = 0  # each duplicated window decodes once
                for bi in np.flatnonzero(resolved[:nb]):
                    nsel[:, bi * T : (bi + 1) * T] = 0
                from trinity_tpu.utils.metrics import get_metrics

                get_metrics().count("pruned.rounds")
                packed = np.asarray(
                    jax.device_get(
                        fn(
                            self.bmeta, self.planes,
                            jnp.asarray(csel), jnp.asarray(nsel),
                            jnp.asarray(selp), jnp.asarray(weights),
                            np.int32(seg.n_docs), self._deleted,
                        )
                    )
                )
                gv, gi = packed[:B], packed[B:].astype(np.int64)
                for bi in range(nb):
                    if resolved[bi]:
                        continue
                    keep = gv[bi] > NEG_INF
                    acc_v[bi] = np.concatenate([acc_v[bi], gv[bi][keep]])
                    acc_i[bi] = np.concatenate([acc_i[bi], gi[bi][keep]])
                    o = np.lexsort((acc_i[bi], -acc_v[bi]))
                    acc_v[bi] = acc_v[bi][o][: 2 * k]
                    acc_i[bi] = acc_i[bi][o][: 2 * k]
            for bi, (qi, plan) in enumerate(members):
                results[qi] = [
                    SearchResult(int(seg.doc_map[i]), float(v))
                    for v, i in zip(acc_v[bi][:k], acc_i[bi][:k])
                ]
        return [r if r is not None else [] for r in results]

    def search_batch(
        self,
        queries: Sequence,
        k: int = 10,
        scorer: str = "bm25",
        stats=None,
        df_of=None,
    ) -> List[List[SearchResult]]:
        """Batched execution: queries are grouped by plan shape, padded to a
        batch bucket, and the whole batch runs as ONE device program (one
        host->device round trip). launch_batch/finish_batch expose the
        async halves so a serving loop can pipeline consecutive batches
        (dispatch N+1 while N executes — the per-batch tunnel round trip
        then overlaps device compute)."""
        return self.finish_batch(
            self.launch_batch(queries, k, scorer, stats, df_of)
        )

    def launch_batch(
        self,
        queries: Sequence,
        k: int = 10,
        scorer: str = "bm25",
        stats=None,
        df_of=None,
    ):
        """Plan, group and DISPATCH a batch without waiting; returns an
        opaque handle for finish_batch. The combined program is in flight
        (or queued) when this returns."""
        jax, jnp = _lazy_jax()
        import time as _time

        from trinity_tpu.ops.postings import compute_cells
        from trinity_tpu.utils.metrics import get_metrics
        from trinity_tpu.utils.timings import trace

        _t0 = _time.perf_counter()
        _m = get_metrics()
        _m.count("search.queries", len(queries))
        seg = self.seg
        parsed = []
        plans = []
        with trace("exec.prepare"):
            for q in queries:
                if isinstance(q, str):
                    root, plan = _plan_for_text(q)
                else:
                    root = q.root if isinstance(q, Query) else q
                    plan = compile_plan(root) if root is not None else None
                parsed.append(root)
                plans.append(plan)
        model = SIMILARITIES[scorer]
        docs_cnt = stats.docs_cnt if stats else seg.stats.docs_cnt
        if df_of is None:
            df_of = lambda t: (
                int(seg.term_df[seg.term_id(t)]) if seg.term_id(t) >= 0 else 0
            )

        groups: dict = {}
        phrase_groups: dict = {}
        order = []
        for qi, root in enumerate(parsed):
            if root is None:
                order.append(None)
                continue
            plan = plans[qi]
            key = plan.tape
            if plan.has_phrase:
                gk = key
                if key[0] == "phrase":
                    if self._posmask_enabled:
                        # the dense posmask path has no per-query cost
                        # ladder — every same-shape phrase shares a group
                        gk = (key, "pos")
                    else:
                        # split lazy-phrase groups by per-query C2 bucket:
                        # the verify cost is C2-proportional, so rare
                        # bigrams must not share a group (and its max C2)
                        # with stopword ones
                        gk = (key, _phrase_group_c2(df_of, plan, key[1], k))
                phrase_groups.setdefault(gk, []).append((qi, plan))
            else:
                # flat boolean shapes share ONE tape-independent program
                # per (T, B) bucket (structure rides as data) — different
                # shapes (AND/NOT/OR/k-of-n) of one T bucket merge into a
                # single kernel instance and a single compile variant
                T = _pad_T(plan.n_slots)
                if (
                    USE_FLAT
                    and T <= FUSED_MAX_SLOTS
                    and _flatten_tape(key, plan.n_slots) is not None
                ):
                    key = ("flat", T)
                groups.setdefault(key, []).append((qi, plan))
            order.append(("group", key))

        results: List[Optional[List[SearchResult]]] = [None] * len(parsed)
        from trinity_tpu.config import get_config

        buckets = get_config().batch_buckets
        # every group of the batch folds into ONE combined device program
        # with ONE packed output (see _build_batch_combined — per-dispatch
        # and per-fetched-array tunnel round trips dominated batch wall
        # time); only compound-phrase groups needing host verification run
        # separately.
        spec_entries = []
        flat_inputs = []
        group_meta = []
        pending = []
        for key, members in groups.items():
            is_flat = key[0] == "flat"
            T = key[1] if is_flat else _pad_T(members[0][1].n_slots)
            B = _pick_bucket(buckets, len(members))
            cs = np.zeros((seg.n_windows, B * T), np.int32)
            cn = np.zeros((seg.n_windows, B * T), np.int32)
            cids = np.full(B * T, -1, np.int32)
            if is_flat:
                # per-SLOT weights + structure-as-data (flags, kmin); pad
                # rows get kmin = T+1 so they match nothing (NEG_INF rows)
                weights = np.zeros((B, T), np.float32)
                gflags = np.zeros((B, T), np.int32)
                gkmin = np.full(B, T + 1, np.int32)
            else:
                nw = len(members[0][1].weight_terms)
                weights = np.zeros((B, nw), np.float32)
            for bi, (qi, plan) in enumerate(members):
                tids = [seg.term_id(t) for t in plan.term_texts]
                c_s, c_n = compute_cells(seg, tids)
                cs[:, bi * T : bi * T + plan.n_slots] = c_s
                cn[:, bi * T : bi * T + plan.n_slots] = c_n
                cids[bi * T : bi * T + plan.n_slots] = self._cids_for(
                    tids, plan.n_slots
                )
                wrow = [
                    model.weight([df_of(t) for t in terms], docs_cnt)
                    for terms in plan.weight_terms
                ]
                if is_flat:
                    fl, wsel, km = _flatten_tape(plan.tape, plan.n_slots)
                    gflags[bi, : plan.n_slots] = fl
                    gkmin[bi] = km
                    for s, wi in enumerate(wsel):
                        if wi >= 0:
                            weights[bi, s] = wrow[wi]
                else:
                    weights[bi] = wrow
            if is_flat:
                spec_entries.append(("flat", T, B))
                flat_inputs += [cs, cn, weights, gflags, gkmin, cids]
                group_meta.append((members, "flat", B, None))
            else:
                kind = (
                    "fused" if _fused_used_slots(key) is not None else "dense"
                )
                spec_entries.append((kind, key, T, B))
                flat_inputs += [cs, cn, weights]
                if kind == "fused":
                    flat_inputs.append(cids)
                group_meta.append((members, kind, B, None))
        for gk, members in phrase_groups.items():
            key = gk[0] if isinstance(gk[0], tuple) else gk  # strip C2 part
            prep = None
            if key[0] == "phrase" and self._posmask_enabled:
                prep = self._prep_phrase_pos(
                    key, members, k, scorer, model, docs_cnt, df_of
                )
                if prep is not None:
                    spec, arrays = prep
                    spec_entries.append(spec)
                    flat_inputs += list(arrays)
                    group_meta.append((members, "posph", spec[3], None))
                    continue
            prep = (
                self._prep_phrase_lazy(
                    key, members, k, scorer, model, docs_cnt, df_of
                )
                if key[0] == "phrase"
                else None
            )
            if prep is not None:
                spec, (cs, cn, weights), ctx = prep
                spec_entries.append(spec)
                flat_inputs += [cs, cn, weights]
                group_meta.append((members, "lazyph", spec[3], ctx))
            else:
                out = self._run_phrase_batch(
                    key, members, k, scorer, model, docs_cnt, df_of
                )
                pending.append((members, out))
        packed_dev = None
        if spec_entries:
            # ONE transfer per dtype: the r5 launch profile measured ~38
            # small per-group device_puts at ~37 ms of the ~41 ms host-side
            # launch cost — concatenated here, re-sliced in-program (the
            # layout is part of the program key, so variants are unchanged)
            i_parts, f_parts, lay = [], [], []
            for a in flat_inputs:
                if a.dtype == np.float32:
                    f_parts.append(a.ravel())
                    lay.append(("f4", a.shape))
                else:
                    i_parts.append(np.asarray(a, np.int32).ravel())
                    lay.append(("i4", a.shape))
            layout = tuple(lay)
            ibuf = (
                np.concatenate(i_parts) if i_parts else np.zeros(1, np.int32)
            )
            fbuf = (
                np.concatenate(f_parts) if f_parts else np.zeros(1, np.float32)
            )
            fn = _build_batch_combined(
                tuple(spec_entries), layout, scorer, seg.n_windows, k,
                self.interpret,
            )
            # pass the posmask cache only when a posph entry reads it: the
            # cache array's SHAPE is part of the jit signature, and feeding
            # it to cache-free programs would fork every variant on
            # build-state (a warmup-coverage hazard)
            needs_pos_cache = any(
                e[0] == "posph" and e[7] for e in spec_entries
            )
            pplanes = self.pos_planes if needs_pos_cache else _pos_dummy()
            packed_dev = fn(  # async dispatch — no blocking here
                self.bmeta, self.planes, self.tf_planes, self.hit_pw,
                self.hit_off, self.hit_goff, pplanes,
                np.int32(seg.n_docs),
                self._deleted_tiles, self._deleted,
                jnp.asarray(ibuf), jnp.asarray(fbuf),
            )
        return (packed_dev, group_meta, pending, results, _t0)

    def finish_batch(self, handle) -> List[List[SearchResult]]:
        """Block on a launch_batch handle and materialize results."""
        jax, _ = _lazy_jax()
        import time as _time

        from trinity_tpu.utils.metrics import get_metrics
        from trinity_tpu.utils.timings import trace

        packed_dev, group_meta, pending, results, _t0 = handle
        seg = self.seg
        if packed_dev is not None:
            with trace("exec.device"):
                packed = np.asarray(jax.device_get(packed_dev))
            off = 0
            for members, kind, B, ctx in group_meta:
                gv = packed[off : off + B]
                gi = packed[off + B : off + 2 * B].astype(np.int64)
                off += 2 * B
                if kind == "lazyph":
                    resolved = packed[off : off + B, 0] > 0.5
                    off += B
                    gv, gi = self._finish_phrase_lazy(ctx, gv, gi, resolved)
                pending.append((members, (gv, gi)))
        for members, out in pending:
            gv, gi = jax.device_get(out)
            for bi, (qi, plan) in enumerate(members):
                res = []
                for v, i in zip(gv[bi], gi[bi]):
                    if v == NEG_INF:
                        break
                    res.append(SearchResult(int(seg.doc_map[i]), float(v)))
                results[qi] = res
        get_metrics().observe_us(
            "search.batch_latency", (_time.perf_counter() - _t0) * 1e6
        )
        return [r if r is not None else [] for r in results]

    def match_ids(self, query, scorer: str = "trivial", doc_set=None) -> np.ndarray:
        """DocumentsOnly execution (exec.h:12-23): matching app doc ids asc.
        doc_set: optional app docid restriction (VectorIDs analog)."""
        if doc_set is not None:
            saved = self._doc_set_masks(doc_set)
            try:
                return self.match_ids(query, scorer)
            finally:
                self._restore_masks(saved)
        prep = self._prepare(query, scorer)
        if prep is None:
            return np.zeros(0, np.uint32)
        plan, cs, cn, weights = prep
        seg = self.seg
        if plan.has_phrase:
            mask = np.asarray(
                self._run_phrase(plan, cs, cn, weights, scorer, 0, "docs")
            )
        else:
            fn = _build_search_fn(
                plan.tape,
                scorer,
                seg.n_windows,
                _pad_T(plan.n_slots),
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

    # ------------------------------------------------------- phrase path
    def _prep_phrase_pos(self, key, members, k, scorer, model, docs_cnt,
                         df_of):
        """Prep for the dense positional-bitmask phrase path: dedup the
        group's member terms (stopwords repeat across queries — each term's
        mask scatters ONCE per batch), compute cell tables + per-cell plane
        row starts, and size the kernel's static DMA buckets. Returns
        (spec_entry, arrays) or None when a member's per-cell positions
        exceed the largest DMA bucket (the candidate ladder then runs)."""
        from trinity_tpu.config import get_config
        from trinity_tpu.ops.posmask import GOFF_ROWS, RPOS_BUCKETS
        from trinity_tpu.ops.postings import compute_cells

        seg = self.seg
        W = seg.n_windows
        slots = key[1]
        K = len(slots)
        if k < 1 or K < 2:
            return None
        buckets = get_config().batch_buckets
        B = _pick_bucket(buckets, len(members))
        tid_list: list = []
        tid_index: dict = {}
        memidx = np.zeros((B, K), np.int32)
        weights = np.zeros(B, np.float32)
        for bi, (qi, plan) in enumerate(members):
            for ki, s in enumerate(slots):
                tid = seg.term_id(plan.term_texts[s])
                mk = tid_index.get(tid)
                if mk is None:
                    mk = len(tid_list)
                    tid_index[tid] = mk
                    tid_list.append(tid)
                memidx[bi, ki] = mk
            weights[bi] = model.weight(
                [df_of(t) for t in plan.weight_terms[key[2]]], docs_cnt
            )
        m_real = len(tid_list)
        M = _pick_bucket(get_config().term_buckets, m_real)
        # hot posmask cache: cached members' cells are ZEROED (the kernel
        # skips them) and their planes come from pos_planes via cidx
        if self._pos_hot:
            self._ensure_pos_planes()  # may prune _pos_hot — before cidx
        cidx = np.full(M, -1, np.int32)
        for mi, tid in enumerate(tid_list):
            cidx[mi] = self._pos_hot.get(int(tid), -1)
        cached = bool((cidx >= 0).any())
        c_s, c_n = compute_cells(seg, tid_list)
        cs = np.zeros((W, M), np.int32)
        cn = np.zeros((W, M), np.int32)
        cs[:, :m_real] = c_s
        cn[:, :m_real] = c_n
        cn[:, np.flatnonzero(cidx >= 0)] = 0  # cached: no scatter
        if not cached and not cn.any():
            # no member has a single postings block on this segment (empty
            # shard / mask-only generation) and nothing is cached: the
            # kernel would score all-zero masks. Route to the ladder path,
            # which short-circuits empties (r4 regression guard).
            return None
        # per-cell plane-row starts (host precompute lets the kernel issue
        # all four DMAs in one wave — no serialized meta->planes chain)
        dpr, ppr, gor, need_pos, need_goff = self._pos_cell_rows(cs, cn)
        rpos = None
        for rb in RPOS_BUCKETS:
            if need_pos <= rb and need_goff <= GOFF_ROWS[rb]:
                rpos = rb
                break
        if rpos is None:
            from trinity_tpu.utils.metrics import get_metrics

            get_metrics().count("phrase.posmask_overflow")
            return None
        spec = (
            "posph", K, M, B, self._pw_words, rpos, GOFF_ROWS[rpos], cached
        )
        return spec, (cs, cn, dpr, ppr, gor, memidx, cidx, weights)

    def _prep_phrase_lazy(self, key, members, k, scorer, model, docs_cnt,
                          df_of):
        """First half of the fused lazy phrase path: cell tables, weights,
        C2 sizing. Returns (spec_entry, (cs, cn, weights), ctx) when the
        group can run as ONE device program (all member fcaps on the
        ladder), else None — the caller then uses the host-verify path.
        spec_entry keys _build_batch_combined; ctx feeds
        _finish_phrase_lazy."""
        from trinity_tpu.config import get_config
        from trinity_tpu.ops.postings import compute_cells

        seg = self.seg
        W = seg.n_windows
        plan0 = members[0][1]
        T = _pad_T(plan0.n_slots)
        slots = key[1]
        fcaps_t = self._phrase_fcaps(tuple(p for _, p in members), (slots,))
        if fcaps_t is None or k < 1:
            return None
        buckets = get_config().batch_buckets
        B = _pick_bucket(buckets, len(members))
        cs = np.zeros((W, B * T), np.int32)
        cn = np.zeros((W, B * T), np.int32)
        weights = np.zeros(B, np.float32)
        for bi, (qi, plan) in enumerate(members):
            tids = [seg.term_id(t) for t in plan.term_texts]
            c_s, c_n = compute_cells(seg, tids)
            cs[:, bi * T : bi * T + plan.n_slots] = c_s
            cn[:, bi * T : bi * T + plan.n_slots] = c_n
            weights[bi] = model.weight(
                [df_of(t) for t in plan.weight_terms[key[2]]], docs_cnt
            )
        C2 = get_config().phrase_lazy_candidates
        # The conjunction count is bounded by the rarest member's SEGMENT
        # df (exact, no window granularity): a C2 at least that large makes
        # overflow impossible, and the whole candidate pipeline (selection,
        # gathers, verify) shrinks with it.
        total_bound = 0
        for bi, (qi, plan) in enumerate(members):
            dfs = []
            for s in slots:
                tid = seg.term_id(plan.term_texts[s])
                dfs.append(int(seg.term_df[tid]) if tid >= 0 else 0)
            total_bound = max(total_bound, min(dfs))
        C2 = _pick_c2(total_bound, C2, k)
        # C2 >= the largest min-member-df in the group bounds every
        # conjunction count: overflow is impossible and the selection's
        # threshold search compiles away (ops/select.py)
        no_overflow = total_bound <= C2
        spec = ("lazyph", slots, T, B, C2, fcaps_t[0], no_overflow)
        ctx = (members, T, model, docs_cnt, df_of, scorer, k)
        return spec, (cs, cn, weights), ctx

    def _dense_phrase_fallback(self, plan, T, model, docs_cnt, df_of,
                               scorer, k):
        """Per-query dense execution (rare: bound order unresolved)."""
        from trinity_tpu.ops.postings import compute_cells

        jax, jnp = _lazy_jax()
        seg = self.seg
        c_s, c_n = compute_cells(seg, [seg.term_id(t) for t in plan.term_texts])
        pad = T - plan.n_slots
        if pad:
            c_s = np.pad(c_s, ((0, 0), (0, pad)))
            c_n = np.pad(c_n, ((0, 0), (0, pad)))
        wvec = np.array(
            [
                model.weight([df_of(t) for t in terms], docs_cnt)
                for terms in plan.weight_terms
            ],
            np.float32,
        )
        return jax.device_get(
            self._run_phrase(
                plan, jnp.asarray(c_s), jnp.asarray(c_n),
                jnp.asarray(wvec), scorer, k, "search",
            )
        )

    def _finish_phrase_lazy(self, ctx, gv, gi, resolved):
        """Apply the rare dense fallbacks for unresolved queries."""
        from trinity_tpu.utils.metrics import get_metrics

        members, T, model, docs_cnt, df_of, scorer, k = ctx
        out_v = gv.astype(np.float32)
        out_i = gi.astype(np.int64)
        for bi, (qi, plan) in enumerate(members):
            if not resolved[bi]:
                get_metrics().count("phrase.dense_fallback")
                fv, fi = self._dense_phrase_fallback(
                    plan, T, model, docs_cnt, df_of, scorer, k
                )
                nkeep = min(len(fv), k)
                out_v[bi] = NEG_INF
                out_v[bi, :nkeep] = fv[:nkeep]
                out_i[bi, :nkeep] = fi[:nkeep]
        return out_v, out_i

    def _run_phrase_lazy_batch(self, key, members, k, scorer, model, docs_cnt, df_of):
        """Lazy bound-ordered execution for single-phrase queries (the
        dominant phrase shape): candidates rank on device by the phrase-score
        upper bound (min member freq — phrase freq can't exceed it); the host
        verifies positions in bound order and stops once the k-th verified
        score strictly beats every remaining bound. Pulls kilobytes instead
        of the padded (B, W, C) candidate tensors."""
        from trinity_tpu.config import get_config
        from trinity_tpu.exec.phrases import verify_phrase_candidates
        from trinity_tpu.ops.postings import compute_cells

        jax, jnp = _lazy_jax()
        seg = self.seg
        W = seg.n_windows
        plan0 = members[0][1]
        T = _pad_T(plan0.n_slots)
        slots = key[1]
        kk = len(slots)
        prep = self._prep_phrase_lazy(
            key, members, k, scorer, model, docs_cnt, df_of
        )
        if prep is not None:
            # fully-fused: bound-ranked candidates verified ON DEVICE in
            # the same program; host only reads back (gv, gi, resolved).
            spec, (cs, cn, weights), ctx = prep
            _, _, _, B, C2, fcaps, noov = spec
            fn = _build_phrase_lazy_fused(
                slots, W, T, B, C2, fcaps, scorer, k, self.interpret,
                no_overflow=noov,
            )
            gv, gi, resolved = (
                np.asarray(x)
                for x in jax.device_get(
                    fn(
                        self.bmeta, self.planes,
                        jnp.asarray(cs), jnp.asarray(cn),
                        self.hit_pw, self.hit_off, jnp.asarray(weights),
                        np.int32(seg.n_docs), self._deleted,
                    )
                )
            )
            return self._finish_phrase_lazy(ctx, gv, gi, resolved)
        from trinity_tpu.utils.metrics import get_metrics

        get_metrics().count("phrase.host_verify")
        buckets = get_config().batch_buckets
        B = _pick_bucket(buckets, len(members))
        cs = np.zeros((W, B * T), np.int32)
        cn = np.zeros((W, B * T), np.int32)
        weights = np.zeros(B, np.float32)
        for bi, (qi, plan) in enumerate(members):
            tids = [seg.term_id(t) for t in plan.term_texts]
            c_s, c_n = compute_cells(seg, tids)
            cs[:, bi * T : bi * T + plan.n_slots] = c_s
            cn[:, bi * T : bi * T + plan.n_slots] = c_n
            weights[bi] = model.weight(
                [df_of(t) for t in plan.weight_terms[key[2]]], docs_cnt
            )
        C2 = get_config().phrase_lazy_candidates

        fn = _build_phrase_lazy_a(slots, W, T, B, C2, self.interpret)
        gids, bounds, pf, po, overflow = (
            np.asarray(x)
            for x in jax.device_get(
                fn(self.bmeta, self.planes, jnp.asarray(cs), jnp.asarray(cn))
            )
        )
        out_v = np.full((B, k), NEG_INF, np.float32)
        out_i = np.zeros((B, k), np.int64)
        deleted = self._deleted_np
        for bi, (qi, plan) in enumerate(members):
            acc_v = np.zeros(0, np.float32)
            acc_i = np.zeros(0, np.int64)
            n_valid = int((bounds[bi] > 0).sum())
            chunk = 2048
            resolved = n_valid == 0
            for c0 in range(0, n_valid, chunk):
                hi = min(c0 + chunk, n_valid)
                pfreq = verify_phrase_candidates(
                    seg.positions,
                    np.ones(hi - c0, bool),
                    pf[bi, c0:hi],
                    po[bi, c0:hi],
                )
                g = gids[bi, c0:hi].astype(np.int64)
                keep = pfreq > 0
                if deleted is not None:
                    keep &= ~deleted[g]
                sc = model.score_tile(
                    pfreq[keep].astype(np.float32), np.float32(weights[bi])
                ).astype(np.float32)
                acc_v = np.concatenate([acc_v, sc])
                acc_i = np.concatenate([acc_i, g[keep]])
                order = np.lexsort((acc_i, -acc_v))[: 2 * k]
                acc_v, acc_i = acc_v[order], acc_i[order]
                if hi == n_valid:
                    # all pulled candidates verified; exact unless truncated
                    resolved = not (bool(overflow[bi]) or n_valid >= C2)
                elif len(acc_v) >= k:
                    theta = acc_v[k - 1]
                    next_bound = float(
                        model.score_tile(
                            np.float32(bounds[bi, hi]), np.float32(weights[bi])
                        )
                    )
                    if next_bound < theta:
                        resolved = True
                        break
            if not resolved:
                # bound order didn't resolve within the pulled candidates:
                # dense fallback for this query alone (rare)
                gv, gi = self._dense_phrase_fallback(
                    plan, T, model, docs_cnt, df_of, scorer, k
                )
                nkeep = min(len(gv), k)
                out_v[bi, :nkeep] = gv[:nkeep]
                out_i[bi, :nkeep] = gi[:nkeep]
                continue
            nkeep = min(len(acc_v), k)
            out_v[bi, :nkeep] = acc_v[:nkeep]
            out_i[bi, :nkeep] = acc_i[:nkeep]
        return out_v, out_i

    def _run_phrase_batch(self, key, members, k, scorer, model, docs_cnt, df_of):
        """Batched phrase execution for one tape-shape group: device pass A
        (B queries, candidates per phrase), one host verification pass over
        all candidates, device pass C — three round trips for the whole
        group instead of per query. Single-phrase tapes take the lazy
        bound-ordered path instead."""
        if key[0] == "phrase":
            return self._run_phrase_lazy_batch(
                key, members, k, scorer, model, docs_cnt, df_of
            )
        from trinity_tpu.config import get_config
        from trinity_tpu.exec.phrases import (
            collect_phrases,
            verify_phrase_candidates,
        )
        from trinity_tpu.ops.postings import compute_cells

        jax, jnp = _lazy_jax()
        seg = self.seg
        W = seg.n_windows
        plan0 = members[0][1]
        T = _pad_T(plan0.n_slots)
        phrases = collect_phrases(key)
        phrase_slots = tuple(slots for slots, _ in phrases)
        nw = len(plan0.weight_terms)
        buckets = get_config().batch_buckets
        B = _pick_bucket(buckets, len(members))
        cs = np.zeros((W, B * T), np.int32)
        cn = np.zeros((W, B * T), np.int32)
        weights = np.zeros((B, nw), np.float32)
        for bi, (qi, plan) in enumerate(members):
            tids = [seg.term_id(t) for t in plan.term_texts]
            c_s, c_n = compute_cells(seg, tids)
            cs[:, bi * T : bi * T + plan.n_slots] = c_s
            cn[:, bi * T : bi * T + plan.n_slots] = c_n
            weights[bi] = [
                model.weight([df_of(t) for t in terms], docs_cnt)
                for terms in plan.weight_terms
            ]
        fcaps = self._phrase_fcaps(
            tuple(plan for _, plan in members), phrase_slots
        )
        if fcaps is not None:
            bound = max(
                (
                    _phrase_c_bound(
                        cn, phrase_slots, col=lambda s, b=bi: b * T + s
                    )
                    for bi in range(len(members))
                ),
                default=0,
            )
            C = _phrase_c_bucket(bound)
            fn = _build_phrase_batch_fused(
                key, scorer, W, T, B, k, C, phrase_slots, fcaps,
                self.interpret,
            )
            _, res = fn(
                self.bmeta, self.planes, jnp.asarray(cs), jnp.asarray(cn),
                self.hit_pw, self.hit_off, jnp.asarray(weights),
                np.int32(seg.n_docs), self._deleted,
            )
            return res
        from trinity_tpu.utils.metrics import get_metrics

        get_metrics().count("phrase.host_verify")
        C = min(get_config().phrase_candidate_cap, WINDOW_SIZE)
        while True:
            fa = _build_phrase_batch_a(phrase_slots, W, T, B, C, self.interpret)
            freq, per_phrase = fa(
                self.bmeta, self.planes, jnp.asarray(cs), jnp.asarray(cn)
            )
            max_cnt = max(
                int(np.asarray(cnt).max(initial=0))
                for _, _, cnt, _, _ in per_phrase
            )
            if max_cnt <= C or C >= WINDOW_SIZE:
                break
            C = WINDOW_SIZE
        phrase_ids, phrase_freqs = [], []
        for slots, (ki, valid, cnt, pf, po) in zip(phrase_slots, per_phrase):
            kk = len(slots)
            valid_h = np.asarray(valid).reshape(-1)
            pf_h = np.asarray(pf).reshape(-1, kk)
            po_h = np.asarray(po).reshape(-1, kk)
            pfreq = verify_phrase_candidates(seg.positions, valid_h, pf_h, po_h)
            vals = pfreq.reshape(B, W, C).astype(np.float32) * np.asarray(valid)
            phrase_ids.append(ki)
            phrase_freqs.append(jnp.asarray(vals))
        fc = _build_phrase_batch_c(
            key, scorer, W, T, B, k, C, len(phrases), self.interpret
        )
        return fc(
            freq,
            phrase_ids,
            phrase_freqs,
            jnp.asarray(weights),
            np.int32(seg.n_docs),
            self._deleted,
        )

    def _term_max_freq(self, text: str) -> int:
        """Segment-wide max per-doc freq of a term (from block_max_freq, the
        WAND bound array) — sizes the device verifier's position gathers."""
        mf = self._max_freq_cache.get(text)
        if mf is None:
            seg = self.seg
            tid = seg.term_id(text)
            mf = 1
            if tid >= 0:
                s, n = int(seg.term_block_start[tid]), int(seg.term_nblocks[tid])
                if n:
                    mf = max(1, int(seg.block_max_freq[s : s + n].max()))
            self._max_freq_cache[text] = mf
        return mf

    def _phrase_fcaps(self, plans, phrase_slots):
        """Static per-phrase member position caps for the device verifier,
        or None when a member's max freq exceeds the ladder (host-verify
        fallback) or the segment has no positions stream."""
        from trinity_tpu.exec.phrases import fcap_bucket

        if len(self.seg.hit_group_off) < 2:
            return None
        caps = []
        for slots in phrase_slots:
            mem = []
            for s in slots:
                mf = max(self._term_max_freq(p.term_texts[s]) for p in plans)
                b = fcap_bucket(mf)
                if b is None:
                    return None
                mem.append(b)
            caps.append(tuple(mem))
        return tuple(caps)

    def _phrase_search_dispatch(
        self, plan, cs, cn, weights, scorer, k, stats, df_of
    ):
        """Route a top-k phrase search. Pure-phrase tapes take the lazy
        bound-ordered path: hot phrases can have conjunction candidates in
        the tens of thousands per window, and verifying candidates in
        phrase-bound order with an early exit beats verify-everything by an
        order of magnitude (the moral analog of the reference's cost-ordered
        lazy advancement, docset_iterators.h:38-60). Compound tapes need
        every candidate's phrase freq for tape scoring -> fused program."""
        if plan.tape[0] == "phrase":
            model = SIMILARITIES[scorer]
            seg = self.seg
            docs_cnt = stats.docs_cnt if stats else seg.stats.docs_cnt
            if df_of is None:
                df_of = lambda t: (
                    int(seg.term_df[seg.term_id(t)])
                    if seg.term_id(t) >= 0
                    else 0
                )
            out_v, out_i = self._run_phrase_lazy_batch(
                plan.tape, [(0, plan)], k, scorer, model, docs_cnt, df_of
            )
            return out_v[0], out_i[0]
        return self._run_phrase(plan, cs, cn, weights, scorer, k, "search")

    def _run_phrase(self, plan, cs, cn, weights, scorer, k, mode):
        """Phrase execution. Preferred: ONE fused device program (pass A +
        on-device position verification + pass C). Fallback when a member
        term's max freq exceeds the device cap ladder: three passes with
        host position verification (pass B, exec/phrases.py)."""
        from trinity_tpu.exec.phrases import (
            collect_phrases,
            verify_phrase_candidates,
        )

        jax, jnp = _lazy_jax()
        seg = self.seg
        W = seg.n_windows
        phrases = collect_phrases(plan.tape)
        phrase_slots = tuple(slots for slots, _ in phrases)
        from trinity_tpu.config import get_config

        fcaps = self._phrase_fcaps((plan,), phrase_slots)
        if fcaps is not None:
            # C >= the exact per-window candidate bound -> pass A can never
            # overflow: ONE device call, no host sync (pipelineable)
            from trinity_tpu.ops.postings import compute_cells

            tids = [seg.term_id(t) for t in plan.term_texts]
            _, cn_h = compute_cells(seg, tids)
            C = _phrase_c_bucket(_phrase_c_bound(cn_h, phrase_slots))
            fn = _build_phrase_fused(
                plan.tape, scorer, W, _pad_T(plan.n_slots), k, C,
                phrase_slots, fcaps, self.interpret, mode,
            )
            _, res = fn(
                self.bmeta, self.planes, cs, cn,
                self.hit_pw, self.hit_off, weights,
                np.int32(seg.n_docs), self._deleted,
            )
            return res
        from trinity_tpu.utils.metrics import get_metrics

        get_metrics().count("phrase.host_verify")
        C = min(get_config().phrase_candidate_cap, WINDOW_SIZE)
        while True:
            fa = _build_phrase_pass_a(
                phrase_slots, W, _pad_T(plan.n_slots), C, self.interpret
            )
            freq, per_phrase = fa(self.bmeta, self.planes, cs, cn)
            max_cnt = max(
                int(np.asarray(cnt).max(initial=0)) for _, _, cnt, _, _ in per_phrase
            )
            if max_cnt <= C or C >= WINDOW_SIZE:
                break
            C = WINDOW_SIZE  # one growth step: bounds kernel variants

        phrase_ids = []
        phrase_freqs = []
        for slots, (ki, valid, cnt, pf, po) in zip(phrase_slots, per_phrase):
            kk = len(slots)
            valid_h = np.asarray(valid).reshape(-1)
            pf_h = np.asarray(pf).reshape(-1, kk)
            po_h = np.asarray(po).reshape(-1, kk)
            pfreq = verify_phrase_candidates(seg.positions, valid_h, pf_h, po_h)
            vals = pfreq.reshape(W, C).astype(np.float32) * np.asarray(valid)
            phrase_ids.append(ki)
            phrase_freqs.append(jnp.asarray(vals))

        fc = _build_phrase_pass_c(
            plan.tape,
            scorer,
            W,
            _pad_T(plan.n_slots),
            k,
            C,
            len(phrases),
            self.interpret,
            mode,
        )
        return fc(
            freq,
            phrase_ids,
            phrase_freqs,
            weights,
            np.int32(seg.n_docs),
            self._deleted,
        )
