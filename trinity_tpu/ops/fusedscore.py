"""Fused score kernel: decode + tape eval + similarity + window maxima in
ONE Pallas program.

The round-1 engine materialized per-term frequency tiles to HBM (stage 1)
and re-read them for tape evaluation (stage 2). Profiling on v5e showed the
per-(window, term) grid and the two HBM passes dominate boolean queries:
41 ms stage-1 + 42 ms stage-2 for a 48-query AND group, of which 30 ms was
one flat top_k over (B, W*16384).

This kernel inverts the layout: the grid is (window, query); each cell
decodes the query's term cells into VMEM scratch tiles, evaluates the
boolean tape and the similarity right there, and writes only
  - the masked score tile (B, W, 128, 128) f32, and
  - per-lane window maxima (B, W, 128) f32 (reduced over sublanes — the
    cheap reduction orientation; the caller maxes over lanes to get the
    per-window max).
HBM tile traffic drops from (T+1) writes + (T+1) reads per (w, b) to ONE
write, and the caller replaces the flat 1M-element top_k with a two-phase
EXACT selection (ops/fusedscore.py:exact_window_topk):

  top_k(window maxima) -> gather the top-kappa windows -> small flat top_k.

Exactness incl. the docid-asc tie-break: selecting kappa >= k windows by
(max desc, window asc) — lax.top_k's lowest-index tie rule — covers every
possible top-k doc: any window holding a top-k doc has max >= the k-th
score, at most k-1 windows have max strictly above it, and among equal-max
windows the lowest-index (= lowest-docid-range) ones win ties. Gathered
windows are re-sorted ascending so the flat index order stays docid order.

The reference analog of all of this is the windowed bulk driver + heap
top-k of docset_spans.cpp:98-173/681-789 — here the window IS the tile and
the heap IS lax.top_k over window maxima.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trinity_tpu.limits import TILE, WINDOW_SIZE
from trinity_tpu.models.similarity import SIMILARITIES
from trinity_tpu.ops.postings import (
    GROUP,
    GROUP_INTERPRET,
    META_PER_ROW,
    META_COLS,
    META_ROWS,
    ROWS_FIXED,
    USE_DBUF,
    _decode_cells_dbuf,
    _decode_cells_pipelined,
    dbuf_step,
)

NEG_INF = float("-inf")
NSUB = 16  # sub-blocks per window (8 sublanes = 1024 contiguous docids each)
SUB_DOCS = WINDOW_SIZE // NSUB


def tape_used_slots(tape) -> tuple:
    """Term slots a boolean tape actually reads (padding slots skipped)."""
    out = set()

    def walk(n):
        kind = n[0]
        if kind == "tok":
            out.add(n[1])
        elif kind in ("and", "or", "not"):
            walk(n[1])
            walk(n[2])
        elif kind in ("unot", "opt"):
            walk(n[1])
        elif kind == "some":
            for c in n[2]:
                walk(c)
        elif kind == "phrase":
            raise ValueError("phrase tapes use the phrase path")

    walk(tape)
    return tuple(sorted(out))


def eval_tape_tiles(tape, tiles, wsel, scorer_cls):
    """Tile-domain twin of executor._eval_tape: identical op order (oracle
    parity), freq access replaced by the decoded VMEM tiles dict."""
    kind = tape[0]
    if kind == "tok":
        _, slot, widx = tape
        f = tiles[slot]
        mask = f > 0
        score = scorer_cls.score_tile(f, wsel(widx))
        return mask, jnp.where(mask, score, 0.0)
    if kind in ("and", "or", "not"):
        _, lt, rt = tape
        lm, ls = eval_tape_tiles(lt, tiles, wsel, scorer_cls)
        rm, rs = eval_tape_tiles(rt, tiles, wsel, scorer_cls)
        if kind == "and":
            m = lm & rm
            return m, jnp.where(m, ls + rs, 0.0)
        if kind == "or":
            m = lm | rm
            return m, jnp.where(m, ls + rs, 0.0)
        m = lm & ~rm
        return m, jnp.where(m, ls, 0.0)
    if kind == "unot":
        cm, _ = eval_tape_tiles(tape[1], tiles, wsel, scorer_cls)
        z = jnp.zeros((TILE, TILE), jnp.float32)
        return ~cm, z
    if kind == "opt":
        cm, cs = eval_tape_tiles(tape[1], tiles, wsel, scorer_cls)
        return jnp.ones_like(cm) | cm, jnp.where(cm, cs, 0.0)
    if kind == "some":
        _, kmin, children = tape
        cnt = None
        tot = None
        for c in children:
            cm, cs = eval_tape_tiles(c, tiles, wsel, scorer_cls)
            ci = cm.astype(jnp.int32)
            cnt = ci if cnt is None else cnt + ci
            tot = cs if tot is None else tot + cs
        m = cnt >= kmin
        return m, jnp.where(m, tot, 0.0)
    if kind == "false":
        z = jnp.zeros((TILE, TILE), jnp.float32)
        return z > 1, z
    raise ValueError(kind)


def _qgroup(B: int, U: int, interpret: bool = False) -> int:
    """Queries decoded per grid step: larger groups amortize the per-cell
    DMA fixed cost (~3.3 us measured) across one pipelined wave of QG*U
    copies, bounded by VMEM (TWO banks of QG*U plane-scratch buffers of
    ~127 KiB each since the dbuf schedule: cap QG*U <= 16, ~4 MiB + tiles;
    the QG=8-regressed datapoint below predates the second bank, so the
    effective pressure at a given QG is now ~2x it). Interpret mode caps at 2 (see
    ops/postings.py:_tgroup — XLA:CPU segfaults compiling the large
    unrolled emulation)."""
    # QG=8 measured SLOWER than 4 at U=2 (13.1 vs 11.4 ms, AND B=48 —
    # plane-scratch VMEM pressure); 4 is the sweet spot
    for qg in ((2, 1) if interpret else (4, 2, 1)):
        if B % qg == 0 and qg * max(1, U) <= (4 if interpret else 16):
            return qg
    return 1


def eval_flat_tiles(tiles, flags_of, kmin, wts_of, scorer_cls, T):
    """Data-driven twin of eval_tape_tiles for FLAT boolean shapes.

    Per-slot flags (SMEM scalars, see executor._flatten_tape): bit 1 =
    required member, bit 2 = negated member, bit 4 = optional member.
    mask = (#required present >= kmin) & (no negated present); score =
    sum of present scored (required|optional) members' scores in slot
    order. For left-leaning parse trees this reproduces _eval_tape's f32
    accumulation EXACTLY (absent/unscored slots contribute +0.0, which is
    exact for the non-negative scores): the flattener only accepts tapes
    whose tree grouping equals left-assoc slot-order accumulation.

    This is what makes the program TAPE-INDEPENDENT: any flat AND / OR /
    NOT / k-of-n / optional query of the same (T, B) bucket shares ONE
    compiled kernel — the TPU analog of the reference executing any query
    shape with zero compile cost (exec.cpp:662-666)."""
    ssum = None
    cnt = None
    negany = None
    for t in range(T):
        f = tiles[t]
        p = f > 0
        fl = flags_of(t)
        req = (fl & 1) > 0
        neg = (fl & 2) > 0
        scored = (fl & 5) > 0  # required | optional
        s = scorer_cls.score_tile(f, wts_of(t))
        contrib = jnp.where(p & scored, s, 0.0)
        ssum = contrib if ssum is None else ssum + contrib
        c = (p & req).astype(jnp.int32)
        cnt = c if cnt is None else cnt + c
        nv = p & neg
        negany = nv if negany is None else negany | nv
    mask = (cnt >= kmin) & ~negany
    return mask, jnp.where(mask, ssum, 0.0)


def _make_score_kernel(tape, used, scorer_name, T, group, with_deleted, QG,
                       nBG, flat=False):
    scorer_cls = SIMILARITIES[scorer_name]
    U = len(used)

    def kernel(cs_ref, cn_ref, wbase_ref, nd_ref, wts_ref, *pre_rest):
        if flat:
            flags_ref, kmin_ref, cids_ref = pre_rest[:3]
            bmeta_ref, planes_ref, tfp_ref = pre_rest[3:6]
            rest = pre_rest[6:]
        else:
            flags_ref = kmin_ref = None
            cids_ref = pre_rest[0]
            bmeta_ref, planes_ref, tfp_ref = pre_rest[1:4]
            rest = pre_rest[4:]
        if with_deleted:
            del_ref = rest[0]
            rest = rest[1:]
        else:
            del_ref = None
        out_ref, rmax_ref, tiles_s, metas_s, rowss_s, sems, csems = rest
        w = pl.program_id(0)
        bg = pl.program_id(1)
        nW = pl.num_programs(0)
        wbase = wbase_ref[w] * WINDOW_SIZE

        # hot-term plane cache: slots with cids_ref[b*T+t] >= 0 take their
        # freq tile as ONE (128, 128) DMA from the precomputed tf planes
        # (f32 values identical to a decode of the same blocks — built by
        # materialize_freq_tiles) instead of the per-cell decode chain
        # (~3.3 us fixed + ~0.15 us/block: a df~1M term costs ~22 us per
        # (query, window) to decode but ~64 KiB of HBM reads to stream).
        # Copies are issued before the decode DMAs so they overlap the
        # whole decode chain + compute; waits sit just before tape eval.
        def cids_at(bg_):
            return [
                cids_ref[(bg_ * QG + qg) * T + t]
                for qg in range(QG)
                for t in used
            ]

        cids = cids_at(bg)

        def cached_copy(ui, cid):
            return pltpu.make_async_copy(
                tfp_ref.at[cid, wbase_ref[w]], tiles_s.at[ui], csems.at[ui]
            )

        for ui, cid in enumerate(cids):
            @pl.when(cid >= 0)
            def _(ui=ui, cid=cid):
                cached_copy(ui, cid).start()
        # cross-grid-step double-buffered decode of ALL QG queries' used
        # slots: QG cells per wave divides the per-decode DMA fixed cost
        # (~3.3 us measured), and the two-bank scratch prefetches the NEXT
        # grid step's meta+plane DMAs behind this step's decode compute —
        # the serialized meta-wait -> planes-issue -> planes-wait chain
        # (~30% of a step at GROUP=2) runs concurrently with the MXU/VPU
        # work of the previous step (ops/postings.py:_decode_cells_dbuf).
        def cells_at(w_, bg_):
            return [
                (
                    cs_ref[w_, (bg_ * QG + qg) * T + t],
                    cn_ref[w_, (bg_ * QG + qg) * T + t],
                )
                for qg in range(QG)
                for t in used
            ]

        keep = [cid >= 0 for cid in cids]
        if not USE_DBUF:
            _decode_cells_pipelined(
                bmeta_ref, planes_ref,
                [tiles_s.at[ci] for ci in range(QG * U)],
                metas_s.at[0], rowss_s.at[0], sems.at[0],
                cells_at(w, bg), wbase, group, keep=keep,
            )
        else:
            step, last, w2, bg2 = dbuf_step(w, bg, nW, nBG)
            _decode_cells_dbuf(
                bmeta_ref, planes_ref,
                [tiles_s.at[ci] for ci in range(QG * U)],
                metas_s, rowss_s, sems,
                cells_at(w, bg), cells_at(w2, bg2), step, last, wbase, group,
                keep=keep,
            )
        for ui, cid in enumerate(cids):
            @pl.when(cid >= 0)
            def _(ui=ui, cid=cid):
                cached_copy(ui, cid).wait()
        # local docid of tile[h, l] is h*128 + l (docid-major layout)
        lid = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) * TILE
            + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        )
        in_seg = lid < nd_ref[0] - wbase
        if del_ref is not None:
            in_seg = in_seg & (del_ref[0] == 0)
        for qg in range(QG):
            b = bg * QG + qg
            if flat:
                mask, score = eval_flat_tiles(
                    [tiles_s[qg * U + ui] for ui in range(U)],
                    lambda t: flags_ref[b, t],
                    kmin_ref[b],
                    lambda t: wts_ref[b, t],
                    scorer_cls,
                    T,
                )
            else:
                tiles = {t: tiles_s[qg * U + ui] for ui, t in enumerate(used)}
                mask, score = eval_tape_tiles(
                    tape, tiles, lambda i: wts_ref[b, i], scorer_cls
                )
            sc = jnp.where(mask & in_seg, score, NEG_INF)
            out_ref[qg, 0] = sc
            # per-SUB-BLOCK maxima: the window splits into 16 sub-blocks
            # of 8 sublanes = 1024 CONTIGUOUS docids each (tile[h, l] is
            # docid h*128+l), which makes sub-blocks valid selection units
            # for the exact two-phase top-k (same proof as windows, 16x
            # smaller gather domain). (16, 128), max broadcast over lanes.
            sb = sc.reshape(NSUB, TILE // NSUB, TILE).max(axis=1)
            rmax_ref[qg, 0] = jnp.broadcast_to(
                sb.max(axis=1, keepdims=True), (NSUB, TILE)
            )

    return kernel


def _call_score_kernel(
    kernel, W, B, QG, nc, prefetch, bmeta, planes, tf_planes, deleted,
    interpret
):
    """Shared pallas_call wrapper for the tape and flat fused kernels:
    identical BlockSpecs, double-banked decode scratch, and output pair —
    only the kernel body and the scalar-prefetch operands differ (the flat
    kernel adds flags/kmin). nc = decoded cells per grid step. tf_planes
    (C, W_seg, 128, 128) f32 backs the hot-term plane cache (a (1, 1, 128,
    128) dummy when the executor has no cached terms)."""
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if deleted is not None:
        in_specs.append(
            pl.BlockSpec((1, TILE, TILE), lambda w, b, *_: (w, 0, 0))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(W, B // QG),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((QG, 1, TILE, TILE), lambda w, b, *_: (b, w, 0, 0)),
            pl.BlockSpec((QG, 1, NSUB, TILE), lambda w, b, *_: (b, w, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((nc, TILE, TILE), jnp.float32),
            # two banks: the double-buffered decode prefetches the next
            # grid step's meta+plane DMAs while this step computes
            pltpu.SMEM(
                (2, nc, META_ROWS, META_PER_ROW * META_COLS),
                jnp.int32,
            ),
            pltpu.VMEM((2, nc, ROWS_FIXED, TILE), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2 * nc)),
            # one DMA semaphore per cell for the hot-term plane copies
            pltpu.SemaphoreType.DMA((nc,)),
        ],
    )
    args = list(prefetch) + [bmeta, planes, tf_planes]
    if deleted is not None:
        args.append(deleted)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, W, TILE, TILE), jnp.float32),
            jax.ShapeDtypeStruct((B, W, NSUB, TILE), jnp.float32),
        ),
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tape", "scorer_name", "n_windows", "n_terms", "batch", "interpret",
    ),
)
def fused_score_tiles(
    bmeta,  # (rows, 128) i32
    planes,  # (R_pad, 128) u32
    cell_start,  # (W, B*T) i32
    cell_nblocks,  # (W, B*T) i32
    weights,  # (B, NW) f32
    cids,  # (B*T,) i32 hot-cache plane ids (-1 = decode; cell_nblocks 0)
    tf_planes,  # (C, W_seg, 128, 128) f32 cached freq planes (or dummy)
    n_docs,  # () i32
    deleted,  # (W, 128, 128) f32 (1.0 = masked) or None
    *,
    tape,
    scorer_name: str,
    n_windows: int,
    n_terms: int,
    batch: int,
    interpret: bool = False,
):
    """Returns (scores (B, W, 128, 128) f32 with -inf for non-matches,
    lane maxima (B, W, 128) f32)."""
    W, B, T = n_windows, batch, n_terms
    used = tape_used_slots(tape)
    group = GROUP_INTERPRET if interpret else GROUP
    QG = _qgroup(B, len(used), interpret)
    kernel = _make_score_kernel(
        tape, used, scorer_name, T, group, deleted is not None, QG, B // QG
    )
    wbase = jnp.arange(W, dtype=jnp.int32)
    nd = jnp.asarray(n_docs, jnp.int32).reshape(1)
    return _call_score_kernel(
        kernel, W, B, QG, max(1, QG * len(used)),
        (cell_start, cell_nblocks, wbase, nd, weights,
         jnp.asarray(cids, jnp.int32)),
        bmeta, planes, tf_planes, deleted, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "scorer_name", "n_windows", "n_terms", "batch", "interpret",
    ),
)
def fused_flat_score_tiles(
    bmeta,  # (rows, 128) i32
    planes,  # (R_pad, 128) u32
    cell_start,  # (W, B*T) i32
    cell_nblocks,  # (W, B*T) i32
    weights,  # (B, T) f32 — PER-SLOT weights (widx resolved on host)
    flags,  # (B, T) i32 — per-slot 1=required 2=negated 4=optional
    kmin,  # (B,) i32 — min required-present count (pad rows: T+1)
    cids,  # (B*T,) i32 hot-cache plane ids (-1 = decode; cell_nblocks 0)
    tf_planes,  # (C, W_seg, 128, 128) f32 cached freq planes (or dummy)
    n_docs,  # () i32
    deleted,  # (W, 128, 128) f32 (1.0 = masked) or None
    *,
    scorer_name: str,
    n_windows: int,
    n_terms: int,
    batch: int,
    interpret: bool = False,
):
    """Tape-independent fused kernel for FLAT boolean queries: the query
    structure (req/neg/opt membership + k-of-n threshold) is DATA, so one
    compiled program serves every flat AND/OR/NOT/MatchSome/optional shape
    of the same (T, B) bucket. Same outputs as fused_score_tiles."""
    W, B, T = n_windows, batch, n_terms
    used = tuple(range(T))
    group = GROUP_INTERPRET if interpret else GROUP
    QG = _qgroup(B, T, interpret)
    kernel = _make_score_kernel(
        None, used, scorer_name, T, group, deleted is not None, QG,
        B // QG, flat=True,
    )
    wbase = jnp.arange(W, dtype=jnp.int32)
    nd = jnp.asarray(n_docs, jnp.int32).reshape(1)
    return _call_score_kernel(
        kernel, W, B, QG, max(1, QG * T),
        (cell_start, cell_nblocks, wbase, nd, weights,
         jnp.asarray(flags, jnp.int32), jnp.asarray(kmin, jnp.int32),
         jnp.asarray(cids, jnp.int32)),
        bmeta, planes, tf_planes, deleted, interpret,
    )


def exact_window_topk(scores, rmax, k, sel_blocks=16):
    """Two-phase exact top-k with docid-asc tie-break (see module doc), at
    SUB-BLOCK granularity: the selection unit is a 1024-doc contiguous
    range (8 sublanes of a window tile), so the gathered domain for the
    final top_k is kappa*1024 elements instead of kappa*16384 — lax.top_k
    measures ~1.4 ns/element on v5e, so domain size IS the selection cost.

    scores: (B, W, 128, 128) f32; rmax: (B, W, 16, 128) f32 sub-block
    maxima (broadcast across lanes). Returns (values (B, k), docids (B, k)).
    """
    B, W = rmax.shape[:2]
    nblk = W * NSUB
    flat = scores.reshape(B, nblk, SUB_DOCS)
    bmax = rmax[:, :, :, 0].reshape(B, nblk)
    kap = min(nblk, max(16, k, sel_blocks))
    if kap < nblk:
        _, sel = jax.lax.top_k(bmax, kap)  # ties -> lower block index
        sel = jnp.sort(sel, axis=1)  # ascending: flat order = docid order
        g = jnp.take_along_axis(flat, sel[:, :, None], axis=1)
    else:
        sel = jnp.broadcast_to(jnp.arange(nblk, dtype=jnp.int32), (B, nblk))
        g = flat
        kap = nblk
    gv, gidx = jax.lax.top_k(g.reshape(B, kap * SUB_DOCS), k)
    blk = jnp.take_along_axis(sel, gidx // SUB_DOCS, axis=1)
    gi = blk * SUB_DOCS + gidx % SUB_DOCS
    return gv, gi
