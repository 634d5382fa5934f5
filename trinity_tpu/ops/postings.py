"""Stage-1 Pallas kernel: materialize dense per-(window, term) frequency tiles.

This kernel replaces the entire iterator machinery of the reference's hot
path — Decoder::next/advance block decode + skiplist seeks
(lucene_codec.cpp:568-765), DocsSetSpan window drains
(docset_spans.cpp:98-173) and the per-doc heap traffic of
docset_iterators.cpp — with dense tiled compute:

For each (window, term) grid cell it
1. DMAs the cell's block metadata rows (HBM -> SMEM) and its packed
   plane-matrix rows (HBM -> VMEM, 32-row chunks; see utils/bitpack.py for
   the transposed layout chosen so this DMA is row-aligned);
2. per block: expands bits with one broadcast-shift over sublanes, reduces
   doc-delta and freq planes with runtime-masked weight vectors, and
   prefix-sums deltas into docids (the decode);
3. scatters (docid, freq) into the window's 128x128 tile with a two-level
   one-hot **MXU matmul**: A'[h,p] = (docid_hi == h), B'[l,p] = freq *
   (docid_lo == l), tile += A' @ B'^T — one 128^3 f32 matmul scatters a
   whole block. f32 is exact here: freqs < 2^16 summed over <= 128 lanes
   stay far below 2^24.

The tile layout is docid-major: tile[h, l] corresponds to local docid
window*16384 + h*128 + l, so a row-major flatten preserves docid order —
which makes downstream top-k tie-breaking (lowest index wins) equal to the
spec's docid-ascending rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from trinity_tpu.limits import TILE, WINDOW_SIZE

# cross-grid-step DMA double buffering (see _decode_cells_dbuf). The env
# toggle exists for A/B kernel profiling — read at IMPORT time, so each
# variant needs its own process (tools/ab_dbuf.py runs a subprocess per
# variant); production always runs the double-buffered path.
USE_DBUF = os.environ.get("TRINITY_DBUF", "1") != "0"


def dbuf_step(outer, inner, n_outer, n_inner):
    """Linear step index + next-step coordinates for the double-buffered
    decode. Encodes the grid-linearization contract (last grid dim minor)
    shared by both fused kernels: the (outer2, inner2) returned here MUST
    equal the next grid step's own (outer, inner), or the banks' DMA
    issue/wait descriptors diverge — a fault class that wedges the TPU
    worker (CLAUDE.md)."""
    step = outer * n_inner + inner
    last = step >= n_outer * n_inner - 1
    adv = inner + 1 < n_inner
    outer2 = jnp.where(adv, outer, jnp.minimum(outer + 1, n_outer - 1))
    inner2 = jnp.where(adv, inner + 1, 0)
    return step, last, outer2, inner2

# Hard bounds for one (window, term) cell. A window holds 16384 docids, so at
# most 128 full blocks + boundary partials can overlap it (middle blocks are
# fully contained). Plane rows per cell <= MAXB * 48.
MAXB = 136  # max blocks per cell (>= 131), multiple of 8
MAXROWS = 208  # max packed word-rows per cell (>= ceil(131*48/32)+2)
ROWS_FIXED = MAXROWS + 40  # one fixed-size planes DMA (8-multiple rows)
ROW_CHUNK = 32  # plane rows per DMA chunk (16 KiB)
GROUP = 2  # blocks decoded per inner-loop iteration (compiled path)
GROUP_INTERPRET = 2  # smaller group for interpret-mode tests (CPU)
# bmeta columns. Metadata of 16 blocks is packed per 128-lane row (block b ->
# row b//16, lanes (b%16)*8 + col) so cell DMAs slice full rows — Mosaic
# requires last-dim slices to be 128-aligned.
C_POFF, C_BD, C_BF, C_FIRST, C_COUNT, C_HITS, C_LAST, C_MAXF = range(8)
META_COLS = 8
META_PER_ROW = 16  # blocks per bmeta row
# rows DMA'd per cell: >= MAXB/16 + 1 to cover the offset remainder, and a
# multiple of 8 — dynamic-offset DMAs with non-8-multiple row counts fault
# the TPU (observed on v5e)
META_ROWS = 16


def _expand_bits(words_u32: jnp.ndarray) -> jnp.ndarray:
    """(R, 128) u32 -> (R*32, 128) i32 bits; plane row 32*r+j from word row r."""
    r, lanes = words_u32.shape
    w = words_u32.astype(jnp.int32)
    t = jax.lax.broadcasted_iota(jnp.int32, (r, 32, lanes), 1)
    bits = (jax.lax.shift_right_logical(w[:, None, :], t)) & 1
    return bits.reshape(r * 32, lanes)


def _prefix_sum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the 128-lane axis of a (1, 128) i32 vector."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(lane >= s, pltpu.roll(x, s, axis=1), 0)
    return x


def _tgroup(T: int, interpret: bool = False) -> int:
    """Cells decoded per stage-1 grid step (term-axis batching): one
    pipelined DMA wave covers TG cells, dividing the per-cell DMA fixed
    cost (~3.3 us measured) by TG. Interpret mode caps at 2: the unrolled
    emulation HLO grows with TG and has tipped XLA:CPU's compiler into a
    stack-overflow segfault mid-suite; 2 still covers the multi-cell
    pipelined-DMA structure."""
    for tg in ((2, 1) if interpret else (8, 4, 2, 1)):
        if T % tg == 0:
            return tg
    return 1


def _make_kernel(with_offsets: bool, group: int = GROUP, TG: int = 1,
                 nTG: int = 1):
    """Kernel factory: with_offsets adds a hits-offset tile output (the
    device analog of the skiplist's totalHitsSoFar addressing,
    lucene_codec.h:259-266) so phrase verification can gather each matched
    posting's position run. Offsets are scattered exactly via base-256
    byte-plane matmuls (see _decode_groups). nTG = grid extent of the term
    axis (the double-buffered decode needs the linear step index)."""

    def kernel(cell_start_ref, cell_nblocks_ref, wbase_ref, bmeta_ref, planes_ref, *rest):
        if with_offsets:
            out_ref, off_ref, metas_s, rowss_s, sems = rest
        else:
            (out_ref, metas_s, rowss_s, sems) = rest
            off_ref = None
        w = pl.program_id(0)
        tg = pl.program_id(1)
        nW = pl.num_programs(0)
        wbase = wbase_ref[w] * WINDOW_SIZE

        def cells_at(w_, tg_):
            return [
                (
                    cell_start_ref[w_, tg_ * TG + i],
                    cell_nblocks_ref[w_, tg_ * TG + i],
                )
                for i in range(TG)
            ]

        off_refs = (
            [off_ref.at[0, i] for i in range(TG)] if with_offsets else None
        )
        if not USE_DBUF:
            _decode_cells_pipelined(
                bmeta_ref, planes_ref,
                [out_ref.at[0, i] for i in range(TG)],
                metas_s.at[0], rowss_s.at[0], sems.at[0],
                cells_at(w, tg), wbase, group, off_refs=off_refs,
            )
            return
        step, last, w2, tg2 = dbuf_step(w, tg, nW, nTG)
        _decode_cells_dbuf(
            bmeta_ref, planes_ref,
            [out_ref.at[0, i] for i in range(TG)],
            metas_s, rowss_s, sems,
            cells_at(w, tg), cells_at(w2, tg2), step, last, wbase, group,
            off_refs=off_refs,
        )

    return kernel


def _meta_accessor(meta_s, b0):
    """SMEM accessor for block (b0 + j)'s column `col` after the meta DMA."""
    mr0 = b0 // META_PER_ROW

    def meta(j, col):
        idx = b0 + j
        return meta_s[
            idx // META_PER_ROW - mr0, (idx % META_PER_ROW) * META_COLS + col
        ]

    return meta


def _start_meta_dma(bmeta_ref, meta_s, sem, b0):
    mr0 = b0 // META_PER_ROW
    cp = pltpu.make_async_copy(
        bmeta_ref.at[pl.ds(mr0, META_ROWS), :], meta_s, sem
    )
    cp.start()
    return _meta_accessor(meta_s, b0), cp


def _wait_meta_dma(bmeta_ref, meta_s, sem, b0):
    mr0 = b0 // META_PER_ROW
    pltpu.make_async_copy(
        bmeta_ref.at[pl.ds(mr0, META_ROWS), :], meta_s, sem
    ).wait()


def _start_planes_dma(planes_ref, rows_s, sem, r0):
    """ONE fixed-size planes DMA (ROWS_FIXED rows from r0) replaces the
    serialized chunk loop: per-decode cost is DMA-latency-bound (~3.3 us
    measured), not bandwidth-bound, so a single over-sized in-flight
    transfer beats several round trips. pad_planes guarantees r0+ROWS_FIXED
    stays in bounds."""
    pltpu.make_async_copy(
        planes_ref.at[pl.ds(r0, ROWS_FIXED), :], rows_s, sem
    ).start()


def _wait_planes_dma(planes_ref, rows_s, sem, r0):
    pltpu.make_async_copy(
        planes_ref.at[pl.ds(r0, ROWS_FIXED), :], rows_s, sem
    ).wait()


def _decode_cells_pipelined(
    bmeta_ref, planes_ref, tile_refs, metas_s, rowss_s, sems, cells, wbase,
    GROUP, off_refs=None, keep=None,
):
    """Decode U cells with software-pipelined DMAs: ALL meta copies go into
    flight first, then all plane copies, then the decodes — 2 overlapped
    DMA rounds total instead of 2*U serialized round trips (the dominant
    per-decode cost; see _start_planes_dma). cells = [(b0, n), ...];
    tile_refs[ui] receives cell ui's freq tile (off_refs[ui], when given,
    its hits-offset tile). keep[ui] (scalar bool, optional) suppresses the
    empty-cell zero store: the caller is filling that tile itself (the
    hot-term plane cache DMAs directly into it, ops/fusedscore.py)."""
    metas = []
    for ui, (b0, n) in enumerate(cells):
        @pl.when(n > 0)
        def _(ui=ui, b0=b0):
            _start_meta_dma(bmeta_ref, metas_s.at[ui], sems.at[2 * ui], b0)
        metas.append(_meta_accessor(metas_s.at[ui], b0))
    for ui, (b0, n) in enumerate(cells):
        @pl.when(n > 0)
        def _(ui=ui, b0=b0):
            _wait_meta_dma(
                bmeta_ref, metas_s.at[ui], sems.at[2 * ui], b0
            )
            r0 = metas[ui](0, C_POFF) // 32
            _start_planes_dma(
                planes_ref, rowss_s.at[ui], sems.at[2 * ui + 1], r0
            )
    for ui, (b0, n) in enumerate(cells):
        # zero only EMPTY cells: non-empty ones are fully overwritten by
        # the decode, so the unconditional zero store was a dead write
        empty = (n == 0) if keep is None else ((n == 0) & ~keep[ui])

        @pl.when(empty)
        def _(ui=ui):
            tile_refs[ui][...] = jnp.zeros(tile_refs[ui].shape, jnp.float32)
            if off_refs is not None:
                off_refs[ui][...] = jnp.zeros(off_refs[ui].shape, jnp.int32)

        @pl.when(n > 0)
        def _(ui=ui, b0=b0, n=n):
            r0 = metas[ui](0, C_POFF) // 32
            _wait_planes_dma(
                planes_ref, rowss_s.at[ui], sems.at[2 * ui + 1], r0
            )
            tiles = _decode_groups(
                metas[ui], rowss_s.at[ui], r0, n, wbase, GROUP,
                off_refs is not None,
            )
            tile_refs[ui][...] = tiles[0].reshape(tile_refs[ui].shape)
            if off_refs is not None:
                off_refs[ui][...] = tiles[1].reshape(off_refs[ui].shape)


def _decode_cells_dbuf(
    bmeta_ref, planes_ref, tile_refs, metas_s, rowss_s, sems,
    cur_cells, nxt_cells, step, last_step, wbase, GROUP, off_refs=None,
    keep=None,
):
    """Cross-grid-step DOUBLE-BUFFERED decode of U cells.

    _decode_cells_pipelined overlaps the U cells' DMAs within one grid
    step, but each step still serializes meta-wait -> planes-issue ->
    planes-wait -> decode: the full DMA chain latency lands between every
    step's compute (measured ~30% of a fused-score step at GROUP=2). TPU
    scratch persists across grid steps, so this variant keeps TWO banks of
    (meta, plane) scratch and pipelines ACROSS steps:

      step s:  [first step only: bring bank p up synchronously]
               issue next step's meta DMAs into bank 1-p
               wait bank p's plane DMAs (issued at step s-1)
               decode cell 0 of bank p          <- hides next metas' latency
               wait next metas; issue next step's plane DMAs into bank 1-p
               decode cells 1..U-1 of bank p    <- hides next planes' latency

    metas_s: (2, U, META_ROWS, META_PER_ROW*META_COLS) SMEM;
    rowss_s: (2, U, ROWS_FIXED, TILE) VMEM; sems: (2, 2U) DMA semaphores.
    cur_cells/nxt_cells: [(b0, nblocks)] for this and the next grid step
    (nxt ignored when last_step); step: linear step index (parity picks the
    bank). The caller guarantees cells_at(step+1) == next step's cur_cells
    (same scalar-prefetch reads), so DMA descriptors match at issue/wait.
    """
    U = len(cur_cells)
    if U == 0:  # a no-slot tape (e.g. const-false) decodes nothing
        return
    p = jax.lax.rem(step, 2)
    q = 1 - p

    def issue_metas(bank, cells):
        for ui, (b0, n) in enumerate(cells):
            @pl.when(n > 0)
            def _(ui=ui, b0=b0):
                _start_meta_dma(
                    bmeta_ref, metas_s.at[bank, ui], sems.at[bank, 2 * ui], b0
                )

    def wait_metas_issue_planes(bank, cells):
        for ui, (b0, n) in enumerate(cells):
            @pl.when(n > 0)
            def _(ui=ui, b0=b0):
                _wait_meta_dma(
                    bmeta_ref, metas_s.at[bank, ui], sems.at[bank, 2 * ui], b0
                )
                r0 = _meta_accessor(metas_s.at[bank, ui], b0)(0, C_POFF) // 32
                _start_planes_dma(
                    planes_ref, rowss_s.at[bank, ui],
                    sems.at[bank, 2 * ui + 1], r0,
                )

    @pl.when(step == 0)
    def _():
        issue_metas(p, cur_cells)
        wait_metas_issue_planes(p, cur_cells)

    @pl.when(~last_step)
    def _():
        issue_metas(q, nxt_cells)

    def decode_cell(ui, b0, n):
        meta = _meta_accessor(metas_s.at[p, ui], b0)

        # zero only EMPTY cells (non-empty are fully overwritten below;
        # keep[ui] cells are being filled by the caller's plane-cache DMA)
        empty = (n == 0) if keep is None else ((n == 0) & ~keep[ui])

        @pl.when(empty)
        def _():
            tile_refs[ui][...] = jnp.zeros(tile_refs[ui].shape, jnp.float32)
            if off_refs is not None:
                off_refs[ui][...] = jnp.zeros(off_refs[ui].shape, jnp.int32)

        @pl.when(n > 0)
        def _():
            r0 = meta(0, C_POFF) // 32
            _wait_planes_dma(
                planes_ref, rowss_s.at[p, ui], sems.at[p, 2 * ui + 1], r0
            )
            tiles = _decode_groups(
                meta, rowss_s.at[p, ui], r0, n, wbase, GROUP,
                off_refs is not None,
            )
            tile_refs[ui][...] = tiles[0].reshape(tile_refs[ui].shape)
            if off_refs is not None:
                off_refs[ui][...] = tiles[1].reshape(off_refs[ui].shape)

    decode_cell(0, cur_cells[0][0], cur_cells[0][1])

    @pl.when(~last_step)
    def _():
        wait_metas_issue_planes(q, nxt_cells)

    for ui in range(1, U):
        decode_cell(ui, cur_cells[ui][0], cur_cells[ui][1])


def _decode_groups(meta, rows_s, r0, n, wbase, GROUP, want_offsets):
    """Group-loop decode over a cell's blocks (meta in SMEM, plane rows in
    VMEM at r0). Returns (freq_tile f32, off_tile i32 | None)."""
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)

    def nt_scatter(a, v, exact=False):
        """acc[h, l] += sum_p a[h, p] * v[l, p] — one NT MXU matmul.

        Mosaic lowers default-precision f32 matmuls as SINGLE-PASS bf16
        (observed on v5e: scattered values above 2^8 round to bf16 ulp),
        so values wider than 8 bits either split into bf16-exact byte
        planes (the freq path below) or pass exact=True for
        precision=HIGHEST (~3x MXU passes; the offsets path).
        """
        kw = (
            {"precision": jax.lax.Precision.HIGHEST} if exact else {}
        )
        return jax.lax.dot_general(
            a,
            v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **kw,
        )

    def bitfield(wlo, whi, sh, width):
        """Extract a contiguous bit-field [sh, sh+width) from the 64-bit
        lane value (wlo | whi << 32). All (G, 128) vector ops; sh and
        width are (G, 1) columns. The transposed plane layout makes a
        value exactly such a field — no per-bit expansion needed."""
        lo = jax.lax.shift_right_logical(wlo, sh)
        hi = jnp.where(sh == 0, 0, whi << ((32 - sh) & 31))
        mask = jnp.where(width >= 32, -1, (1 << jnp.clip(width, 0, 31)) - 1)
        return (lo | hi) & mask

    def group_body(g, carry):
        """Decode GROUP blocks per iteration. A block's value bits form a
        contiguous bit-field of its 3-word plane column (utils/bitpack.py
        layout), so decode = a handful of shift/or/mask vector ops."""
        jbase = g * GROUP
        js = [jnp.minimum(jbase + i, n - 1) for i in range(GROUP)]
        col = lambda vals, dt=jnp.int32: jnp.concatenate(
            [jnp.full((1, 1), v, dt) for v in vals], axis=0
        )  # (G, 1) from G scalars
        poffs = [meta(js[i], C_POFF) for i in range(GROUP)]
        lrs = [p // 32 - r0 for p in poffs]
        q4 = col([p % 32 for p in poffs])
        bd4 = col([meta(js[i], C_BD) for i in range(GROUP)])
        bf4 = col([meta(js[i], C_BF) for i in range(GROUP)])
        first4 = col([meta(js[i], C_FIRST) for i in range(GROUP)])
        count4 = col([meta(js[i], C_COUNT) for i in range(GROUP)])
        active4 = col(
            [(jbase + i < n).astype(jnp.int32) for i in range(GROUP)]
        )
        w0 = jnp.concatenate(
            [rows_s[pl.ds(lr, 1), :] for lr in lrs], axis=0
        ).astype(jnp.int32)
        w1 = jnp.concatenate(
            [rows_s[pl.ds(lr + 1, 1), :] for lr in lrs], axis=0
        ).astype(jnp.int32)
        w2 = jnp.concatenate(
            [rows_s[pl.ds(lr + 2, 1), :] for lr in lrs], axis=0
        ).astype(jnp.int32)
        # doc-delta field starts at q (< 32) -> words (w0, w1)
        deltas = bitfield(w0, w1, q4, bd4)
        # freq field starts at q + bd (may be >= 32) -> shift word pair
        s2 = q4 + bd4
        in_lo = s2 < 32
        f1 = bitfield(
            jnp.where(in_lo, w0, w1),
            jnp.where(in_lo, w1, w2),
            s2 & 31,
            bf4,
        )
        docs = first4 + _prefix_sum_lanes(deltas)  # (G,128)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (GROUP, TILE), 1)
        # validity folds into the scattered VALUES, not the one-hot:
        # out-of-window docids already miss every one-hot row, and lane
        # padding duplicates the last real docid, contributing +0.
        valid = (lanes < count4) & (active4 > 0)
        local = docs - wbase
        hi = local >> 7
        lo = local & 127
        # freq split into bf16-exact byte planes: v = fhi*256 + flo with
        # flo <= 255 and fhi <= 256, both exactly representable in bf16
        fv = jnp.where(valid, (f1 + 1), 0)
        flo = (fv & 255).astype(jnp.float32)
        fhi = (fv >> 8).astype(jnp.float32)
        if want_offsets:
            epf = _prefix_sum_lanes(f1 + 1) - (f1 + 1)
            hits4 = col([meta(js[i], C_HITS) for i in range(GROUP)])
            off = jnp.where(valid, hits4 + epf, 0)  # (G,128)
            # base-256 byte planes (like the freq path): four SINGLE-PASS
            # bf16 matmuls replace two precision=HIGHEST ones (~3 MXU
            # passes each) — every plane value <= 255 is bf16-exact, and
            # the f32 accumulators stay < 2^8 * 128 lanes < 2^24
            obytes = [
                ((off >> (8 * p)) & 255).astype(jnp.float32)
                for p in range(4)
            ]
        # whole-group one-hot scatter: concatenate the per-block one-hot
        # and value matrices along the LANE axis and contract the G*128
        # axis with ONE matmul pair — (128, G*128) @ (G*128, 128) runs as
        # G back-to-back MXU passes instead of 2*G separately-issued
        # 128^3 matmuls (the per-issue overhead dominated the kernel:
        # measured 41 ms for 8086 blocks across 6144 mostly-1-block
        # cells). Masks/selects stay in f32 (bf16 compares unsupported);
        # casts to bf16 only at the matmul inputs — values <= 256 are
        # bf16-exact.
        acc_l, acc_h = carry[0], carry[1]
        a_parts, vlo_parts, vhi_parts = [], [], []
        o_parts = [[] for _ in range(4)]
        for i in range(GROUP):
            a32 = (hi[i : i + 1, :] == iota_col).astype(jnp.float32)
            onehot_lo = lo[i : i + 1, :] == iota_col
            a_parts.append(a32)
            vlo_parts.append(jnp.where(onehot_lo, flo[i : i + 1, :], 0.0))
            vhi_parts.append(jnp.where(onehot_lo, fhi[i : i + 1, :], 0.0))
            if want_offsets:
                for p in range(4):
                    o_parts[p].append(
                        jnp.where(onehot_lo, obytes[p][i : i + 1, :], 0.0)
                    )
        a_all = jnp.concatenate(a_parts, axis=1)  # (TILE, G*TILE)
        ab_all = a_all.astype(jnp.bfloat16)
        acc_l = acc_l + nt_scatter(
            ab_all,
            jnp.concatenate(vlo_parts, axis=1).astype(jnp.bfloat16),
        )
        acc_h = acc_h + nt_scatter(
            ab_all,
            jnp.concatenate(vhi_parts, axis=1).astype(jnp.bfloat16),
        )
        if not want_offsets:
            return (acc_l, acc_h)
        accs_o = tuple(
            carry[2 + p]
            + nt_scatter(
                ab_all,
                jnp.concatenate(o_parts[p], axis=1).astype(jnp.bfloat16),
            )
            for p in range(4)
        )
        return (acc_l, acc_h) + accs_o

    z = jnp.zeros((TILE, TILE), jnp.float32)
    init = (z, z) if not want_offsets else (z, z, z, z, z, z)
    carry = jax.lax.fori_loop(0, pl.cdiv(n, GROUP), group_body, init)
    if not want_offsets:
        return (carry[1] * 256.0 + carry[0], None)
    off_i32 = (
        (carry[5].astype(jnp.int32) << 24)
        | (carry[4].astype(jnp.int32) << 16)
        | (carry[3].astype(jnp.int32) << 8)
        | carry[2].astype(jnp.int32)
    )
    return (carry[1] * 256.0 + carry[0], off_i32)


@functools.partial(
    jax.jit,
    static_argnames=("n_windows", "n_terms", "interpret", "with_offsets"),
)
def materialize_freq_tiles(
    bmeta: jnp.ndarray,  # (n_meta_rows, 128) i32 (pack_block_meta)
    planes: jnp.ndarray,  # (R_pad, 128) u32, padded by >= MAXROWS + 48 rows
    cell_start: jnp.ndarray,  # (W, T) i32
    cell_nblocks: jnp.ndarray,  # (W, T) i32
    window_base: jnp.ndarray = None,  # (W,) i32 window ids (default arange)
    *,
    n_windows: int,
    n_terms: int,
    interpret: bool = False,
    with_offsets: bool = False,
):
    """Returns f32[W, T, 128, 128] frequency tiles (0 = term absent); with
    with_offsets also returns i32[W, T, 128, 128] hits-offset tiles.
    window_base lets a caller evaluate a gathered SUBSET of windows (the
    pruned top-k path): grid row w holds window window_base[w]."""
    if window_base is None:
        window_base = jnp.arange(n_windows, dtype=jnp.int32)
    TG = _tgroup(n_terms, interpret)
    tile_spec = pl.BlockSpec(
        (1, TG, TILE, TILE), lambda w, t, *_: (w, t, 0, 0)
    )
    tile_shape = jax.ShapeDtypeStruct(
        (n_windows, n_terms, TILE, TILE), jnp.float32
    )
    if with_offsets:
        out_specs = (tile_spec, tile_spec)
        out_shape = (
            tile_shape,
            jax.ShapeDtypeStruct((n_windows, n_terms, TILE, TILE), jnp.int32),
        )
    else:
        out_specs = tile_spec
        out_shape = tile_shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_windows, n_terms // TG),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            # two banks: next grid step's meta+plane DMAs prefetch behind
            # this step's decode (_decode_cells_dbuf)
            pltpu.SMEM(
                (2, TG, META_ROWS, META_PER_ROW * META_COLS), jnp.int32
            ),
            pltpu.VMEM((2, TG, MAXROWS + 40, TILE), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2 * TG)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(
            with_offsets, GROUP_INTERPRET if interpret else GROUP, TG,
            n_terms // TG,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cell_start, cell_nblocks, window_base, bmeta, planes)


# ------------------------------------------------------------ host helpers
def pack_block_meta(seg) -> np.ndarray:
    """SegmentData block arrays -> (rows, 128) i32 device meta, 16 blocks per
    128-lane row (block b at row b//16, lanes (b%16)*8..+8)."""
    n = len(seg.block_plane_off)
    # generous padding: the last cell's DMA reads META_ROWS rows from
    # floor(b0/16) — cover b0 = n-1 plus alignment slack
    rows = -(-(n + MAXB) // META_PER_ROW) + META_ROWS
    m = np.zeros((rows * META_PER_ROW, META_COLS), np.int32)
    m[:n, C_POFF] = seg.block_plane_off
    m[:n, C_BD] = seg.block_bits_doc
    m[:n, C_BF] = seg.block_bits_freq
    m[:n, C_FIRST] = seg.block_first_doc
    m[:n, C_COUNT] = seg.block_count
    m[:n, C_HITS] = seg.block_hits_off
    m[:n, C_LAST] = seg.block_last_doc
    m[:n, C_MAXF] = seg.block_max_freq
    return m.reshape(rows, META_PER_ROW * META_COLS)


def pad_planes(planes: np.ndarray) -> np.ndarray:
    """Pad the packed plane matrix so chunked cell DMAs stay in bounds."""
    pad = MAXROWS + 48
    return np.vstack([planes, np.zeros((pad, planes.shape[1]), planes.dtype)])


def compute_cells(seg, term_ids) -> tuple:
    """Per-(window, term) block ranges via vectorized skip-array search —
    the TPU analog of skiplist seeking (lucene_codec.cpp:596-656).

    term_ids: list of segment term ids (-1 for unknown terms -> empty cells).
    Returns (cell_start, cell_nblocks) i32[W, T]. Per-term columns are
    cached on the segment (they depend only on the immutable block arrays;
    ~1 KiB per term) — hot query terms skip the searchsorted pass, which
    dominated host planning time in batched serving."""
    W = seg.n_windows
    T = len(term_ids)
    cell_start = np.zeros((W, T), np.int32)
    cell_nblocks = np.zeros((W, T), np.int32)
    cache = getattr(seg, "_cell_cache", None)
    if cache is None:
        cache = {}
        try:
            seg._cell_cache = cache
        except AttributeError:
            pass
    bounds = np.arange(W + 1, dtype=np.int64) * WINDOW_SIZE
    for ti, tid in enumerate(term_ids):
        if tid < 0:
            continue
        hit = cache.get(tid)
        if hit is not None:
            cell_start[:, ti] = hit[0]
            cell_nblocks[:, ti] = hit[1]
            continue
        s = int(seg.term_block_start[tid])
        nb = int(seg.term_nblocks[tid])
        if nb == 0:
            continue
        lb = seg.block_last_doc[s : s + nb]
        fb = seg.block_first_doc[s : s + nb]
        starts = np.searchsorted(lb, bounds[:-1], side="left")
        ends = np.searchsorted(fb, bounds[1:], side="left")
        nbl = np.maximum(ends - starts, 0)
        assert nbl.max(initial=0) <= MAXB, "cell block bound exceeded"
        col_s = (s + starts).astype(np.int32)
        col_n = nbl.astype(np.int32)
        cache[tid] = (col_s, col_n)
        cell_start[:, ti] = col_s
        cell_nblocks[:, ti] = col_n
    return cell_start, cell_nblocks
