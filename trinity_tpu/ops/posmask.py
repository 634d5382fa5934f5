"""Positional-bitmask scatter kernel: per-doc position PRESENCE words.

The candidate-ladder phrase path (exec/phrases.py) costs O(candidates x
fcap^2) gather/verify work — for stopword bigrams the ladder must cover the
min-member df (~1M candidates on the r4 bench corpus), which measured
~22 ms/query. The TPU-shaped alternative for segments whose max position
fits a small bitmask (max_position < 32*PW): materialize, per (window,
member-term) cell, a dense bitmask tile

    out[w, m, pw, hi, lo] = u32 word pw of doc (w*16384 + hi*128 + lo)'s
                            position-presence bitmask (bit p set <=> the
                            term occurs at position p in that doc)

after which the phrase frequency for EVERY doc is one elementwise pass:
popcount(AND_m (mask_m >> m)) — see executor._build_phrase_pos_fused. The
scatter is linear in the members' postings (like the freq decode) instead
of quadratic in candidates x positions, and hot members' masks can be built
once and cached (they are query-independent), reducing a df~1M member's
per-query cost to streaming 16 bytes/doc at HBM bandwidth.

Reference analog: the per-doc hit materialization of
lucene_codec.cpp:767-856 feeding DocWordsSpace's position bitset test
(docwordspace.h:58-127) — here the "DocWordsSpace" IS the output tile,
built for all docs at once.

Kernel shape notes (Mosaic rules, see CLAUDE.md):
- ALL four DMAs per cell (block meta, doc planes, position planes, group
  offsets) are issued together at step start: the host precomputes each
  cell's plane-row starts (dpr/ppr/gor scalar-prefetch arrays), so no DMA
  waits on another's data — one pipelined wave per grid step instead of
  the serialized meta->planes->positions chain (~3.3 us per round trip).
- Lane->sublane transposes (per-posting freq-prefix run bounds must index
  the SUBLANE axis of the posting-of-element one-hot) are exact byte-split
  identity matmuls: values < 2^23 split into three bf16-exact byte planes,
  transposed with identity matmuls, recombined in f32. No lane reshapes.
- The scatter itself is the same two-level one-hot MXU pattern as
  ops/postings.py, with PW*4 byte-plane accumulators (bit values 2^(p&7)
  <= 128 are bf16-exact; per-byte sums <= 255 stay f32-exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trinity_tpu.limits import TILE, WINDOW_SIZE
from trinity_tpu.ops.postings import (
    C_BD,
    C_BF,
    C_COUNT,
    C_FIRST,
    C_HITS,
    C_POFF,
    META_PER_ROW,
    META_ROWS,
    META_COLS,
    ROWS_FIXED,
    _meta_accessor,
    _prefix_sum_lanes,
)

# Static position-plane-row DMA buckets (one fixed-size DMA per cell; the
# host picks the smallest bucket covering the group's members and falls
# back to the candidate ladder above the cap — see executor._prep_phrase_pos)
RPOS_BUCKETS = (64, 256, 1024)
# group-offset SMEM rows per RPOS bucket: a cell spanning R plane rows of
# b-bit groups holds <= R*32/b groups; b >= 1 bounds rows at R*32/128 = R/4
GOFF_ROWS = {64: 16, 256: 64, 1024: 256}
POS_GUARD_ROWS = RPOS_BUCKETS[-1] + 8  # hit_pw pad so cell DMAs stay in bounds
GOFF_GUARD_ROWS = GOFF_ROWS[RPOS_BUCKETS[-1]] + 8


def _posmask_tg(M: int, rpos: int, interpret: bool) -> int:
    """Cells per grid step: one pipelined DMA wave covers TG cells, bounded
    by VMEM (poss_s is TG * rpos * 512 B; rowss_s TG * 127 KiB)."""
    cap = 2 if interpret else max(1, min(4, (1 << 20) // (rpos * 512)))
    for tg in range(cap, 0, -1):
        if M % tg == 0:
            return tg
    return 1


def _nt(a, v):
    """out[x, y] = sum_e a[x, e] * v[y, e] — one NT MXU matmul (single-pass
    bf16; callers guarantee both operands are bf16-exact)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _transpose_lanes(vec_f32, eyef, n_bytes: int):
    """(1, 128) f32 integer lane vector -> (128, 128) SUBLANE-broadcast
    form (out[s, :] = vec[0, s]), EXACT for values in [0, 2^(8*n_bytes)):
    each 8-bit byte plane is bf16-exact, so identity-matmul transposes
    recombine exactly in f32. Full 128x128 matmul shapes throughout — no
    matrix-vector forms for Mosaic to trip on."""
    v = vec_f32.astype(jnp.int32)
    out = None
    for b in range(n_bytes):
        byte = jnp.broadcast_to(
            ((v >> (8 * b)) & 255).astype(jnp.float32), (TILE, TILE)
        )
        # out[s, y] = sum_l eye[s, l] * byte[y, l] = byte value at lane s
        t = _nt(eyef, byte) * np.float32(1 << (8 * b))
        out = t if out is None else out + t
    return out  # (128, 128) f32, constant across lanes


def _bitfield(wlo, whi, sh, width):
    """Contiguous bit-field [sh, sh+width) of the 64-bit lane pair."""
    lo = jax.lax.shift_right_logical(wlo, sh)
    hi = jnp.where(sh == 0, 0, whi << ((32 - sh) & 31))
    mask = jnp.where(width >= 32, -1, (1 << jnp.clip(width, 0, 31)) - 1)
    return (lo | hi) & mask


def _make_posmask_kernel(PW: int, RPOS: int, GOFFR: int, TG: int):
    n_acc = PW * 4

    def kernel(cs_ref, cn_ref, dpr_ref, ppr_ref, gor_ref, wbase_ref,
               bmeta_ref, planes_ref, hitpw_ref, goff_ref,
               out_ref, metas_s, rowss_s, poss_s, goffs_s, sems):
        w = pl.program_id(0)
        tg = pl.program_id(1)
        wbase = wbase_ref[w] * WINDOW_SIZE

        def copies(ui, m):
            mr0 = cs_ref[w, m] // META_PER_ROW
            return (
                pltpu.make_async_copy(
                    bmeta_ref.at[pl.ds(mr0, META_ROWS), :],
                    metas_s.at[ui], sems.at[ui, 0],
                ),
                pltpu.make_async_copy(
                    planes_ref.at[pl.ds(dpr_ref[w, m], ROWS_FIXED), :],
                    rowss_s.at[ui], sems.at[ui, 1],
                ),
                pltpu.make_async_copy(
                    hitpw_ref.at[pl.ds(ppr_ref[w, m], RPOS), :],
                    poss_s.at[ui], sems.at[ui, 2],
                ),
                pltpu.make_async_copy(
                    goff_ref.at[pl.ds(gor_ref[w, m], GOFFR), :],
                    goffs_s.at[ui], sems.at[ui, 3],
                ),
            )

        # one DMA wave: every cell's four copies go into flight before any
        # decode — the host-precomputed row starts break the meta->planes
        # data dependency that serializes the freq kernel's chain
        for ui in range(TG):
            m = tg * TG + ui

            @pl.when(cn_ref[w, m] > 0)
            def _(ui=ui, m=m):
                for cp in copies(ui, m):
                    cp.start()

        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        eyef = (iota_sub == iota_lane).astype(jnp.float32)
        iota_subf = iota_sub.astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)

        for ui in range(TG):
            m = tg * TG + ui
            n = cn_ref[w, m]

            @pl.when(n == 0)
            def _(ui=ui):
                for p in range(PW):
                    out_ref[0, ui, p] = jnp.zeros((TILE, TILE), jnp.int32)

            @pl.when(n > 0)
            def _(ui=ui, m=m, n=n):
                for cp in copies(ui, m):
                    cp.wait()
                meta = _meta_accessor(metas_s.at[ui], cs_ref[w, m])
                rows_s = rowss_s.at[ui]
                pos_s = poss_s.at[ui]
                goffv = goffs_s.at[ui]
                r0doc = dpr_ref[w, m]
                ppr0 = ppr_ref[w, m]
                gor0 = gor_ref[w, m]

                def goff_at(g):
                    return goffv[g // 128 - gor0, g % 128]

                def block_body(j, accs):
                    one = lambda v: jnp.full((1, 1), v, jnp.int32)
                    poff = meta(j, C_POFF)
                    lr = poff // 32 - r0doc
                    q = one(poff % 32)
                    bd = one(meta(j, C_BD))
                    bf = one(meta(j, C_BF))
                    count = one(meta(j, C_COUNT))
                    hits = meta(j, C_HITS)
                    w0 = rows_s[pl.ds(lr, 1), :].astype(jnp.int32)
                    w1 = rows_s[pl.ds(lr + 1, 1), :].astype(jnp.int32)
                    w2 = rows_s[pl.ds(lr + 2, 1), :].astype(jnp.int32)
                    deltas = _bitfield(w0, w1, q, bd)
                    s2 = q + bd
                    in_lo = s2 < 32
                    f1 = _bitfield(
                        jnp.where(in_lo, w0, w1),
                        jnp.where(in_lo, w1, w2),
                        s2 & 31, bf,
                    )
                    docs = one(meta(j, C_FIRST)) + _prefix_sum_lanes(deltas)
                    valid = lane < count
                    fv = jnp.where(valid, f1 + 1, 0)  # (1,128) freqs
                    epf = _prefix_sum_lanes(fv) - fv  # exclusive prefix
                    S = jnp.max(jnp.where(valid, epf + fv, 0))  # block hits
                    local = docs - wbase
                    inwin = valid & (local >= 0) & (local < WINDOW_SIZE)
                    # out-of-window/invalid postings -> coordinate 0 here,
                    # -1 after the gather's -1 bias below: they then miss
                    # every row of the scatter one-hots
                    hj1 = jnp.where(inwin, (local >> 7) + 1, 0).astype(
                        jnp.float32
                    )  # doc hi + 1 in [0, 128]
                    lj1 = jnp.where(inwin, (local & 127) + 1, 0).astype(
                        jnp.float32
                    )
                    # per-posting run bounds in block-relative element space
                    # (values < 2^23: 128 postings x freq < 2^16 — exact
                    # 3-byte transposes); invalid lanes get an empty run
                    big = np.float32((1 << 23) - 1)
                    lo_b = jnp.where(valid, epf.astype(jnp.float32), big)
                    hi_b = jnp.where(valid, (epf + fv).astype(jnp.float32), big)
                    loT = _transpose_lanes(lo_b, eyef, 3)  # (128,128) sub-bc
                    hiT = _transpose_lanes(hi_b, eyef, 3)
                    hjT = _transpose_lanes(hj1, eyef, 1)
                    ljT = _transpose_lanes(lj1, eyef, 1)
                    g0 = hits // 128
                    ng = (hits + S - 1) // 128 - g0 + 1

                    def pos_body(gi, accs):
                        g = g0 + gi
                        p0 = goff_at(g)
                        b = goff_at(g + 1) - p0
                        plr = p0 // 32 - ppr0
                        sh = one(p0 % 32)
                        pw0 = pos_s[pl.ds(plr, 1), :].astype(jnp.int32)
                        pw1 = pos_s[pl.ds(plr + 1, 1), :].astype(jnp.int32)
                        pvals = _bitfield(pw0, pw1, sh, one(b))  # (1,128)
                        rel = g * 128 + lane - hits
                        ev = (rel >= 0) & (rel < S)
                        relf = rel.astype(jnp.float32)
                        # posting-of-element one-hot: exactly one sublane j
                        # has loT[j] <= rel < hiT[j] for live lanes (runs
                        # partition [0, S)); dead lanes -> all-zero column
                        O = ((loT <= relf) & (relf < hiT)).astype(jnp.float32)
                        # element doc coords: multiply + sublane reduce (O
                        # is one-hot per column, coords+1 <= 128 — exact);
                        # dead/out-of-window columns sum to 0 -> coord -1
                        hi_e = (O * hjT).sum(axis=0, keepdims=True) - 1.0
                        lo_e = (O * ljT).sum(axis=0, keepdims=True) - 1.0
                        A = (hi_e == iota_subf).astype(jnp.float32)
                        oh_lo = lo_e == iota_subf  # (128, 128) bool
                        bitv = (1 << (pvals & 7)).astype(jnp.float32)
                        byte_of = pvals >> 3  # (1,128) target byte plane
                        accs = list(accs)
                        for bp in range(n_acc):
                            vsel = (byte_of == bp) & ev
                            V = jnp.where(oh_lo & vsel, bitv, 0.0)
                            accs[bp] = accs[bp] + _nt(A, V)
                        return tuple(accs)

                    return jax.lax.fori_loop(0, ng, pos_body, accs)

                accs = jax.lax.fori_loop(
                    0, n, block_body,
                    tuple(jnp.zeros((TILE, TILE), jnp.float32)
                          for _ in range(n_acc)),
                )
                for p in range(PW):
                    out_ref[0, ui, p] = (
                        accs[4 * p].astype(jnp.int32)
                        | (accs[4 * p + 1].astype(jnp.int32) << 8)
                        | (accs[4 * p + 2].astype(jnp.int32) << 16)
                        | (accs[4 * p + 3].astype(jnp.int32) << 24)
                    )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_windows", "n_members", "pw_words", "rpos_rows", "goff_rows",
        "interpret",
    ),
)
def materialize_posmask_tiles(
    bmeta,  # (rows, 128) i32 block meta (pack_block_meta)
    planes,  # (R_pad, 128) u32 doc/freq plane matrix
    hit_pw,  # (R2_pad, 128) u32 positions plane matrix (POS_GUARD_ROWS pad)
    hit_goff,  # (GR_pad, 128) i32 position group offsets, row-major
    cell_start,  # (W, M) i32 first block per cell
    cell_nblocks,  # (W, M) i32 blocks per cell (0 = absent)
    dpr,  # (W, M) i32 doc plane row start (block_plane_off[cs] // 32)
    ppr,  # (W, M) i32 position plane row start (goff[e0>>7] // 32)
    gor,  # (W, M) i32 group-offset ROW start ((e0>>7) // 128)
    *,
    n_windows: int,
    n_members: int,
    pw_words: int,
    rpos_rows: int,
    goff_rows: int,
    interpret: bool = False,
):
    """Returns i32[W, M, PW, 128, 128] position-presence words (see module
    doc). Cells with cell_nblocks == 0 come back all-zero."""
    W, M, PW = n_windows, n_members, pw_words
    TG = _posmask_tg(M, rpos_rows, interpret)
    kernel = _make_posmask_kernel(PW, rpos_rows, goff_rows, TG)
    wbase = jnp.arange(W, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(W, M // TG),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, TG, PW, TILE, TILE), lambda w, t, *_: (w, t, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.SMEM((TG, META_ROWS, META_PER_ROW * META_COLS), jnp.int32),
            pltpu.VMEM((TG, ROWS_FIXED, TILE), jnp.uint32),
            pltpu.VMEM((TG, rpos_rows, TILE), jnp.uint32),
            pltpu.SMEM((TG, goff_rows, TILE), jnp.int32),
            pltpu.SemaphoreType.DMA((TG, 4)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W, M, PW, TILE, TILE), jnp.int32),
        interpret=interpret,
    )(cell_start, cell_nblocks, dpr, ppr, gor, wbase,
      bmeta, planes, hit_pw, hit_goff)


def phrase_freq_from_masks(masks, k_members, pw_words):
    """popcount(AND over members m of (mask_m >> m)) per doc.

    masks: i32[K, W, PW, 128, 128] (member-major). Bit p of the AND is set
    iff member m occurs at p+m for every m — the anchored phrase test of
    docwordspace.cpp:3-15; positions are distinct per (term, doc) (builder
    commit invariant gating this path), so popcount IS the anchored count.
    Returns i32[W, 128, 128] phrase frequency for every doc."""
    PW = pw_words
    acc = None
    for m in range(k_members):
        wm = masks[m].astype(jnp.uint32)  # (W, PW, 128, 128)
        if m == 0:
            sh = wm
        else:
            # logical >> m across the PW word axis (m < 32: MaxPhraseSize)
            lo = jax.lax.shift_right_logical(wm, jnp.uint32(m))
            nxt = jnp.concatenate(
                [wm[:, 1:], jnp.zeros_like(wm[:, :1])], axis=1
            )
            hi = jax.lax.shift_left(nxt, jnp.uint32(32 - m))
            sh = lo | hi
        acc = sh if acc is None else acc & sh
    pc = jax.lax.population_count(acc).astype(jnp.int32)
    return pc.sum(axis=1)  # (W, 128, 128)
