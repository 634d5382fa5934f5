"""Phrase verification (device pass, host fallback).

The reference verifies phrases per document inside the iterator tree:
Phrase::next leapfrogs the member conjunction, materializes every member's
hits and tests adjacency through DocWordsSpace (docset_iterators.cpp:66-224,
docwordspace.h:58-127). Here the conjunction runs densely on device
(stage 1 freq tiles), candidates are compacted on device, and adjacency is
verified ON DEVICE inside the same jitted program
(verify_phrases_device): member position runs are gathered straight from
the plane-packed positions stream via the hits-offset tiles (the
materialize_hits analog, lucene_codec.cpp:767-856) with static per-member
caps, and adjacency is an all-pairs compare + reduce. Members whose
segment-wide max freq exceeds the cap ladder fall back to the vectorized
host pass (verify_phrase_candidates), which is also what the lazy
bound-ordered single-phrase path uses for its early-exit chunks.

collect_phrases() fixes the phrase enumeration order shared by the device
pass A (candidate extraction) and pass C (tape evaluation with injected
phrase-frequency tiles).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# Per-member position-count cap ladder for the DEVICE verification path:
# gathers are padded to a bucket so plan shapes share compiled programs.
# Rungs <= 512 decode the whole run in one window (the hot shape); larger
# rungs stream the run through 512-lane windows inside a lax.fori_loop with
# a data-dependent trip count, so stopword-grade members (per-doc freq up to
# the 2^16 builder cap) stay ON DEVICE — the reference materializes hits for
# any freq (lucene_codec.cpp:767-856), and since round 3 so does this path.
FCAP_LADDER = (8, 64, 512, 4096, 65536)
SINGLE_WINDOW_FCAP = 512  # largest rung decoded without the window loop
WINDOW_GROUPS = 4  # groups per window-loop step (512 lanes)
TILE_LANES = 128  # positions-stream group width (plane matrix lane count)


def _lanes_used(fcap: int) -> int:
    """Trimmed decode width for a single-window member run."""
    return -(-(TILE_LANES - 1 + fcap) // 8) * 8


def _win_lanes(fcap: int) -> int:
    """Live lane width of one decode step (memory-budget accounting)."""
    if fcap <= SINGLE_WINDOW_FCAP:
        return _lanes_used(fcap)
    return WINDOW_GROUPS * TILE_LANES


def collect_phrases(tape) -> List[Tuple[tuple, int]]:
    """All ("phrase", slots, widx) nodes in traversal order -> [(slots, widx)]."""
    out: List[Tuple[tuple, int]] = []

    def walk(n):
        kind = n[0]
        if kind == "phrase":
            out.append((n[1], n[2]))
        elif kind in ("and", "or", "not"):
            walk(n[1])
            walk(n[2])
        elif kind in ("unot", "opt"):
            walk(n[1])
        elif kind == "some":
            for c in n[2]:
                walk(c)

    walk(tape)
    return out


def fcap_bucket(max_freq: int) -> int | None:
    """Smallest ladder rung >= max_freq, or None (host fallback)."""
    for b in FCAP_LADDER:
        if max_freq <= b:
            return b
    return None


def _decode_groups(hit_pw, hit_off, poc, g_off, ng, lmax, jnp):
    """Decode ng plane-packed groups starting g_off groups after each run's
    first group -> vals (c, min(ng*128, lmax)) i32.

    This is the TPU-shaped decode: a run [o, o+f) touches consecutive
    128-value groups; each group's <=14 bit planes span <=2 consecutive
    word rows of the packed matrix, so the whole read is row gathers
    (measured ~170x faster than flat element gathers on v5e) plus a
    vectorized contiguous-bit-field extract over all 128 lanes — the same
    trick as utils/bitpack.py:unpack_value_groups, batched. lmax trims the
    lane axis to lanes a run can actually occupy (dead-padding cut ~3x at
    fcap=8)."""
    G = hit_off.shape[0] - 1  # groups in the stream
    R = hit_pw.shape[0]  # word rows incl. guard
    g0 = jnp.clip((poc >> 7) + g_off, 0, max(0, G - 1))  # (c,)
    gs = jnp.clip(
        g0[:, None] + jnp.arange(ng + 1, dtype=jnp.int32)[None, :], 0, G
    )
    offv = hit_off[gs]  # (c, ng+1) plane-row offsets
    p0 = offv[:, :ng]
    b = (offv[:, 1:] - p0).astype(jnp.uint32)  # bit width per group
    r0 = jnp.clip(p0 >> 5, 0, R - 1)
    sh = (p0 & 31).astype(jnp.uint32)
    w0 = hit_pw[r0]  # (c, ng, 128) row gathers
    w1 = hit_pw[jnp.clip(r0 + 1, 0, R - 1)]
    hi = jnp.where(
        (sh > 0)[..., None],
        w1 << (((jnp.uint32(32) - sh) & jnp.uint32(31))[..., None]),
        jnp.uint32(0),
    )
    vals = ((w0 >> sh[..., None]) | hi) & (
        ((jnp.uint32(1) << b) - jnp.uint32(1))[..., None]
    )
    c = poc.shape[0]
    return vals.astype(jnp.int32).reshape(c, ng * 128)[:, :lmax]


def _decode_member_lanes(hit_pw, hit_off, poc, pfc_m, fcap, jnp):
    """Single-window decode of one member's whole position run (fcap <=
    SINGLE_WINDOW_FCAP): (vals (c, L), run_mask (c, L)), L =
    _lanes_used(fcap). lo = o & 127 <= 127 and f <= fcap bound the run to
    the first 127 + fcap lanes."""
    ng = (fcap + 126) // 128 + 1
    lmax = _lanes_used(fcap)  # 144 / 192 / 640
    vals = _decode_groups(hit_pw, hit_off, poc, 0, ng, lmax, jnp)
    lane = jnp.arange(lmax, dtype=jnp.int32)[None, :]
    lo = (poc & 127)[:, None]
    run = (lane >= lo) & (lane < lo + pfc_m[:, None])
    return vals, run


def _window_count(fcap: int) -> int:
    """Static window-loop trip count covering a full fcap-sized run."""
    ng = (fcap + 126) // 128 + 1
    return -(-ng // WINDOW_GROUPS)


def _member_window_hit(hit_pw, hit_off, poc, pfc_m, fcap, tgt, jax, jnp):
    """Streamed adjacency test for a high-freq member (fcap >
    SINGLE_WINDOW_FCAP): does member position == tgt for each tgt lane?
    The run streams through 512-lane windows inside lax.fori_loop — live
    memory stays one window, and the trip count is data-dependent (the
    largest actual freq in the chunk), so a 4096-rung member whose chunk
    tops out at 300 positions pays one step, not nine."""
    c, L0 = tgt.shape
    wl = WINDOW_GROUPS * TILE_LANES
    nwin_static = _window_count(fcap)
    lo = (poc & 127)[:, None]
    end = lo + pfc_m[:, None]  # first lane past each run
    # windows at or past ceil(max(end)/wl) are all-dead for the chunk
    nwin_dyn = jnp.minimum(
        (jnp.max(end) + wl - 1) // wl, nwin_static
    ).astype(jnp.int32)
    lane0 = jnp.arange(wl, dtype=jnp.int32)[None, :]

    def body(w, hit):
        vals = _decode_groups(
            hit_pw, hit_off, poc, w * WINDOW_GROUPS, WINDOW_GROUPS, wl, jnp
        )
        lane = lane0 + w * wl
        run = (lane >= lo) & (lane < end)
        h = ((vals[:, None, :] == tgt[:, :, None]) & run[:, None, :]).any(
            axis=2
        )
        return hit | h

    return jax.lax.fori_loop(
        0, nwin_dyn, body, jnp.zeros((c, L0), bool)
    )


def verify_phrases_device(
    hit_pw,
    hit_off,
    valid,
    freqs,
    offs,
    fcaps: Tuple[int, ...],
    bytes_budget: int = 1 << 29,
    vol_budget: int = 1 << 33,
):
    """Device twin of verify_phrase_candidates: exact phrase frequency per
    candidate, computed inside the jitted program (no host round-trip).

    valid: bool (...,), freqs/offs: i32 (..., K); fcaps[m] is a static
    position-count cap >= member m's segment-wide max freq (so the decoded
    group count is static and never truncates a run). Adjacency is an
    all-pairs compare in the decoded lane domain under run masks — no
    element gathers anywhere. Members above SINGLE_WINDOW_FCAP stream
    their run through the fori window loop (_member_window_hit) — incl.
    member 0, whose anchor windows drive an outer loop so counts stay
    anchored on member 0's positions (exact duplicate-position semantics,
    docwordspace.cpp:3-15). Candidates run FLAT by default: all the
    per-candidate row gathers must live in ONE gather op so XLA pipelines
    their DMAs — inside a sequential lax.map each chunk's gathers are
    latency-bound round trips that cannot overlap across iterations
    (measured r4, fcaps=(64,64) C2=8192 B=12: 54 chunks at the old 2^26
    compare-volume budget = ~305 ms of a 342 ms program, ~3.1 us per
    candidate; the same gathers+compares flat are ~ms-scale). Chunking
    only kicks in when the flat form would blow live memory (bytes_budget
    caps decoded lane bytes) or the fused all-pairs compare volume
    (vol_budget); dead chunks (candidate arrays are sized for the worst
    query in the batch) still skip decode+compare via lax.cond."""
    import jax
    import jax.numpy as jnp

    lead = valid.shape
    k = freqs.shape[-1]
    assert k >= 2 and len(fcaps) == k
    n = int(np.prod(lead))
    pf2 = freqs.reshape(n, k)
    po2 = offs.reshape(n, k)
    v2 = valid.reshape(n)

    def member_decoded(pfc, poc):
        """Single-window members' (vals, run) lanes, decoded ONCE per
        chunk: inside the high-freq-anchor fori these are loop-invariant,
        and XLA does not hoist size-inflating gathers out of while loops —
        decoding them up front multiplies out the anchor window count."""
        return {
            m: _decode_member_lanes(
                hit_pw, hit_off, poc[:, m], pfc[:, m], fcaps[m], jnp
            )
            for m in range(1, k)
            if fcaps[m] <= SINGLE_WINDOW_FCAP
        }

    def anchor_block(pfc, poc, start, ok, decoded):
        """AND every member's adjacency over one anchor lane block."""
        for m in range(1, k):
            tgt = start + m  # (c, L0)
            if fcaps[m] <= SINGLE_WINDOW_FCAP:
                vals, run = decoded[m]
                hit = (
                    (vals[:, None, :] == tgt[:, :, None]) & run[:, None, :]
                ).any(axis=2)
            else:
                hit = _member_window_hit(
                    hit_pw, hit_off, poc[:, m], pfc[:, m], fcaps[m], tgt,
                    jax, jnp,
                )
            ok = ok & hit
        return ok.sum(axis=1).astype(jnp.int32)

    def live_chunk(pfc, poc):
        decoded = member_decoded(pfc, poc)
        if fcaps[0] <= SINGLE_WINDOW_FCAP:
            start, ok = _decode_member_lanes(
                hit_pw, hit_off, poc[:, 0], pfc[:, 0], fcaps[0], jnp
            )
            return anchor_block(pfc, poc, start, ok, decoded)
        # high-freq anchor: stream its run through windows as well; each
        # anchor position lands in exactly one window, so per-window counts
        # sum to the member-0-anchored phrase frequency
        wl = WINDOW_GROUPS * TILE_LANES
        lo = (poc[:, 0] & 127)[:, None]
        end = lo + pfc[:, 0][:, None]
        nwin_dyn = jnp.minimum(
            (jnp.max(end) + wl - 1) // wl, _window_count(fcaps[0])
        ).astype(jnp.int32)
        lane0 = jnp.arange(wl, dtype=jnp.int32)[None, :]

        def body(w, total):
            start = _decode_groups(
                hit_pw, hit_off, poc[:, 0], w * WINDOW_GROUPS,
                WINDOW_GROUPS, wl, jnp,
            )
            lane = lane0 + w * wl
            run = (lane >= lo) & (lane < end)
            return total + anchor_block(pfc, poc, start, run, decoded)

        return jax.lax.fori_loop(
            0, nwin_dyn, body, jnp.zeros(poc.shape[:1], jnp.int32)
        )

    def one_chunk(args):
        pfc, poc, vld = args  # (c, K), (c, K), (c,)
        return jax.lax.cond(
            vld.any(),
            lambda: live_chunk(pfc, poc),
            lambda: jnp.zeros(pfc.shape[:1], jnp.int32),
        )

    # live decoded bytes per candidate (i32 lanes, w0+w1 row pulls ~2x)
    bytes_per = 8 * sum(_win_lanes(f) for f in fcaps)
    # fused compare volume per candidate: anchor lanes x widest member
    vol = _win_lanes(fcaps[0]) * max(_win_lanes(f) for f in fcaps[1:])
    chunk = max(
        128, min(bytes_budget // max(1, bytes_per), vol_budget // max(1, vol))
    )
    if chunk >= n:
        out = live_chunk(pf2, po2)
    else:
        nc = -(-n // chunk)
        pad = nc * chunk - n
        pf3 = jnp.pad(pf2, ((0, pad), (0, 0))).reshape(nc, chunk, k)
        po3 = jnp.pad(po2, ((0, pad), (0, 0))).reshape(nc, chunk, k)
        v3 = jnp.pad(v2, (0, pad)).reshape(nc, chunk)
        out = jax.lax.map(one_chunk, (pf3, po3, v3)).reshape(-1)[:n]
    return jnp.where(valid, out.reshape(lead), 0)


def verify_phrase_candidates(
    positions: np.ndarray,  # u16 positions stream of the segment
    valid: np.ndarray,  # (N,) bool — live candidates
    freqs: np.ndarray,  # (N, K) i32 member freqs
    offs: np.ndarray,  # (N, K) i32 member hits offsets
    chunk: int = 8192,
) -> np.ndarray:
    """Exact phrase frequency per candidate -> (N,) i32.

    A phrase occurs at position p iff member k's positions contain p + k for
    every k (docwordspace.cpp:3-15 test_phrase semantics). Vectorized: pad
    each member's position runs to its max freq, compare all (start, hit)
    pairs, chunked over candidates to bound memory.
    """
    n, k = freqs.shape
    out = np.zeros(n, np.int32)
    if not valid.any():
        return out
    idx = np.flatnonzero(valid)
    for c0 in range(0, len(idx), chunk):
        sel = idx[c0 : c0 + chunk]
        f = freqs[sel]
        o = offs[sel]
        fmax = [int(f[:, m].max(initial=1)) for m in range(k)]
        # padded position matrices per member; padding sentinel never matches
        pos = []
        for m in range(k):
            j = np.arange(fmax[m])
            gather = o[:, m, None] + np.minimum(j[None, :], f[:, m, None] - 1)
            pm = positions[gather].astype(np.int64)
            pm[j[None, :] >= f[:, m, None]] = -(10**6) * (m + 1)
            pos.append(pm)
        start = pos[0]  # (C, F0)
        ok = np.ones(start.shape, bool)
        for m in range(1, k):
            target = start + m  # (C, F0)
            hit = (pos[m][:, None, :] == target[:, :, None]).any(axis=2)
            ok &= hit
        out[sel] = ok.sum(axis=1)
    return out
