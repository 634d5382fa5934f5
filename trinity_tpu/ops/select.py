"""Exact large-domain candidate selection without a large-domain top_k.

The lazy phrase path must pull the top-C2 member-conjunction candidates by
(bound desc, docid asc) out of a dense (B, n_docs) integer bound array
(bound = min member freq; the reference's Phrase::next leapfrog order,
docset_iterators.cpp:66-150, materializes the same candidates one at a
time). `lax.top_k` costs ~1.4-1.8 ns per ELEMENT of its domain on v5e
regardless of k, so top_k(B, 1M -> 8192) alone is ~20-33 ms — the single
largest piece of the round-1 phrase program.

Integer bounds make an exact threshold selection cheap instead:

1. binary-search tau = max{v : |{bound >= v}| > C2} over the integer bound
   range (bounds are capped by the fcap ladder, <= 512, so <= 10
   vectorized count passes);
2. the exact top-C2-by-(bound desc, docid asc) set is then
   {bound > tau}  U  {first (C2 - |{bound > tau}|) docs with bound == tau
   in docid order} — identical to lax.top_k's tie rule (lower index wins);
3. compact that set into C2 slots IN DOCID ORDER with a cumsum + scatter
   (slot = #kept-before-me), so the downstream score top_k keeps the
   docid-asc tie-break without any argsort.

Every pass is elementwise compare / reduce / cumsum / one scatter —
bandwidth-bound streams over the bound array instead of a sort network.
"""

from __future__ import annotations

import os

import numpy as np

# Row-gather + lane-extract for all (B, n)-domain column gathers (see
# gather_cols). The toggle is read at IMPORT time (builder lru + jit trace
# caches don't key it), so A/B profiling needs a subprocess per variant
# (tools/ab_gather.py); production always runs the row-gather path.
USE_ROWGATHER = os.environ.get("TRINITY_ROWGATHER", "1") != "0"


def bound_select_candidates(bound, C2: int, vmax: int,
                            assume_no_overflow: bool = False):
    """Exact top-C2 selection by (bound desc, docid asc).

    assume_no_overflow: the caller PROVES candidates <= C2 (e.g. C2 >= the
    rarest member's segment df bounds the conjunction count) — tau is 0 by
    construction, so the threshold binary search and the eq-class quota
    vanish and selection is pure docid-order compaction of bound > 0.

    bound: (B, N) int32 in [0, vmax]; 0 means non-candidate.
    Returns (ki (B, C2) i32 docids ascending, valid (B, C2) bool,
    tau (B,) i32, overflow (B,) bool). The selected set equals
    lax.top_k(bound, C2)'s (ties toward lower docid); when overflowing,
    tau is the MAXIMUM UNPULLED bound — every candidate left behind has
    bound <= tau, so `kth_score > score(tau)` proves the pulled set covers
    the true top-k (tau <= the C2-th pulled bound; strictly tighter when
    count(bound > tau) == C2 exactly).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    B, N = bound.shape

    if assume_no_overflow:
        ki, valid = compact_mask(bound > 0, C2)
        z = jnp.zeros((B,), jnp.int32)
        return ki, valid, z, z > 0

    # 1. binary search tau: invariant count(bound >= lo) > C2 >= count(>= hi)
    lo = jnp.zeros((B,), jnp.int32)
    hi = jnp.full((B,), vmax + 1, jnp.int32)

    def step(carry, _):
        lo, hi = carry
        mid = (lo + hi) // 2
        cnt = (bound >= mid[:, None]).sum(axis=1)
        gt = cnt > C2
        return (jnp.where(gt, mid, lo), jnp.where(gt, hi, mid)), None

    iters = max(1, int(np.ceil(np.log2(vmax + 2))))
    (tau, _), _ = lax.scan(step, (lo, hi), None, length=iters)
    overflow = tau > 0  # tau >= 1  <=>  count(bound >= 1) > C2

    # 2. membership: all of bound > tau, docid-first C2-n_above of == tau
    above = bound > tau[:, None]
    n_above = above.sum(axis=1)
    lim = jnp.where(overflow, jnp.int32(C2) - n_above, jnp.int32(-1))
    eq = bound == tau[:, None]
    pos_eq = jnp.cumsum(eq.astype(jnp.int32), axis=1)  # 1-indexed inclusive
    kept = above | (eq & (pos_eq <= lim[:, None]))

    # 3. docid-order compaction (scatter-free: a (B, N)->(B, C2) XLA
    # scatter measured 61 ms on v5e — serialized update loop)
    ki, valid = compact_mask(kept, C2)
    return ki, valid, tau, overflow


LBLK = 128  # compaction block width (one lane register row)


def gather_cols(arr, ki):
    """arr[..., ki] along the last axis — WITHOUT element gathers.

    Element gathers on v5e cost ~7 ns/element whether expressed flat or as
    take_along_axis (measured, CLAUDE.md): the four (B, 1M) -> (B, C2)
    member pf/po gathers alone were +3.3 ms of the 10.2 ms fused phrase
    program (tools/profile_phrase_r3.py). Contiguous (1, 128) ROW gathers
    are ~170x cheaper and lane extraction is an elementwise compare+reduce
    (~2e12 el/s, effectively free), so: view the source as 128-wide rows,
    row-gather ki // 128, compare-reduce lane ki % 128. Exact for any
    dtype (exactly one surviving lane per output element).

    arr: (..., N) with N % 128 == 0; ki: (..., C) int32 indices into the
    last axis (leading dims must match arr's). Returns (..., C) of
    arr.dtype. The reference walks postings cursors one doc at a time
    (docset_iterators.cpp:66-150); this is the dense-tile equivalent of
    materializing a candidate subset.
    """
    import jax.numpy as jnp

    n = arr.shape[-1]
    if not USE_ROWGATHER or n % LBLK or arr.shape[:-1] != ki.shape[:-1]:
        return jnp.take_along_axis(arr, ki, axis=-1)
    a3 = arr.reshape(*arr.shape[:-1], n // LBLK, LBLK)
    rows = jnp.take_along_axis(a3, (ki // LBLK)[..., None], axis=-2)
    lane = (ki % LBLK)[..., None] == jnp.arange(LBLK, dtype=jnp.int32)
    if arr.dtype == jnp.bool_:
        return jnp.any(rows & lane, axis=-1)
    # dtype pinned: jnp.sum would promote sub-32-bit ints, breaking the
    # "returns arr.dtype" contract and A/B identity with take_along_axis
    # (exact: exactly one nonzero lane per output element)
    return jnp.sum(
        jnp.where(lane, rows, jnp.zeros((), arr.dtype)), axis=-1,
        dtype=arr.dtype,
    )


def compact_mask(kept, C2: int):
    """Compact a (B, N) bool mask into (B, C2) member indices in ascending
    order — EXACT for any input, without scatter, sort, or a large-domain
    top_k (the three lowerings that are slow on TPU: an XLA scatter of this
    shape measured 61 ms, top_k costs ~1.4 ns/element of domain).

    Slot-major two-level lookup, all fused compare/reduce streams plus one
    row gather:
      1. per 128-lane block: inclusive in-block rank (cumsum over 128),
         block counts, inclusive block-count prefix `blockcum`;
      2. per output slot s: owning block = sum over blocks of
         [blockcum <= s] (XLA fuses the (B, nblk, C2) virtual compare cube
         into the reduction), in-block rank q = s - exclusive prefix;
      3. lane: row-gather the owning block's 128-wide rank row ((B, C2,
         128) contiguous rows — ~170x cheaper than element gathers on
         v5e) and compare-reduce for the first lane with rank == q+1.

    Returns (ki (B, C2) i32 ascending, valid (B, C2) bool).
    """
    import jax.numpy as jnp

    B, N = kept.shape
    if N % LBLK:  # engine windows are 128-divisible; pad for small inputs
        kept = jnp.pad(kept, ((0, 0), (0, LBLK - N % LBLK)))
        N = kept.shape[1]
    nblk = N // LBLK
    k3 = kept.reshape(B, nblk, LBLK)
    rank = jnp.cumsum(k3.astype(jnp.int32), axis=2)  # inclusive in-block
    cnt = rank[:, :, -1]  # (B, nblk)
    blockcum = jnp.cumsum(cnt, axis=1)  # (B, nblk) inclusive
    s = jnp.arange(C2, dtype=jnp.int32)
    bs = jnp.sum(
        (blockcum[:, :, None] <= s[None, None, :]).astype(jnp.int32), axis=1
    )  # (B, C2) owning block per slot
    valid = s[None, :] < blockcum[:, -1:]
    bsc = jnp.minimum(bs, nblk - 1)
    excl = blockcum - cnt  # exclusive block prefix counts
    base = jnp.take_along_axis(excl, bsc, axis=1)
    q = s[None, :] - base  # 0-based rank of slot s within its block
    rrow = jnp.take_along_axis(rank, bsc[:, :, None], axis=1)  # (B, C2, 128)
    krow = (
        jnp.concatenate([rrow[:, :, :1], rrow[:, :, 1:] - rrow[:, :, :-1]],
                        axis=2) > 0
    )  # kept mask recovered from the rank row (no second gather)
    hit = krow & (rrow == q[:, :, None] + 1)
    lane = jnp.sum(
        jnp.where(hit, jnp.arange(LBLK, dtype=jnp.int32)[None, None, :], 0),
        axis=2,
    )
    return bsc * LBLK + lane, valid
