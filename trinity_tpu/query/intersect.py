"""Co-occurrence mining: which subsets of query tokens match together.

The analog of intersect.{h,cpp}: the reference runs an N-way merge across
up to 64 token-groups' postings, building a per-document token bitmask and
counting distinct masks, deduplicating dominated ones (intersect.cpp:5-170);
`intersection_alternatives` ranks the surviving subsets as "did you mean"
candidates (intersect.cpp:219-327).

TPU-native: token presence masks are the stage-1 frequency tiles the engine
already produces — the per-document bitmask is one weighted sum of presence
tiles (bit i = token i present), computed in the same jitted program, then
histogrammed on the host (the result set is tiny: <= 2^tokens masks).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

from trinity_tpu.limits import WINDOW_SIZE

MAX_INTERSECT_TOKENS = 64  # reference parity (intersect.h uint64_t masks)
_PLANE_BITS = 30  # bits per i32 mask plane (avoid the sign bit)


@functools.lru_cache(maxsize=64)
def _build_mask_fn(W, T, interpret):
    import jax
    import jax.numpy as jnp

    from trinity_tpu.ops.postings import materialize_freq_tiles

    nplanes = -(-T // _PLANE_BITS)

    def run(bmeta, planes, cell_start, cell_nblocks, n_docs):
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
        bits = (freq > 0).astype(jnp.int32)
        gid = (
            jnp.arange(W, dtype=jnp.int32)[:, None] * WINDOW_SIZE
            + jnp.arange(WINDOW_SIZE, dtype=jnp.int32)[None, :]
        )
        live = gid < n_docs
        # the reference packs up to 64 tokens into one uint64_t mask
        # (intersect.h); i32 lanes carry 30 bits each -> up to 3 planes
        outs = []
        for p in range(nplanes):
            lo, hi = p * _PLANE_BITS, min(T, (p + 1) * _PLANE_BITS)
            w = (1 << jnp.arange(hi - lo, dtype=jnp.int32))[None, :, None]
            masks = jnp.sum(bits[:, lo:hi] * w, axis=1)  # (W, WINDOW)
            outs.append(jnp.where(live, masks, 0))
        return jnp.stack(outs, axis=0)  # (nplanes, W, WINDOW)

    from trinity_tpu.utils.aotcache import aot_jit

    return aot_jit(run, "_build_mask_fn", W, T, interpret)


def intersect(executor, tokens: Sequence[str]) -> List[Tuple[int, int]]:
    """Returns [(token bitmask, document count)] sorted by count desc,
    dominated masks removed: a mask is dropped if a strict superset matches
    at least as many documents (intersect.cpp:5-170 dedup semantics)."""
    if len(tokens) > MAX_INTERSECT_TOKENS:
        raise ValueError(f"at most {MAX_INTERSECT_TOKENS} tokens")
    from trinity_tpu.ops.postings import compute_cells

    import jax.numpy as jnp

    seg = executor.seg
    tids = [seg.term_id(t) for t in tokens]
    cs, cn = compute_cells(seg, tids)
    fn = _build_mask_fn(seg.n_windows, len(tokens), executor.interpret)
    planes_out = np.asarray(
        fn(
            executor.bmeta,
            executor.planes,
            jnp.asarray(cs),
            jnp.asarray(cn),
            np.int32(seg.n_docs),
        )
    ).reshape(-1, seg.n_windows * WINDOW_SIZE)
    masks = planes_out[0].astype(np.uint64)
    for p in range(1, planes_out.shape[0]):
        masks |= planes_out[p].astype(np.uint64) << np.uint64(p * _PLANE_BITS)
    # uint64 .tolist() yields non-negative Python ints (bit 63 safe)
    vals, counts = np.unique(masks[masks != 0], return_counts=True)
    pairs = sorted(zip(vals.tolist(), counts.tolist()), key=lambda p: -p[1])
    # drop dominated masks: strict subset with count <= a superset's count
    out = []
    for m, c in pairs:
        dominated = any(
            (m & m2) == m and m != m2 and c2 >= c for m2, c2 in pairs
        )
        if not dominated:
            out.append((m, c))
    return out


def intersection_alternatives(
    executor, tokens: Sequence[str], min_count: int = 1
) -> List[Tuple[List[str], int]]:
    """'Did you mean' / query relaxation: token subsets that co-occur,
    largest and most frequent first (intersection_alternatives analog,
    intersect.cpp:219-327)."""
    res = intersect(executor, tokens)
    out = []
    for mask, count in res:
        if count < min_count:
            continue
        subset = [t for i, t in enumerate(tokens) if mask & (1 << i)]
        out.append((subset, count))
    out.sort(key=lambda p: (-len(p[0]), -p[1]))
    return out
