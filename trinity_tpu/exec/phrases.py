"""Phrase verification (hybrid device/host pass).

The reference verifies phrases per document inside the iterator tree:
Phrase::next leapfrogs the member conjunction, materializes every member's
hits and tests adjacency through DocWordsSpace (docset_iterators.cpp:66-224,
docwordspace.h:58-127). Here the conjunction runs densely on device
(stage 1 freq tiles), candidates are compacted on device, and adjacency is
verified as one vectorized host pass over the candidates' position runs —
gathered directly from the positions stream via the hits-offset tiles (the
materialize_hits analog, lucene_codec.cpp:767-856).

collect_phrases() fixes the phrase enumeration order shared by the device
pass A (candidate extraction) and pass C (tape evaluation with injected
phrase-frequency tiles).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


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
