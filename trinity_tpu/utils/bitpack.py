"""Bit-plane packing of postings blocks (host/numpy reference implementation).

The TPU-native replacement for FastPFor SIMD bit-packing
(lucene_codec.h:20-34, Makefile:22-28). The segment's compressed postings
form one global **plane matrix**: a (total_planes, 128)-bit matrix whose row
``p`` holds bit ``j`` of a 128-value block's values (deltas or freqs), for
each block's planes stacked consecutively. The matrix is packed 32 plane-rows
per u32 into a ``(ceil(P/32), 128)`` u32 array ("PW"): bit ``j`` of word
``PW[r, l]`` is plane row ``32*r + j``, value lane ``l``.

This transposed layout is chosen *for the hardware*: a block's planes span at
most 3 consecutive 128-lane word-rows, so the Pallas decoder
(trinity_tpu/ops) does one row-aligned DMA, a single broadcast-shift
bit-expand over sublanes, and two weighted sublane reductions — no gathers,
no lane-dim reshapes, no per-word extraction. Packing stays perfect
(exact max-bit-width per block, zero padding between blocks), preserving
index-memory parity with the reference's PFor blocks.

A block with bit width 0 (all deltas zero / all freqs equal to 1) occupies
zero planes — the analog of the lucene codec's all-equal fast path
(lucene_codec.cpp:31-39).
"""

from __future__ import annotations

import numpy as np

from trinity_tpu.limits import BLOCK_SIZE

PLANES_PER_ROW = 32  # u32 word packs 32 plane rows


def bit_width(max_value: int) -> int:
    """Number of bits needed to represent ``max_value`` (0 -> 0 bits)."""
    return int(max_value).bit_length()


def plane_rows(values: np.ndarray, bits: int) -> np.ndarray:
    """Bit rows of up to BLOCK_SIZE values -> (bits, 128) uint32 in {0,1}.

    Row ``j`` is bit ``j`` of every value; values beyond len(values) are 0.
    """
    n = len(values)
    assert n <= BLOCK_SIZE
    if bits == 0:
        return np.zeros((0, BLOCK_SIZE), np.uint32)
    v = np.zeros(BLOCK_SIZE, dtype=np.uint64)
    v[:n] = np.asarray(values, dtype=np.uint64)
    assert bits >= bit_width(int(v.max(initial=0))), "bit width too small"
    j = np.arange(bits, dtype=np.uint64)[:, None]
    return ((v[None, :] >> j) & 1).astype(np.uint32)


def pack_plane_matrix(rows: np.ndarray) -> np.ndarray:
    """Pack a (P, 128) 0/1 bit matrix into (ceil(P/32), 128) u32 words."""
    P = len(rows)
    R = -(-P // PLANES_PER_ROW) if P else 0
    out = np.zeros((R, BLOCK_SIZE), np.uint32)
    for r in range(R):
        chunk = rows[r * PLANES_PER_ROW : (r + 1) * PLANES_PER_ROW]
        shifts = np.arange(len(chunk), dtype=np.uint32)[:, None]
        out[r] = (
            (chunk.astype(np.uint64) << shifts).sum(axis=0, dtype=np.uint64)
            & 0xFFFFFFFF
        ).astype(np.uint32)
    return out


def unpack_plane_rows(pw: np.ndarray, p0: int, bits: int) -> np.ndarray:
    """Extract plane rows [p0, p0+bits) from packed matrix -> (bits, 128)."""
    if bits == 0:
        return np.zeros((0, BLOCK_SIZE), np.uint32)
    p = np.arange(p0, p0 + bits)
    return (pw[p // PLANES_PER_ROW] >> (p % PLANES_PER_ROW)[:, None]) & 1


def values_from_planes(rows: np.ndarray, count: int = BLOCK_SIZE) -> np.ndarray:
    """Inverse of plane_rows: (bits, 128) rows -> u32 values[:count]."""
    if len(rows) == 0:
        return np.zeros(count, np.uint32)
    j = np.arange(len(rows), dtype=np.uint64)[:, None]
    vals = (rows.astype(np.uint64) << j).sum(axis=0) & 0xFFFFFFFF
    return vals.astype(np.uint32)[:count]
