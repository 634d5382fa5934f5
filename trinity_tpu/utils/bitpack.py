"""Bit-plane packing of postings blocks (host/numpy reference implementation).

The TPU-native replacement for FastPFor SIMD bit-packing
(lucene_codec.h:20-34, Makefile:22-28). Values are stored as *bit planes*:
for a block of up to 128 u32 values and bit width ``b``, plane ``j``
(j in [0, b)) is 128 bits = 4 u32 words, where bit ``t`` of word ``w`` holds
bit ``j`` of value ``32*w + t``. Unpacking is branch-free vector work on the
VPU: expand each plane's 4 words into 128 lanes, shift, and accumulate —
see `trinity_tpu.ops.unpack` for the Pallas kernel.

Unlike PFor there are no exception patches: ``b`` is the max bit length in
the block. This loses a little density on outlier-heavy blocks but keeps the
device decode entirely data-independent.
"""

from __future__ import annotations

import numpy as np

from trinity_tpu.limits import BLOCK_SIZE, PLANE_WORDS


def bit_width(max_value: int) -> int:
    """Number of bits needed to represent ``max_value`` (0 -> 0 bits)."""
    return int(max_value).bit_length()


def pack_planes(values: np.ndarray, bits: int) -> np.ndarray:
    """Pack up to BLOCK_SIZE u32 values into ``bits`` bit planes.

    Returns a u32 array of shape (bits * PLANE_WORDS,). Values beyond
    ``len(values)`` are implicitly zero. ``bits`` must cover every value.
    """
    n = len(values)
    assert n <= BLOCK_SIZE
    if bits == 0:
        return np.zeros(0, dtype=np.uint32)
    v = np.zeros(BLOCK_SIZE, dtype=np.uint64)
    v[:n] = np.asarray(values, dtype=np.uint64)
    assert bits >= bit_width(int(v.max(initial=0))), "bit width too small"
    j = np.arange(bits, dtype=np.uint64)[:, None]
    planes = ((v[None, :] >> j) & 1).astype(np.uint32)  # (bits, 128)
    planes = planes.reshape(bits, PLANE_WORDS, 32)
    t = np.arange(32, dtype=np.uint32)
    words = (planes << t).sum(axis=2, dtype=np.uint64) & 0xFFFFFFFF
    return words.astype(np.uint32).reshape(-1)


def unpack_planes(words: np.ndarray, bits: int, count: int = BLOCK_SIZE) -> np.ndarray:
    """Inverse of :func:`pack_planes`. Returns u32 array of shape (count,)."""
    if bits == 0:
        return np.zeros(count, dtype=np.uint32)
    w = np.asarray(words[: bits * PLANE_WORDS], dtype=np.uint32).reshape(
        bits, PLANE_WORDS
    )
    t = np.arange(32, dtype=np.uint32)
    bits_mat = ((w[:, :, None] >> t) & 1).reshape(bits, BLOCK_SIZE)
    j = np.arange(bits, dtype=np.uint32)[:, None]
    vals = (bits_mat.astype(np.uint64) << j).sum(axis=0) & 0xFFFFFFFF
    return vals.astype(np.uint32)[:count]
