import numpy as np
import pytest

from trinity_tpu.limits import BLOCK_SIZE
from trinity_tpu.utils.bitpack import (
    bit_width,
    pack_plane_matrix,
    plane_rows,
    unpack_plane_rows,
    values_from_planes,
)


def test_bit_width():
    assert bit_width(0) == 0
    assert bit_width(1) == 1
    assert bit_width(2) == 2
    assert bit_width(255) == 8
    assert bit_width(256) == 9
    assert bit_width(2**32 - 1) == 32


@pytest.mark.parametrize("bits", [1, 2, 3, 7, 8, 13, 16, 24, 32])
@pytest.mark.parametrize("count", [1, 5, 127, 128])
def test_plane_roundtrip(bits, count):
    rng = np.random.default_rng(bits * 1000 + count)
    hi = (1 << bits) - 1
    vals = rng.integers(0, hi + 1, size=count, dtype=np.uint64).astype(np.uint32)
    vals[0] = hi  # force full width
    rows = plane_rows(vals, bits)
    assert rows.shape == (bits, BLOCK_SIZE)
    out = values_from_planes(rows, count)
    np.testing.assert_array_equal(out, vals)


def test_zero_bits():
    rows = plane_rows(np.zeros(10, dtype=np.uint32), 0)
    assert rows.shape == (0, BLOCK_SIZE)
    np.testing.assert_array_equal(values_from_planes(rows, 10), np.zeros(10))


def test_matrix_pack_unpack_multiblock():
    """Several blocks' planes packed back-to-back, incl. straddling word rows."""
    rng = np.random.default_rng(99)
    blocks = []
    all_rows = []
    offsets = []
    p = 0
    for i in range(9):
        bits = int(rng.integers(1, 33))
        count = int(rng.integers(1, 129))
        vals = rng.integers(0, 1 << bits, size=count, dtype=np.uint64).astype(
            np.uint32
        )
        blocks.append((vals, bits, count))
        offsets.append(p)
        all_rows.append(plane_rows(vals, bits))
        p += bits
    pw = pack_plane_matrix(np.concatenate(all_rows))
    assert pw.shape == (-(-p // 32), BLOCK_SIZE)
    for (vals, bits, count), off in zip(blocks, offsets):
        rows = unpack_plane_rows(pw, off, bits)
        np.testing.assert_array_equal(values_from_planes(rows, count), vals)
