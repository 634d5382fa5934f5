import numpy as np
import pytest

from trinity_tpu.limits import BLOCK_SIZE
from trinity_tpu.utils.bitpack import bit_width, pack_planes, unpack_planes


def test_bit_width():
    assert bit_width(0) == 0
    assert bit_width(1) == 1
    assert bit_width(2) == 2
    assert bit_width(255) == 8
    assert bit_width(256) == 9
    assert bit_width(2**32 - 1) == 32


@pytest.mark.parametrize("bits", [1, 2, 3, 7, 8, 13, 16, 24, 32])
@pytest.mark.parametrize("count", [1, 5, 127, 128])
def test_pack_unpack_roundtrip(bits, count):
    rng = np.random.default_rng(bits * 1000 + count)
    hi = (1 << bits) - 1
    vals = rng.integers(0, hi + 1, size=count, dtype=np.uint64).astype(np.uint32)
    vals[0] = hi  # force full width
    packed = pack_planes(vals, bits)
    assert packed.shape == (bits * (BLOCK_SIZE // 32),)
    out = unpack_planes(packed, bits, count)
    np.testing.assert_array_equal(out, vals)


def test_zero_bits():
    packed = pack_planes(np.zeros(10, dtype=np.uint32), 0)
    assert packed.size == 0
    np.testing.assert_array_equal(unpack_planes(packed, 0, 10), np.zeros(10))
