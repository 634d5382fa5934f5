"""Boundary tests for the f32-docid envelope (limits.MAX_SEGMENT_DOCS) and
the percolator packed-key position field.

The reference serves full u32 docid spaces (common.h:28-43); here packed
batch outputs carry docids as f32 rows, so segments must stay below 2^24
docs — these tests prove the limit FAILS LOUDLY instead of silently
corrupting ids (the worst failure class)."""

import dataclasses

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from trinity_tpu.index.builder import SegmentIndexSession, _build_segment
from trinity_tpu.limits import MAX_SEGMENT_DOCS
from trinity_tpu.percolator import Percolator


def _tiny_seg():
    sess = SegmentIndexSession()
    p = sess.begin(1)
    p.insert("a", 1)
    sess.insert(p)
    return sess.commit()


def test_builder_rejects_2_24_docs():
    ids = np.arange(MAX_SEGMENT_DOCS, dtype=np.uint32)
    z = np.zeros(0, np.int64)
    with pytest.raises(ValueError, match="2\\^24"):
        _build_segment(
            ids, [b"a"], z, z, z, None, np.zeros(0, np.uint32),
            MAX_SEGMENT_DOCS,
        )


def test_builder_accepts_below_limit_boundary():
    # n_docs = 2^24 - 1 must NOT raise the guard (doc_map alloc only)
    ids = np.arange(MAX_SEGMENT_DOCS - 1, dtype=np.uint32)
    z = np.zeros(0, np.int64)
    seg = _build_segment(
        ids, [b"a"], z, z, z, None, np.zeros(0, np.uint32),
        MAX_SEGMENT_DOCS - 1,
    )
    assert seg.n_docs == MAX_SEGMENT_DOCS - 1


def test_executor_rejects_2_24_docs():
    seg = dataclasses.replace(
        _tiny_seg(), doc_map=np.zeros(MAX_SEGMENT_DOCS, np.uint32)
    )
    with pytest.raises(ValueError, match="2\\^24"):
        Executor(seg)


def test_mesh_rejects_2_24_total_docs():
    from trinity_tpu.parallel.mesh import MeshExecutor

    seg = _tiny_seg()
    half = dataclasses.replace(
        seg, doc_map=np.zeros(MAX_SEGMENT_DOCS // 2, np.uint32)
    )
    with pytest.raises(ValueError, match="2\\^24"):
        MeshExecutor([half, dataclasses.replace(half)])


# --------------------------------------------------------- percolator bounds
def test_percolator_phrase_at_position_limit():
    """Phrases whose probes touch the top of the 21-bit position field must
    stay exact: a match ending exactly at the max representable position is
    found, and probes stepping past the field never alias into the term
    bits (percolator.py packed-key layout)."""
    p = Percolator()
    q_abc = p.register('"a b c"')
    q_d = p.register("d")
    lim = 1 << 21
    # first_pos puts the last token at position lim-2 == the max position
    # the bounds check admits (first_pos + len == lim - 1)
    first = lim - 4
    docs = [
        ["a", "b", "c"],   # phrase ends at the max position -> match
        ["d", "a", "b"],   # phrase truncated at the doc end -> no match
        ["d", "d", "a"],   # only the first member present -> no match
    ]
    m = p.match_batch(docs, first_pos=first)
    assert m[:, q_abc].tolist() == [True, False, False]
    assert m[:, q_d].tolist() == [False, True, True]
    # one past the field: the bounds check itself must reject
    with pytest.raises(ValueError, match="packed-key bounds"):
        p.match_batch([["a", "b", "c"]], first_pos=lim - 3)
