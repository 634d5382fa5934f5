"""Multi-chip sharded execution on a virtual 8-device CPU mesh (SURVEY §4c)."""

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from trinity_tpu.parallel import MeshExecutor, split_segment
from tests.test_exec_e2e import make_corpus


@pytest.fixture(scope="module")
def sharded():
    rng = np.random.default_rng(31)
    seg, corpus = make_corpus(
        rng, n_docs=40_000, vocab=300, doc_len_rng=(3, 9), id_stride=2
    )
    return seg, Executor(seg), MeshExecutor(seg, n_shards=8)


def test_split_preserves_postings(sharded):
    seg, _, mex = sharded
    assert sum(s.n_docs for s in mex.shards) == seg.n_docs
    # df per term sums across shards
    for term in [b"t0", b"t5", b"t250"]:
        total = sum(
            int(s.term_df[s.term_id(term)])
            for s in mex.shards
            if s.term_id(term) >= 0
        )
        assert total == int(seg.term_df[seg.term_id(term)])


@pytest.mark.parametrize(
    "qtext", ["t0 t1", "t5 OR t9 OR t17", "t3 NOT t2", "[t1, t2, t3]", "t299"]
)
def test_mesh_parity_with_single_device(sharded, qtext):
    _, ex, mex = sharded
    a = [(r.doc_id, r.score) for r in ex.search(qtext, k=10)]
    b = [(r.doc_id, r.score) for r in mex.search(qtext, k=10)]
    assert [x[0] for x in a] == [x[0] for x in b], qtext
    np.testing.assert_allclose(
        [x[1] for x in a], [x[1] for x in b], rtol=1e-6
    )


def test_mesh_uses_all_devices(sharded):
    import jax

    _, _, mex = sharded
    assert len(mex.mesh.devices.reshape(-1)) == min(8, len(jax.devices()))


def test_mesh_phrase_parity(sharded):
    _, ex, mex = sharded
    for qtext in ['"t0 t1"', '"t1 t2" OR t7']:
        a = [(r.doc_id, r.score) for r in ex.search(qtext, k=10)]
        b = [(r.doc_id, r.score) for r in mex.search(qtext, k=10)]
        assert a == b, qtext
