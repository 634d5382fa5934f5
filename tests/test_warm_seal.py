"""Warmup-coverage sealing (VERDICT r3 #1).

The reference serves any query shape with zero compile cost
(exec.cpp:662-666). Here that property holds only if warmup touches every
program variant the serving workload can reach; these tests assert the
seal mechanism (utils/aotcache.seal_programs) proves coverage: after
warming a workload and sealing, re-serving the SAME workload dispatches no
new program variant, while a novel shape is detected (counted, and raised
in strict mode).
"""

import numpy as np
import pytest

from trinity_tpu.exec import Executor
from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.utils.aotcache import (
    post_seal_misses,
    seal_programs,
    unseal_programs,
)
from trinity_tpu.utils.metrics import get_metrics


@pytest.fixture(scope="module")
def ex():
    rng = np.random.default_rng(11)
    sess = SegmentIndexSession()
    for d in range(400):
        toks = [f"t{int(i)}" for i in rng.integers(0, 60, rng.integers(4, 24))]
        sess.bulk_index([d], [toks])
    return Executor(sess.commit())


WORKLOAD = [
    "t0 t1",
    "t2 OR t3 OR t4",
    "t5 NOT t6",
    '"t0 t1"',
]


@pytest.fixture(autouse=True)
def _unseal():
    yield
    unseal_programs()


def test_sealed_serving_dispatches_no_new_variant(ex):
    ex.warmup(WORKLOAD, k=10)
    before = post_seal_misses()
    seal_programs(strict=True)  # strict: a miss raises, not just counts
    # the serving loop: batched (pipelined) and single-stream, same queries
    h = ex.launch_batch(WORKLOAD, k=10)
    ex.finish_batch(h)
    for q in WORKLOAD:
        ex.search(q, k=10)
    assert post_seal_misses() == before


def test_post_seal_novel_shape_is_detected(ex):
    ex.warmup(WORKLOAD, k=10)
    seal_programs(strict=False)
    before = post_seal_misses()
    # a T-bucket the warmup never touched (many-term disjunction)
    novel = " OR ".join(f"t{i}" for i in range(11))
    ex.search(novel, k=10)
    assert post_seal_misses() > before


def test_post_seal_strict_raises(ex):
    ex.warmup(WORKLOAD, k=10)
    seal_programs(strict=True)
    novel = " ".join(f"t{i}" for i in range(9, 20))
    with pytest.raises(RuntimeError, match="warmup coverage hole"):
        ex.search(novel, k=10)
