"""bound_select_candidates must equal lax.top_k's (bound desc, docid asc)
selection exactly — set, ordering, tau, and overflow — across tie-heavy
integer bound distributions (the phrase conjunction shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trinity_tpu.ops.select import bound_select_candidates


@pytest.mark.parametrize("vmax", [1, 3, 8, 512])
@pytest.mark.parametrize("seed", [0, 1])
def test_matches_topk(vmax, seed):
    rng = np.random.default_rng(seed)
    B, N, C2 = 3, 5000, 64
    b = np.zeros((B, N), np.int32)
    for i in range(B):
        ncand = int(rng.integers(0, N))
        idx = rng.choice(N, ncand, replace=False)
        b[i, idx] = np.minimum(rng.geometric(0.6, ncand), vmax)
    bj = jnp.asarray(b)
    ki, valid, tau, ov = jax.jit(
        lambda x: bound_select_candidates(x, C2, vmax)
    )(bj)
    kb, kiref = jax.lax.top_k(bj, C2)
    ki, valid, tau, ov, kb, kiref = map(
        np.asarray, (ki, valid, tau, ov, kb, kiref)
    )
    for i in range(B):
        want = set(kiref[i][kb[i] > 0].tolist())
        got = ki[i][valid[i]].tolist()
        assert sorted(got) == got  # docid ascending
        assert set(got) == want
        nv = int((b[i] > 0).sum())
        assert bool(ov[i]) == (nv > C2)
        if ov[i]:
            # tau = max UNPULLED bound (the sound resolution threshold,
            # <= the C2-th pulled bound; tighter when count(bound>tau)==C2)
            unpulled = np.ones(N, bool)
            unpulled[got] = False
            assert tau[i] == b[i][unpulled].max()
            assert tau[i] <= kb[i, -1]


def test_all_zero_and_full():
    B, N, C2 = 2, 1000, 16
    z = jnp.zeros((B, N), jnp.int32)
    ki, valid, tau, ov = bound_select_candidates(z, C2, 8)
    assert not np.asarray(valid).any() and not np.asarray(ov).any()
    f = jnp.ones((B, N), jnp.int32)
    ki, valid, tau, ov = bound_select_candidates(f, C2, 8)
    assert np.asarray(valid).all() and np.asarray(ov).all()
    # overflow at uniform bound: first C2 docids win (docid tie-break)
    assert np.array_equal(np.asarray(ki)[0], np.arange(C2))
    assert np.asarray(tau).tolist() == [1, 1]
