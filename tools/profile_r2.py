"""Round-2 profiling: where does a bench rep actually go?

Builds the 1M-doc bench corpus, then times each piece on the real TPU:
per-group search_batch, stage-1 kernel alone, stage-2 tape+topk alone,
flat top_k alone, and the phrase lazy-fused pieces.

Run ONE at a time, health-gated (CLAUDE.md TPU rules).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # health gate
    deadline = time.time() + 420
    while True:
        try:
            jax.block_until_ready(jnp.arange(4.0).sum())
            break
        except Exception as e:  # noqa: BLE001
            if time.time() > deadline:
                raise
            log(f"device unavailable ({type(e).__name__}); retrying...")
            time.sleep(30)
    log(f"backend={jax.default_backend()}")

    import bench
    from trinity_tpu.exec import Executor

    t0 = time.time()
    seg = bench.build_corpus()
    log(f"corpus built in {time.time()-t0:.0f}s")
    ex = Executor(seg)
    rng = np.random.default_rng(bench.SEED + 1)
    queries = bench.make_queries(rng)

    groups = {
        "AND": [q for i, q in enumerate(queries) if i % 10 < 4],
        "OR": [q for i, q in enumerate(queries) if 4 <= i % 10 < 7],
        "NOT": [q for i, q in enumerate(queries) if 7 <= i % 10 < 9],
        "PHRASE": [q for i, q in enumerate(queries) if i % 10 == 9],
    }
    # warm everything
    for name, qs in groups.items():
        t1 = time.time()
        ex.search_batch(qs, k=10)
        log(f"warm {name}: {time.time()-t1:.1f}s ({len(qs)} queries)")

    for name, qs in groups.items():
        ts = []
        for _ in range(5):
            t1 = time.perf_counter()
            ex.search_batch(qs, k=10)
            ts.append(time.perf_counter() - t1)
        log(f"group {name}: n={len(qs)} best={min(ts)*1e3:.1f}ms "
            f"med={sorted(ts)[2]*1e3:.1f}ms")

    # ---- stage-1 kernel alone: AND shape (B=48 bucket, T=2) ----
    from trinity_tpu.exec.executor import _pad_T
    from trinity_tpu.ops.postings import compute_cells, materialize_freq_tiles
    from trinity_tpu.plan.compile import compile_plan
    from trinity_tpu.query.parser import parse_query

    and_qs = groups["AND"]
    T = _pad_T(2)
    B = 48
    W = seg.n_windows
    cs = np.zeros((W, B * T), np.int32)
    cn = np.zeros((W, B * T), np.int32)
    nblocks_tot = 0
    for bi, q in enumerate(and_qs):
        plan = compile_plan(parse_query(q).root)
        tids = [seg.term_id(t) for t in plan.term_texts]
        c_s, c_n = compute_cells(seg, tids)
        cs[:, bi * T : bi * T + plan.n_slots] = c_s
        cn[:, bi * T : bi * T + plan.n_slots] = c_n
        nblocks_tot += int(c_n.sum())
    log(f"AND group: total blocks decoded per program = {nblocks_tot}")
    csj, cnj = jnp.asarray(cs), jnp.asarray(cn)

    def time_fn(fn, *args, n=5, label=""):
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(n):
            t1 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t1)
        log(f"{label}: best={min(ts)*1e3:.2f}ms med={sorted(ts)[n//2]*1e3:.2f}ms")
        return min(ts)

    k1 = lambda: materialize_freq_tiles(
        ex.bmeta, ex.planes, csj, cnj, n_windows=W, n_terms=B * T
    )
    time_fn(lambda: k1(), n=5, label=f"stage1 kernel (W={W}, BT={B*T})")

    # with offsets (the phrase-path variant)
    k1o = lambda: materialize_freq_tiles(
        ex.bmeta, ex.planes, csj, cnj, n_windows=W, n_terms=B * T,
        with_offsets=True,
    )
    time_fn(lambda: k1o(), n=3, label="stage1 kernel with_offsets")

    # ---- top_k alone over (B, W*N) ----
    import functools

    N = W * 16384
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N), jnp.float32)

    @jax.jit
    def tk(x):
        return jax.lax.top_k(x.reshape(B, -1), 10)

    time_fn(tk, x, n=5, label=f"flat top_k k=10 over (B={B}, {N})")

    @jax.jit
    def tk8192(x):
        return jax.lax.top_k(x.reshape(1, -1), 8192)

    x1 = x[:1]
    time_fn(tk8192, x1, n=3, label=f"top_k k=8192 over (1, {N})")

    # ---- stage 2 alone (tape eval + where + topk on existing tiles) ----
    tiles = jax.block_until_ready(k1())

    @jax.jit
    def stage2(tiles, w):
        freq = tiles.reshape(W, B, T, 16384).transpose(1, 0, 2, 3)
        f0 = freq[:, :, 0, :]
        f1 = freq[:, :, 1, :]
        m = (f0 > 0) & (f1 > 0)
        s = (w[:, 0, None, None] * f0) / (f0 + 1.2) + (
            w[:, 1, None, None] * f1
        ) / (f1 + 1.2)
        sc = jnp.where(m, s, -jnp.inf)
        return jax.lax.top_k(sc.reshape(B, -1), 10)

    wts = jnp.ones((B, 2), jnp.float32)
    time_fn(stage2, tiles, wts, n=5, label="stage2 (AND tape + topk)")

    # ---- per-window max reduce cost (for two-phase design) ----
    @jax.jit
    def wmax(tiles, w):
        freq = tiles.reshape(W, B, T, 16384).transpose(1, 0, 2, 3)
        f0 = freq[:, :, 0, :]
        f1 = freq[:, :, 1, :]
        m = (f0 > 0) & (f1 > 0)
        s = (w[:, 0, None, None] * f0) / (f0 + 1.2) + (
            w[:, 1, None, None] * f1
        ) / (f1 + 1.2)
        return jnp.where(m, s, -jnp.inf).max(axis=-1)

    time_fn(wmax, tiles, wts, n=5, label="stage2 window-max only")

    # ---- how tight are host block-max window bounds on this workload? ----
    from trinity_tpu.models.similarity import BM25

    hit = []
    for q in and_qs[:16]:
        plan = compile_plan(parse_query(q).root)
        tids = [seg.term_id(t) for t in plan.term_texts]
        c_s, c_n = compute_cells(seg, tids)
        ub = np.zeros(W)
        present = np.ones(W, bool)
        for ti in range(len(tids)):
            has = c_n[:, ti] > 0
            present &= has
            mf = np.zeros(W, np.int64)
            idx = np.flatnonzero(has)
            if len(idx):
                for wdx in idx:
                    s0, nn = c_s[wdx, ti], c_n[wdx, ti]
                    mf[wdx] = seg.block_max_freq[s0 : s0 + nn].max()
            df = [int(seg.term_df[t]) if t >= 0 else 0 for t in [tids[ti]]]
            wgt = BM25.weight(df, seg.stats.docs_cnt)
            ub += np.where(has, BM25.score_tile(mf.astype(np.float32), np.float32(wgt)), 0)
        ub = np.where(present, ub, 0.0)
        res = ex.search(q, k=10)
        if len(res) >= 10:
            theta = res[9].score
            nneed = int((ub >= theta).sum())
        else:
            nneed = int((ub > 0).sum())
        hit.append(nneed)
    log(f"AND window-bound tightness: windows needed of {W}: {sorted(hit)}")

    log("PROFILE DONE")


if __name__ == "__main__":
    main()
