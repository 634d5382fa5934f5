"""Serialized per-piece profiling at bench scale (CLAUDE.md timing rules:
data-dependency scan inside ONE jit; report (T(n)-T(1))/(n-1))."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    deadline = time.time() + 420
    while True:
        try:
            jax.block_until_ready(jnp.arange(4.0).sum())
            break
        except Exception:
            if time.time() > deadline:
                raise
            time.sleep(30)

    import bench
    from trinity_tpu.exec import Executor
    from trinity_tpu.exec.executor import _pad_T
    from trinity_tpu.ops.fusedscore import exact_window_topk, fused_score_tiles
    from trinity_tpu.ops.postings import compute_cells, materialize_freq_tiles
    from trinity_tpu.plan.compile import compile_plan
    from trinity_tpu.query.parser import parse_query

    t0 = time.time()
    seg = bench.build_corpus()
    log(f"corpus {time.time()-t0:.0f}s")
    ex = Executor(seg)
    rng = np.random.default_rng(bench.SEED + 1)
    queries = bench.make_queries(rng)
    and_qs = [q for i, q in enumerate(queries) if i % 10 < 4]

    W = seg.n_windows
    B, T = 48, 2
    tape = compile_plan(parse_query(and_qs[0]).root).tape
    cs = np.zeros((W, B * T), np.int32)
    cn = np.zeros((W, B * T), np.int32)
    wts = np.zeros((B, 1), np.float32)
    from trinity_tpu.models.similarity import BM25

    for bi, q in enumerate(and_qs):
        plan = compile_plan(parse_query(q).root)
        tids = [seg.term_id(t) for t in plan.term_texts]
        c_s, c_n = compute_cells(seg, tids)
        cs[:, bi * T : bi * T + plan.n_slots] = c_s
        cn[:, bi * T : bi * T + plan.n_slots] = c_n
        wts = np.zeros((B, len(plan.weight_terms)), np.float32)
    for bi, q in enumerate(and_qs):
        plan = compile_plan(parse_query(q).root)
        wts[bi] = [
            BM25.weight(
                [int(seg.term_df[seg.term_id(t)]) for t in terms],
                seg.stats.docs_cnt,
            )
            for terms in plan.weight_terms
        ]
    csj, cnj, wtsj = jnp.asarray(cs), jnp.asarray(cn), jnp.asarray(wts)
    nd = np.int32(seg.n_docs)

    def serialized(label, fn, dep_of, n=4):
        """fn(cs) -> out; dep_of(out) -> i32 scalar 0. Reports per-iter."""

        @functools.partial(jax.jit, static_argnames=("m",))
        def loop(cs0, m):
            def body(carry, _):
                out = fn(carry)
                return carry + dep_of(out), None

            out, _ = lax.scan(body, cs0, None, length=m)
            return out

        jax.block_until_ready(loop(csj, 1))
        jax.block_until_ready(loop(csj, n))
        t1 = time.perf_counter()
        jax.block_until_ready(loop(csj, 1))
        a = time.perf_counter() - t1
        t1 = time.perf_counter()
        jax.block_until_ready(loop(csj, n))
        b = time.perf_counter() - t1
        log(f"{label}: {1e3*(b-a)/(n-1):.2f}ms/iter (1-call {a*1e3:.1f}ms)")

    section = sys.argv[1] if len(sys.argv) > 1 else "bool"
    kw = dict(
        tape=tape, scorer_name="bm25", n_windows=W, n_terms=T, batch=B,
        interpret=False,
    )
    if section != "bool":
        _phrase_section(
            jax, jnp, lax, seg, ex, W, T, queries, log, functools, np,
        )
        return

    # 1. fused kernel alone
    serialized(
        "fused kernel (AND B=48)",
        lambda c: fused_score_tiles(
            ex.bmeta, ex.planes, c, cnj, wtsj, nd, None, **kw
        ),
        lambda out: (out[1][0, 0, 0, 0] > 1e30).astype(jnp.int32),
    )

    # 2. fused kernel + two-phase topk
    def full(c):
        sc, rmax = fused_score_tiles(
            ex.bmeta, ex.planes, c, cnj, wtsj, nd, None, **kw
        )
        return exact_window_topk(sc, rmax, 10)

    serialized(
        "fused + two-phase topk",
        full,
        lambda out: (out[0][0, 0] > 1e30).astype(jnp.int32),
    )

    # 3. fused kernel + FLAT topk (the old selection) for comparison
    def flat(c):
        sc, rmax = fused_score_tiles(
            ex.bmeta, ex.planes, c, cnj, wtsj, nd, None, **kw
        )
        return jax.lax.top_k(sc.reshape(B, -1), 10)

    serialized(
        "fused + flat 1M topk",
        flat,
        lambda out: (out[0][0, 0] > 1e30).astype(jnp.int32),
    )

    # 4. old two-stage path: stage1 tiles + stage2 eval + flat topk
    def old(c):
        tiles = materialize_freq_tiles(
            ex.bmeta, ex.planes, c, cnj, n_windows=W, n_terms=B * T
        )
        freq = tiles.reshape(W, B, T, 16384).transpose(1, 0, 2, 3)
        f0, f1 = freq[:, :, 0, :], freq[:, :, 1, :]
        m = (f0 > 0) & (f1 > 0)
        s = (wtsj[:, 0, None, None] * f0) / (f0 + 1.2) + (
            wtsj[:, 1, None, None] * f1
        ) / (f1 + 1.2)
        scq = jnp.where(m, s, -jnp.inf)
        return jax.lax.top_k(scq.reshape(B, -1), 10)

    serialized(
        "old stage1+stage2+flat topk",
        old,
        lambda out: (out[0][0, 0] > 1e30).astype(jnp.int32),
    )

    log("SERIALIZED PROFILE DONE")
    return


def _phrase_section(jax, jnp, lax, seg, ex, W, T, queries, log, functools, np):
    import time
    from trinity_tpu.ops.postings import compute_cells, materialize_freq_tiles
    from trinity_tpu.plan.compile import compile_plan
    from trinity_tpu.query.parser import parse_query

    # 5. phrase pieces: stage1 with offsets at phrase shape (B=12, T=2)
    Bp = 12
    csp = np.zeros((W, Bp * T), np.int32)
    cnp_ = np.zeros((W, Bp * T), np.int32)
    ph_qs = [q for i, q in enumerate(queries) if i % 10 == 9]
    for bi, q in enumerate(ph_qs):
        plan = compile_plan(parse_query(q).root)
        tids = [seg.term_id(t) for t in plan.term_texts]
        c_s, c_n = compute_cells(seg, tids)
        csp[:, bi * T : bi * T + plan.n_slots] = c_s
        cnp_[:, bi * T : bi * T + plan.n_slots] = c_n
    cspj, cnpj = jnp.asarray(csp), jnp.asarray(cnp_)

    def ph_stage1(c):
        return materialize_freq_tiles(
            ex.bmeta, ex.planes, c, cnpj, n_windows=W, n_terms=Bp * T,
            with_offsets=True,
        )

    @functools.partial(jax.jit, static_argnames=("m",))
    def loopp(cs0, m):
        def body(carry, _):
            out = ph_stage1(carry)
            return carry + (out[0][0, 0, 0, 0] > 1e30).astype(jnp.int32), None

        out, _ = lax.scan(body, cs0, None, length=m)
        return out

    jax.block_until_ready(loopp(cspj, 1))
    jax.block_until_ready(loopp(cspj, 6))
    t1 = time.perf_counter(); jax.block_until_ready(loopp(cspj, 1)); a = time.perf_counter() - t1
    t1 = time.perf_counter(); jax.block_until_ready(loopp(cspj, 6)); b = time.perf_counter() - t1
    log(f"phrase stage1 with_offsets (B=12): {1e3*(b-a)/5:.2f}ms/iter")

    # 6. phrase bound selection: min + topk C2 over (B, 1M)
    tiles0, offs0 = jax.block_until_ready(ph_stage1(cspj))

    @functools.partial(jax.jit, static_argnames=("m", "c2"))
    def sel_loop(t0_, m, c2):
        freq = t0_.reshape(W, Bp, T, 16384).transpose(1, 0, 2, 3)
        f0 = freq[:, :, 0, :].reshape(Bp, -1)
        f1 = freq[:, :, 1, :].reshape(Bp, -1)
        def body(carry, _):
            bound = jnp.minimum(f0 + carry, f1)
            kb, ki = jax.lax.top_k(bound, c2)
            order = jnp.argsort(ki, axis=1)
            ki2 = jnp.take_along_axis(ki, order, axis=1)
            g0 = jnp.take_along_axis(f0, ki2, axis=1)
            return carry + (g0[0, 0] > 1e30).astype(jnp.float32), None
        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    for c2 in (2048, 8192):
        jax.block_until_ready(sel_loop(tiles0, 1, c2))
        jax.block_until_ready(sel_loop(tiles0, 6, c2))
        t1 = time.perf_counter(); jax.block_until_ready(sel_loop(tiles0, 1, c2)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); jax.block_until_ready(sel_loop(tiles0, 6, c2)); b = time.perf_counter() - t1
        log(f"phrase bound topk+argsort+1gather C2={c2}: {1e3*(b-a)/5:.2f}ms/iter")

    log("SERIALIZED PROFILE DONE")


if __name__ == "__main__":
    main()
