"""Round-3 phrase-program attribution: where do the lazy-fused ms go?

Rebuilds the bench phrase group's EXACT program inputs (spec from
Executor._prep_phrase_lazy), then times truncated variants of the fused
program with the serialized-scan methodology (one jit, data-dependent
chain, per-iter = (T(n)-T(1))/(n-1); CLAUDE.md timing rules):

  stage1   decode freq+offsets tiles (Pallas kernel)
  select   + member min-bound + bound_select_candidates
  gather   + pf/po take_along_axis member gathers
  verify   + verify_phrases_device (position decode + adjacency)
  full     + score + top_k + resolved flag (the shipped program)

Differences between consecutive rows attribute each piece. Run ONE at a
time (5 fresh remote compiles, 40-400 s each — nohup + poll the log).
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
    from trinity_tpu.exec.executor import NEG_INF, SIMILARITIES
    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.ops.postings import WINDOW_SIZE, materialize_freq_tiles
    from trinity_tpu.ops.select import bound_select_candidates
    from trinity_tpu.plan.compile import compile_plan
    from trinity_tpu.query.parser import parse_query

    seg = bench.build_corpus()
    log(f"corpus ready: {seg.n_docs} docs")
    ex = Executor(seg)
    rng = np.random.default_rng(bench.SEED + 1)
    queries = bench.make_queries(rng)
    phrase_qs = [q for i, q in enumerate(queries) if i % 10 == 9]

    model = SIMILARITIES["bm25"]
    members = []
    key = None
    for qi, q in enumerate(phrase_qs):
        plan = compile_plan(parse_query(q).root)
        if key is None:
            key = plan.tape
        assert plan.tape == key, "bench phrase queries share one tape shape"
        members.append((qi, plan))

    # reuse the executor's own prep so spec/inputs match the shipped program
    def df_one(t):
        tid = seg.term_id(t)
        return int(seg.term_df[tid]) if tid >= 0 else 0

    prep = ex._prep_phrase_lazy(
        key, members, 10, "bm25", model, seg.stats.docs_cnt, df_one
    )
    assert prep is not None, "bench phrase group must take the fused path"
    spec, (cs, cn, weights), ctx = prep
    _, slots, T, B, C2, fcaps, noov = spec
    W = seg.n_windows
    k = 10
    log(f"spec: slots={slots} T={T} B={B} C2={C2} fcaps={fcaps} noov={noov}")

    import os

    if os.environ.get("TRINITY_PROFILE_SMOKE"):
        log("SMOKE OK")
        return

    bmeta, planes = ex.bmeta, ex.planes
    hit_pw, hit_off = ex.hit_pw, ex.hit_off
    csj, cnj = jnp.asarray(cs), jnp.asarray(cn)
    wtsj = jnp.asarray(weights)
    nd = np.int32(seg.n_docs)
    scorer_cls = SIMILARITIES["bm25"]

    def pieces(cs_in, stage):
        """The lazy-fused program truncated after `stage`; returns a f32
        scalar that is runtime-zero but data-depends on every live piece."""
        tiles, offs = materialize_freq_tiles(
            bmeta, planes, cs_in, cnj, n_windows=W, n_terms=B * T,
            with_offsets=True,
        )
        n = W * WINDOW_SIZE
        freq = tiles.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        offv = offs.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        member_f = [freq[:, :, s, :].reshape(B, n) for s in slots]
        member_o = [offv[:, :, s, :].reshape(B, n) for s in slots]
        if stage == "stage1":
            return (
                jnp.max(member_f[0]) + jnp.max(member_o[-1])
            ).astype(jnp.float32)
        bound = member_f[0]
        for f in member_f[1:]:
            bound = jnp.minimum(bound, f)
        ki, valid, min_kept, overflow = bound_select_candidates(
            bound, C2, vmax=min(fcaps), assume_no_overflow=noov
        )
        if stage == "select":
            return (
                jnp.max(ki) + jnp.max(member_o[-1])
            ).astype(jnp.float32)
        pf = jnp.stack(
            [jnp.take_along_axis(f, ki, axis=1) for f in member_f], axis=-1
        ).astype(jnp.int32)
        po = jnp.stack(
            [jnp.take_along_axis(o, ki, axis=1) for o in member_o], axis=-1
        )
        if stage == "gather":
            return (jnp.max(pf) + jnp.max(po)).astype(jnp.float32)
        pfreq = verify_phrases_device(hit_pw, hit_off, valid, pf, po, fcaps)
        if stage == "verify":
            return jnp.max(pfreq).astype(jnp.float32)
        live = (pfreq > 0) & valid
        score = scorer_cls.score_tile(
            pfreq.astype(jnp.float32), wtsj[:, None]
        )
        scores = jnp.where(live, score, NEG_INF)
        gv, gidx = jax.lax.top_k(scores, min(k, C2))
        gi = jnp.take_along_axis(ki, gidx, axis=1)
        kth = gv[:, min(k, C2) - 1]
        thresh = scorer_cls.score_tile(min_kept.astype(jnp.float32), wtsj)
        resolved = (~overflow) | (kth > thresh)
        return (
            jnp.max(gv) * 0 + jnp.max(gi) + jnp.sum(resolved)
        ).astype(jnp.float32)

    def chain(stage, L):
        @jax.jit
        def run(cs0):
            def body(carry, _):
                out = pieces(carry, stage)
                # runtime-zero but not provably zero (DCE guard)
                dep = (out > jnp.float32(1e30)).astype(jnp.int32)
                return carry + dep, ()
            c, _ = jax.lax.scan(body, cs0, None, length=L)
            return c[0, 0]
        return run

    for stage in ("stage1", "select", "gather", "verify", "full"):
        t0 = time.time()
        r1, r9 = chain(stage, 1), chain(stage, 9)
        jax.block_until_ready(r1(csj))
        jax.block_until_ready(r9(csj))
        compile_s = time.time() - t0
        t1s, t9s = [], []
        for _ in range(5):
            t0 = time.perf_counter(); jax.block_until_ready(r1(csj))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); jax.block_until_ready(r9(csj))
            t9s.append(time.perf_counter() - t0)
        T1, T9 = min(t1s), min(t9s)
        log(
            f"{stage:7s}: per_iter={(T9-T1)/8*1e3:7.2f}ms "
            f"T1={T1*1e3:6.1f}ms T9={T9*1e3:6.1f}ms (compile {compile_s:.0f}s)"
        )

    log("PROFILE DONE")


if __name__ == "__main__":
    main()
