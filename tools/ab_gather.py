"""A/B the member pf/po gather strategy in the fused phrase program.

profile_phrase_r3.py attributed +3.3 ms/iter of the 10.2 ms lazy-fused
phrase program (bench spec: slots=2, B=12, C2=2048) to the four
take_along_axis element gathers over (B, 1M) member arrays; gather_cols
(ops/select.py) replaces them with 128-wide row gathers + lane
compare-reduce (~170x cheaper per element, CLAUDE.md measured costs).

Runs BOTH variants sequentially in subprocesses (TRINITY_ROWGATHER=0/1)
so the comparison is within one invocation (service-load rule). Each
variant times the FULL fused program with the serialized-scan
methodology: one jit, data-dependent chain, per-iter = (T9-T1)/8.

Usage: nohup python tools/ab_gather.py > /tmp/ab_gather.log 2>&1 &
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_variant():
    import bench

    bench._wait_for_device(max_wait_s=2400)
    import jax
    import jax.numpy as jnp

    from trinity_tpu.exec import Executor
    from trinity_tpu.exec.executor import NEG_INF, SIMILARITIES
    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.ops.postings import WINDOW_SIZE, materialize_freq_tiles
    from trinity_tpu.ops.select import (
        USE_ROWGATHER,
        bound_select_candidates,
        gather_cols,
    )
    from trinity_tpu.plan.compile import compile_plan
    from trinity_tpu.query.parser import parse_query

    log(f"variant rowgather={int(USE_ROWGATHER)} backend={jax.default_backend()}")
    seg = bench.build_corpus()
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
        assert plan.tape == key
        members.append((qi, plan))

    def df_one(t):
        tid = seg.term_id(t)
        return int(seg.term_df[tid]) if tid >= 0 else 0

    prep = ex._prep_phrase_lazy(
        key, members, 10, "bm25", model, seg.stats.docs_cnt, df_one
    )
    spec, (cs, cn, weights), ctx = prep
    _, slots, T, B, C2, fcaps, noov = spec
    W = seg.n_windows
    k = 10
    log(f"spec: slots={slots} T={T} B={B} C2={C2} fcaps={fcaps} noov={noov}")

    bmeta, planes = ex.bmeta, ex.planes
    hit_pw, hit_off = ex.hit_pw, ex.hit_off
    csj, cnj = jnp.asarray(cs), jnp.asarray(cn)
    wtsj = jnp.asarray(weights)
    scorer_cls = SIMILARITIES["bm25"]

    def full(cs_in):
        tiles, offs = materialize_freq_tiles(
            bmeta, planes, cs_in, cnj, n_windows=W, n_terms=B * T,
            with_offsets=True,
        )
        n = W * WINDOW_SIZE
        freq = tiles.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        offv = offs.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        member_f = [freq[:, :, s, :].reshape(B, n) for s in slots]
        member_o = [offv[:, :, s, :].reshape(B, n) for s in slots]
        bound = member_f[0]
        for f in member_f[1:]:
            bound = jnp.minimum(bound, f)
        ki, valid, min_kept, overflow = bound_select_candidates(
            bound, C2, vmax=min(fcaps), assume_no_overflow=noov
        )
        pf = jnp.stack(
            [gather_cols(f, ki) for f in member_f], axis=-1
        ).astype(jnp.int32)
        po = jnp.stack([gather_cols(o, ki) for o in member_o], axis=-1)
        pfreq = verify_phrases_device(hit_pw, hit_off, valid, pf, po, fcaps)
        live = (pfreq > 0) & valid
        score = scorer_cls.score_tile(pfreq.astype(jnp.float32), wtsj[:, None])
        scores = jnp.where(live, score, NEG_INF)
        gv, gidx = jax.lax.top_k(scores, min(k, C2))
        gi = jnp.take_along_axis(ki, gidx, axis=1)
        kth = gv[:, min(k, C2) - 1]
        thresh = scorer_cls.score_tile(min_kept.astype(jnp.float32), wtsj)
        resolved = (~overflow) | (kth > thresh)
        return (
            jnp.max(gv) * 0 + jnp.max(gi) + jnp.sum(resolved)
        ).astype(jnp.float32)

    def chain(L):
        @jax.jit
        def run(cs0):
            def body(carry, _):
                out = full(carry)
                # runtime-zero but not provably zero (DCE guard)
                dep = (out > jnp.float32(1e30)).astype(jnp.int32)
                return carry + dep, ()
            c, _ = jax.lax.scan(body, cs0, None, length=L)
            return c[0, 0]
        return run

    t0 = time.time()
    r1, r9 = chain(1), chain(9)
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
        f"RESULT rowgather={int(USE_ROWGATHER)} "
        f"per_iter={(T9 - T1) / 8 * 1e3:7.2f}ms "
        f"T1={T1 * 1e3:6.1f}ms T9={T9 * 1e3:6.1f}ms (compile {compile_s:.0f}s)"
    )


def main():
    if os.environ.get("TRINITY_AB_CHILD"):
        run_variant()
        return
    for flag in ("0", "1", "0", "1"):  # ABAB to expose load drift
        env = dict(os.environ)
        env["TRINITY_AB_CHILD"] = "1"
        env["TRINITY_ROWGATHER"] = flag
        log(f"=== launching variant rowgather={flag} ===")
        subprocess.run([sys.executable, __file__], env=env, check=True)
    log("AB DONE")


if __name__ == "__main__":
    main()
