"""Decompose the lazy-phrase fused program's 28.5 ms/query (r4 bench,
B=12 shared C2=8192) into stages, on the real TPU (ONE job).

Variants (each ONE jit program, timed by the serialized-scan method from
CLAUDE.md — (T(n)-T(1))/(n-1) with a runtime-zero data dependency):
  dec_no    stage-1 decode only (materialize_freq_tiles, no offsets)
  dec_off   stage-1 decode with hits-offset tiles (the phrase form)
  sel       decode + bound + top-C2 selection + pf/po gathers (no verify)
  full      the real lazy program (verify + score + top-k) at C2=8192
  full_1k   same at C2=1024 (what a mid df-bucket costs post-split)

Run via nohup (fresh remote compiles: 5 programs x 40-400 s worst case).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    bench._wait_for_device()
    from trinity_tpu.exec import Executor
    from trinity_tpu.exec.executor import (
        NEG_INF,
        SIMILARITIES,
        _pad_T,
        gather_cols,
    )
    from trinity_tpu.exec.phrases import verify_phrases_device
    from trinity_tpu.ops.postings import materialize_freq_tiles
    from trinity_tpu.ops.select import bound_select_candidates
    from trinity_tpu.limits import WINDOW_SIZE
    from trinity_tpu.plan.compile import compile_plan
    from trinity_tpu.query.parser import parse_query

    seg = bench.build_corpus()
    ex = Executor(seg)
    rng = np.random.default_rng(bench.SEED + 1)
    queries, id_lines = bench.make_queries(seg, rng)
    phrases = [q for q, il in zip(queries, id_lines) if il[0] == "P"]

    plans = [compile_plan(parse_query(q).root) for q in phrases]
    key = plans[0].tape
    slots = key[1]
    members = list(enumerate(plans))
    model = SIMILARITIES["bm25"]
    docs_cnt = seg.stats.docs_cnt
    df_of = lambda t: (
        int(seg.term_df[seg.term_id(t)]) if seg.term_id(t) >= 0 else 0
    )
    prep = ex._prep_phrase_lazy(key, members, 10, "bm25", model, docs_cnt, df_of)
    assert prep is not None
    spec, (cs, cn, weights), _ctx = prep
    _, _, T, B, C2, fcaps, noov = spec
    W = seg.n_windows
    k = 10
    print(f"B={B} T={T} C2={C2} fcaps={fcaps} no_overflow={noov}", flush=True)
    scorer_cls = model  # SIMILARITIES[...] is used as score_tile provider

    bmeta, planes = ex.bmeta, ex.planes
    hit_pw, hit_off = ex.hit_pw, ex.hit_off
    n_docs = np.int32(seg.n_docs)
    csj, cnj = jnp.asarray(cs), jnp.asarray(cn)
    wts = jnp.asarray(weights)

    def stage(csv, cnv, mode, C2v, hit_pw, hit_off):
        if mode == "dec_no":
            tiles = materialize_freq_tiles(
                bmeta, planes, csv, cnv, n_windows=W, n_terms=B * T,
                interpret=False, with_offsets=False,
            )
            return tiles.sum()
        tiles, offs = materialize_freq_tiles(
            bmeta, planes, csv, cnv, n_windows=W, n_terms=B * T,
            interpret=False, with_offsets=True,
        )
        if mode == "dec_off":
            return tiles.sum() + offs.sum().astype(jnp.float32)
        n = W * WINDOW_SIZE
        freq = tiles.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        offv = offs.reshape(W, B, T, WINDOW_SIZE).transpose(1, 0, 2, 3)
        member_f = [freq[:, :, s, :].reshape(B, n) for s in slots]
        member_o = [offv[:, :, s, :].reshape(B, n) for s in slots]
        bound = member_f[0]
        for f in member_f[1:]:
            bound = jnp.minimum(bound, f)
        ki, valid, min_kept, overflow = bound_select_candidates(
            bound, C2v, vmax=min(fcaps), assume_no_overflow=False
        )
        pf = jnp.stack(
            [gather_cols(f, ki) for f in member_f], axis=-1
        ).astype(jnp.int32)
        po = jnp.stack([gather_cols(o, ki) for o in member_o], axis=-1)
        if mode == "sel":
            return pf.sum().astype(jnp.float32) + po.sum().astype(jnp.float32)
        pfreq = verify_phrases_device(hit_pw, hit_off, valid, pf, po, fcaps)
        live = (pfreq > 0) & valid
        score = scorer_cls.score_tile(pfreq.astype(jnp.float32), wts[:, None])
        scores = jnp.where(live, score, NEG_INF)
        gv, gidx = jax.lax.top_k(scores, k)
        gi = jnp.take_along_axis(ki, gidx, axis=1)
        return gv.sum() + gi.sum().astype(jnp.float32)

    def chain(L, mode, C2v):
        # big arrays ride as ARGUMENTS (like the production programs):
        # closed-over device arrays embed in the serialized module and
        # blow the remote-compile request limit (observed HTTP 413)
        @jax.jit
        def run(csv, cnv, hpw, hoff):
            def body(carry, _):
                out = stage(carry, cnv, mode, C2v, hpw, hoff)
                dep = (out > jnp.float32(1e30)).astype(jnp.int32)
                return carry + dep, ()
            c, _ = jax.lax.scan(body, csv, None, length=L)
            return c[0, 0]
        return lambda csv: run(csv, cnj, hit_pw, hit_off)

    todo = (
        ("dec_no", C2), ("dec_off", C2), ("sel", C2),
        ("full", C2), ("full", 1024),
    )
    if len(sys.argv) > 1:  # e.g. "full@8192 full@1024"
        todo = []
        for a in sys.argv[1:]:
            m, c = a.split("@")
            todo.append((m, int(c)))
    for mode, C2v in todo:
        label = f"{mode}@{C2v}"
        t0 = time.time()
        r1, r5 = chain(1, mode, C2v), chain(5, mode, C2v)
        jax.block_until_ready(r1(csj))
        jax.block_until_ready(r5(csj))
        compile_s = time.time() - t0
        t1s, t5s = [], []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(csj))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(r5(csj))
            t5s.append(time.perf_counter() - t0)
        T1, T5 = min(t1s), min(t5s)
        per = (T5 - T1) / 4 * 1e3
        print(
            f"{label:14s} per_iter={per:8.2f} ms  per_query={per/B:6.2f} ms"
            f"  (T1={T1*1e3:.1f} T5={T5*1e3:.1f}, compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
