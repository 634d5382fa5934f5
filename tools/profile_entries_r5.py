"""Per-ENTRY device time of the mixed combined batch program (one TPU job).

The r5 family profile (tools/profile_families_r5.py) carries a ~36-40 ms
fixed per-batch component (tunnel dispatch + fetch + host planning), so
family marginals are unreliable below ~10 ms. This measures TRUE device
time with the serialized-scan methodology from CLAUDE.md: capture the
mixed batch's combined-program spec + packed input buffers by spying on
executor._build_batch_combined, then for the FULL spec and for each
single-entry spec, chain L kernel runs by a runtime-zero data dependency
inside one jit and report (T(L) - T(1)) / (L - 1).

~12 fresh program variants => run via nohup and poll (remote compiles are
40-400 s each on a cold service).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

L = 7
REPS = 4


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    bench._wait_for_device()
    from trinity_tpu.config import configure
    from trinity_tpu.exec import Executor
    from trinity_tpu.exec import executor as E

    configure(aot_cache_dir="/root/repo/.aot_cache")
    seg = bench.build_corpus()
    rng = np.random.default_rng(bench.SEED + 1)
    queries, _ = bench.make_queries(seg, rng)
    ex = Executor(seg)

    captured = {}
    orig = E._build_batch_combined

    def spy(spec, layout, *rest):
        fn = orig(spec, layout, *rest)

        def wrapper(*args):
            captured["spec"] = spec
            captured["layout"] = layout
            captured["rest"] = rest
            captured["args"] = args
            return fn(*args)

        return wrapper

    E._build_batch_combined = spy
    try:
        ex.finish_batch(ex.launch_batch(queries, k=10))
    finally:
        E._build_batch_combined = orig
    spec, layout, rest = captured["spec"], captured["layout"], captured["rest"]
    args = captured["args"]
    pref, ibuf, fbuf = args[:-2], args[-2], args[-1]
    ibuf = np.asarray(ibuf)
    fbuf = np.asarray(fbuf)
    print(f"spec entries: {[(e[0],) + tuple(e[-3:]) for e in spec]}",
          flush=True)

    # walk the layout to find each array's slice in (ibuf|fbuf)
    ARITY = {"flat": 6, "fused": 4, "posph": 8}
    spans = []  # (which, start, size, shape) per array
    io = fo = 0
    for dt, shp in layout:
        n = int(np.prod(shp)) if shp else 1
        if dt == "f4":
            spans.append(("f", fo, n, shp))
            fo += n
        else:
            spans.append(("i", io, n, shp))
            io += n

    def entry_cases():
        yield "mixed", spec, layout, ibuf, fbuf
        ai = 0
        for ent in spec:
            na = ARITY.get(ent[0], 3)
            sub_spans = spans[ai : ai + na]
            sub_layout = layout[ai : ai + na]
            ai += na
            ib = np.concatenate(
                [ibuf[s : s + n] for w, s, n, _ in sub_spans if w == "i"]
                or [np.zeros(1, np.int32)]
            )
            fb = np.concatenate(
                [fbuf[s : s + n] for w, s, n, _ in sub_spans if w == "f"]
                or [np.zeros(1, np.float32)]
            )
            label = f"{ent[0]}:{tuple(ent[1:]) if ent[0] != 'fused' else (ent[2], ent[3])}"
            yield label, (ent,), sub_layout, ib, fb

    def chain(fn, fb, length):
        @jax.jit
        def run(ib):
            def body(carry, _):
                out = fn(*pref, carry, fb)
                # runtime-zero, not provably zero (CLAUDE.md: `* 0` deps
                # get the chain DCE'd)
                dep = (jnp.max(out) > jnp.float32(1e30)).astype(jnp.int32)
                return carry + dep, ()

            c, _ = jax.lax.scan(body, ib, None, length=length)
            return c[0]

        return run

    for label, sp, lay, ib, fb in entry_cases():
        fn = orig(tuple(sp), tuple(lay), *rest)
        ibj, fbj = jnp.asarray(ib), jnp.asarray(fb)
        r1, rl = chain(fn, fbj, 1), chain(fn, fbj, L)
        t0 = time.time()
        jax.block_until_ready(r1(ibj))
        jax.block_until_ready(rl(ibj))
        compile_s = time.time() - t0
        t1s, tls = [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(r1(ibj))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(rl(ibj))
            tls.append(time.perf_counter() - t0)
        per_iter = (min(tls) - min(t1s)) / (L - 1)
        print(
            f"{label:28s} device {per_iter*1e3:7.2f} ms/iter "
            f"(T1 {min(t1s)*1e3:6.1f}, T{L} {min(tls)*1e3:7.1f}, "
            f"compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
