"""Micro-profile the two-phase selection sub-ops (serialized scan timing)."""

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

    B, W = 48, 64
    NSUB, SUBD = 16, 1024
    nblk = W * NSUB
    key = jax.random.PRNGKey(0)
    scores = jax.random.normal(key, (B, W, 128, 128), jnp.float32)
    rmax = jax.random.normal(key, (B, W, NSUB, 128), jnp.float32)

    def ser(label, fn, n=5):
        @functools.partial(jax.jit, static_argnames=("m",))
        def loop(x, m):
            def body(c, _):
                out = fn(scores + c, rmax + c)
                return c + (out > 1e30).astype(jnp.float32), None

            out, _ = lax.scan(body, x, None, length=m)
            return out

        jax.block_until_ready(loop(jnp.float32(0), 1))
        jax.block_until_ready(loop(jnp.float32(0), n))
        t1 = time.perf_counter(); jax.block_until_ready(loop(jnp.float32(0), 1)); a = time.perf_counter() - t1
        t1 = time.perf_counter(); jax.block_until_ready(loop(jnp.float32(0), n)); b = time.perf_counter() - t1
        log(f"{label}: {1e3*(b-a)/(n-1):.2f}ms/iter")

    # baseline: just touch both inputs
    ser("touch inputs", lambda s, r: s[0, 0, 0, 0] + r[0, 0, 0, 0])

    # bmax extract + tiny topk
    def p1(s, r):
        bmax = r[:, :, :, 0].reshape(B, nblk)
        v, i = jax.lax.top_k(bmax, 16)
        return v[0, 0]

    ser("bmax extract + topk(B,1024)->16", p1)

    # + sort + gather
    def p2(s, r):
        bmax = r[:, :, :, 0].reshape(B, nblk)
        _, sel = jax.lax.top_k(bmax, 16)
        sel = jnp.sort(sel, axis=1)
        flat = s.reshape(B, nblk, SUBD)
        g = jnp.take_along_axis(flat, sel[:, :, None], axis=1)
        return g[0, 0, 0]

    ser("+ gather (B,16,1024)", p2)

    # full selection
    def p3(s, r):
        bmax = r[:, :, :, 0].reshape(B, nblk)
        _, sel = jax.lax.top_k(bmax, 16)
        sel = jnp.sort(sel, axis=1)
        flat = s.reshape(B, nblk, SUBD)
        g = jnp.take_along_axis(flat, sel[:, :, None], axis=1)
        gv, gidx = jax.lax.top_k(g.reshape(B, 16 * SUBD), 10)
        blk = jnp.take_along_axis(sel, gidx // SUBD, axis=1)
        return (blk[0, 0] * SUBD).astype(jnp.float32) + gv[0, 0]

    ser("full sub-block selection", p3)

    # alternative gather: dynamic_slice via vmap over B and kap
    def p4(s, r):
        bmax = r[:, :, :, 0].reshape(B, nblk)
        _, sel = jax.lax.top_k(bmax, 16)
        sel = jnp.sort(sel, axis=1)
        flat = s.reshape(B, nblk * SUBD)

        def one(row, blocks):
            def slc(j):
                return lax.dynamic_slice(row, (j * SUBD,), (SUBD,))

            return jax.vmap(slc)(blocks)

        g = jax.vmap(one)(flat, sel)
        gv, gidx = jax.lax.top_k(g.reshape(B, 16 * SUBD), 10)
        return gv[0, 0]

    ser("selection w/ dynamic-slice gather", p4)

    # final topk alone on pre-gathered (B, 16*1024)
    g0 = jax.random.normal(key, (B, 16 * SUBD), jnp.float32)

    def p5(s, r):
        gv, _ = jax.lax.top_k(g0 + s[0, 0, 0, 0], 10)
        return gv[0, 0]

    ser("final topk (B,16384)->10 alone", p5)

    log("SELECT PROFILE DONE")


if __name__ == "__main__":
    main()
