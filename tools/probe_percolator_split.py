"""One-off attribution probe: where does a percolator match_batch go?
host incidence build vs device eval (dispatch+exec+fetch). TPU-serialized."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import bench
    from trinity_tpu.config import configure
    from trinity_tpu.percolator import Percolator, _eval_programs
    from tools.measure_percolator import build_queries, gen_docs, DOC_BATCH

    configure(aot_cache_dir="/root/repo/.aot_cache")
    rng = np.random.default_rng(77)
    perc = Percolator()
    for q in build_queries(rng):
        perc.register(q)
    docs = gen_docs(rng, DOC_BATCH)
    ops, uniq = perc._pack()

    t = time.perf_counter()
    inc, ph = perc.build_incidence(docs, uniq)
    t_inc = time.perf_counter() - t
    print(f"incidence build: {t_inc*1e3:.1f} ms  inc {inc.shape} ph {ph.shape} ops {ops.shape}")

    bench._wait_for_device()
    t = time.perf_counter()
    out = _eval_programs(ops, inc, ph)
    np.asarray(out)
    print(f"eval first (compile): {(time.perf_counter()-t)*1e3:.1f} ms")
    for i in range(4):
        t = time.perf_counter()
        out = _eval_programs(ops, inc, ph)
        np.asarray(out)
        print(f"eval warm {i}: {(time.perf_counter()-t)*1e3:.1f} ms")
    # device-only (inputs staged once, no result fetch) via block_until_ready
    import jax.numpy as jnp

    from trinity_tpu.percolator import _eval_fn, _static_stack_depth

    fn = _eval_fn(ops.shape[1], _static_stack_depth(ops))
    o_d, i_d, p_d = jnp.asarray(ops), jnp.asarray(inc), jnp.asarray(ph)
    jax.block_until_ready(fn(o_d, i_d, p_d))
    for i in range(3):
        t = time.perf_counter()
        jax.block_until_ready(fn(o_d, i_d, p_d))
        print(f"device-only warm {i}: {(time.perf_counter()-t)*1e3:.1f} ms (staged inputs, no host fetch)")


if __name__ == "__main__":
    main()
