#!/usr/bin/env python
"""Step composition on the bench scene with a floor-corrected chained-rep
harness (the round-2 probes' ~3 ms/rep harness floor inflated every small
stage; subtract a measured identity floor)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
K_REPS = 8

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/iht_jax_cache"))
    import bench as bench_mod
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine
    print("backend:", jax.default_backend(), flush=True)
    cfg = load_project(bench_mod.BENCH_CFG)
    eng = Engine(cfg, seed=7, batch_size=1 << 19)

    def chain_scalar(fn, *args):
        @jax.jit
        def run(*a):
            def body(i, carry):
                acc_s, rest = carry
                out = fn(*rest)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)
                rest2 = (rest[0] + (s * 0).astype(rest[0].dtype),) + rest[1:]
                return (acc_s + s, rest2)
            return jax.lax.fori_loop(0, K_REPS, body, (jnp.float32(0), a))[0]
        float(run(*args)); float(run(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(run(*args)); ts.append(time.perf_counter()-t0)
        return round(float(np.median(ts)) / K_REPS * 1e3, 3)

    z = jnp.float32(1.0)
    floor = chain_scalar(lambda a: a, z)
    print("harness floor:", floor, flush=True)

    plan = eng.layers[0]
    # pool build alone
    print("pool build:", chain_scalar(
        lambda c: eng._sample_layer_pool(0, plan, c.astype(jnp.uint32)), z
    ), flush=True)

    # full trace+project (contribs)
    def traceproj(c):
        contribs, landed, dw, segs, cd, _sm = eng._trace_batch_impl(
            jnp.uint32(0), c.astype(jnp.uint32)
        )
        return [contribs[0][0], contribs[0][1]]
    print("trace+project:", chain_scalar(traceproj, z), flush=True)

    # full step (fold included)
    def step(c):
        acc, dw, segs, live, cd, _sm = eng._step_impl(
            eng.accum, jnp.uint32(0), c.astype(jnp.uint32)
        )
        return [acc[0]]
    print("full step (pre-calib levels):", chain_scalar(step, z), flush=True)

main()
