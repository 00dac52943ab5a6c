#!/usr/bin/env python
"""Round-5b step decomposition at the HEAD bench operating point.

Times the kernel-path stages SEPARATELY at the exact calibrated shapes the
bench step runs (112 blocks, snapped keep 917504 + 131072 markers = 2^20),
chained-rep inside one jit to survive the tunneled device's ~26 ms
round-trip (probe hygiene, doc/perf-notes.md).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_REPS = 16


def main():
    from functools import partial
    from bench import BENCH_CFG
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.core import accum as accum_mod
    from ice_halo_sim_tpu.core import pallas_ops, pallas_scan

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iht_jax_cache"))

    cfg = load_project(BENCH_CFG)
    eng = Engine(cfg, seed=7, batch_size=112 * 2048)
    eng.run(n_batches=1)
    eng.run(n_batches=eng.steps_per_dispatch)
    np.asarray(eng.accum[-1])
    print("trace_path:", eng.trace_path, "keep:", eng._compact_keep, flush=True)

    def chain(fn, *args):
        @jax.jit
        def run(*a):
            def body(i, carry):
                acc_s, rest = carry
                out = fn(*rest)
                leaves = jax.tree.leaves(out)
                # FULL sums: reducing to element [0] lets XLA DCE whole
                # scatter/pack stages (the r4 probe-hygiene lesson).
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                rest2 = (rest[0] + (s * 0).astype(rest[0].dtype),) + rest[1:]
                return (acc_s + s, rest2)
            return jax.lax.fori_loop(0, K_REPS, body, (jnp.float32(0), a))[0]
        float(run(*args)); float(run(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(run(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / K_REPS * 1e3

    floor = chain(lambda a: a, jnp.float32(1.0))
    print(f"floor: {floor:.3f} ms", flush=True)
    r = {}

    bh = jnp.uint32(0)
    na = jnp.uint32(eng.batch_size)

    # 1. Kernel alone (base perturbed per rep by the chain).
    r["kernel"] = chain(
        lambda b: eng._trace_emit(b, bh, na), jnp.uint32(12345)
    ) - floor

    per_render, landed_add, dropped, segs = jax.jit(
        lambda b: eng._trace_emit(b, bh, na)
    )(jnp.uint32(12345))
    keys, wvals, counts = per_render[0]
    G, blk = keys.shape
    live = int(np.asarray(jnp.sum(counts)))
    kr = int(eng._compact_keep[0])
    print(f"blocks={G} blk={blk} live={live} keep={kr}", flush=True)

    start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])

    # 2. Block scatter alone.
    r["scatter"] = chain(
        lambda k, w, s: pallas_ops.scatter_blocks_multi([k, w], s, kr, blk),
        keys, wvals, start,
    ) - floor

    ck, cw = jax.jit(
        lambda k, w, s: pallas_ops.scatter_blocks_multi([k, w], s, kr, blk)
    )(keys, wvals, start)

    # 3. Fold total (sort + scan + extract) on the compacted prefix.
    P = eng.accum[0].shape[0]
    k_pool = eng.k_pool
    basis_fn = partial(eng._xyz_basis, batch_counter=jnp.uint32(3))
    acc0 = jnp.zeros_like(eng.accum[0])
    r["fold_total"] = chain(
        lambda a, k, w: accum_mod.fold_spectral_keys(a, k, w, k_pool, basis_fn),
        acc0, ck, cw,
    ) - floor

    # 4. Sort alone at the fold's exact M (keep + P markers + pad).
    shift = (2 * k_pool).bit_length() - 1
    marker_keys = (
        jnp.arange(P, dtype=jnp.uint32) << shift
    ) | jnp.uint32(2 * k_pool - 1)
    keys_all = jnp.concatenate([ck, marker_keys])
    w_all = jnp.concatenate([cw, jnp.zeros(P, cw.dtype)])
    M = keys_all.shape[0]
    block = 16384
    pad = -(-M // block) * block - M
    if pad:
        keys_all = jnp.concatenate(
            [keys_all, jnp.full(pad, 0xFFFFFFFF, jnp.uint32)]
        )
        w_all = jnp.concatenate([w_all, jnp.zeros(pad, w_all.dtype)])
    print(f"sort M={keys_all.shape[0]}", flush=True)
    r["sort"] = chain(
        lambda k, w: jax.lax.sort((k, w), num_keys=1, is_stable=False),
        keys_all, w_all,
    ) - floor

    sk, sw = jax.jit(
        lambda k, w: jax.lax.sort((k, w), num_keys=1, is_stable=False)
    )(keys_all, w_all)

    # 5. Fused scan alone.
    tbl = basis_fn(jnp.arange(k_pool, dtype=jnp.uint32))
    r["scan"] = chain(
        lambda k, w: pallas_scan.fused_scan_call(k, w, tbl, shift, k_pool),
        sk, sw,
    ) - floor

    seg = jax.jit(
        lambda k, w: pallas_scan.fused_scan_call(k, w, tbl, shift, k_pool)
    )(sk, sw)

    # 6. Extraction alone.
    is_marker = (sk & jnp.uint32(2 * k_pool - 1)) == jnp.uint32(2 * k_pool - 1)
    key2 = jnp.where(is_marker, sk >> shift, jnp.uint32(0xFFFFFFFF))
    r["extract"] = chain(
        lambda k2, s: accum_mod._marker_extract(k2, s, P, block),
        key2, seg,
    ) - floor

    # 7. Whole step via the engine's own dispatch path, per batch.
    t0 = time.perf_counter()
    nb = 8 * eng.steps_per_dispatch
    eng.run(n_batches=nb)
    np.asarray(eng.accum[-1])
    r["step_e2e"] = (time.perf_counter() - t0) / nb * 1e3

    for k, v in r.items():
        print(f"{k:12s} {v:8.3f} ms")
    parts = r["kernel"] + r["scatter"] + r["fold_total"]
    print(f"{'parts_sum':12s} {parts:8.3f} ms (kernel+scatter+fold)")
    print(f"rays/s at parts_sum: {eng.batch_size/parts/1e3:.1f} M")
    print(f"rays/s at step_e2e:  {eng.batch_size/r['step_e2e']/1e3:.1f} M")


if __name__ == "__main__":
    main()


def probe_multistep():
    """Device-only per-batch time via chained _multi_step_impl (n_steps=4):
    separates in-graph cost from the dispatch layer."""
    from bench import BENCH_CFG
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iht_jax_cache"))
    cfg = load_project(BENCH_CFG)
    eng = Engine(cfg, seed=7, batch_size=112 * 2048)
    eng.run(n_batches=1)
    eng.run(n_batches=eng.steps_per_dispatch)
    np.asarray(eng.accum[-1])
    keep = eng._compact_keep
    pv = eng._plan_version
    acc = tuple(jnp.array(a) for a in eng.accum)
    NS = 4

    @jax.jit
    def run(c0):
        def body(i, carry):
            s, c = carry
            out = eng._multi_step_impl(acc, c, NS, keep, pv)
            s2 = jnp.sum(out[0][-1]) + out[1]
            return (s + s2, c + jnp.uint32(1) + (s2 * 0).astype(jnp.uint32))
        return jax.lax.fori_loop(0, 4, body, (jnp.float32(0), c0))[0]

    float(run(jnp.uint32(5))); float(run(jnp.uint32(5)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run(jnp.uint32(5)))
        ts.append(time.perf_counter() - t0)
    per_batch = float(np.median(ts)) / (4 * NS) * 1e3
    print(f"multi_step device-only per batch: {per_batch:.3f} ms "
          f"({eng.batch_size/per_batch/1e3:.1f} M rays/s)")
