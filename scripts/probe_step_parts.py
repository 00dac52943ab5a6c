#!/usr/bin/env python
"""Fine-grained step breakdown on the bench scene: trace-batch production
vs compaction prepass vs fold, on the current backend."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=5, warmup=2):
    def scalarized(*a):
        out = fn(*a)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out))

    jfn = jax.jit(scalarized)
    for _ in range(warmup):
        np.asarray(jfn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from bench import BENCH_CFG
    from functools import partial
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.core import accum

    cfg = load_project(BENCH_CFG)
    eng = Engine(cfg, seed=1, batch_size=1 << 19)
    r = {}
    r["rtt"] = timeit(lambda x: x + 1, jnp.ones((8,)))

    base = jnp.uint32(7 << 20)
    ctr = jnp.uint32(3)

    # Production of contribution rows (sample + trace + project + assembly).
    r["trace_batch"] = timeit(
        lambda b, c: eng._trace_batch_impl(b, c), base, ctr
    ) - r["rtt"]

    contribs, _, _, _, _ = jax.jit(eng._trace_batch_impl)(base, ctr)
    pix, w, wl_idx, mask = contribs[0]
    N = int(pix.shape[0])
    live = int(jnp.sum((w > 0.0).astype(jnp.int32)))

    # Compaction prepass alone.
    keep = int(np.ceil(live * 1.35 / 16384)) * 16384
    r["compact"] = timeit(
        lambda p, ww, wl: accum.compact_rows(ww > 0.0, [p, ww, wl], keep),
        pix, w, wl_idx,
    ) - r["rtt"]

    # Fold alone: uncompacted and compacted sizes.
    P = eng.proj_plans[0].height * eng.proj_plans[0].width
    acc = jnp.zeros((P, 3), jnp.float32)
    basis_fn = partial(eng._xyz_basis, batch_counter=ctr)
    r["fold_uncompacted"] = timeit(
        lambda a, p, ww, wl: accum.fold_spectral(a, p, ww, wl, eng.k_pool, basis_fn),
        acc, pix, w, wl_idx,
    ) - r["rtt"]
    (cp, cw, cwl), _ = jax.jit(
        lambda p, ww, wl: accum.compact_rows(ww > 0.0, [p, ww, wl], keep)
    )(pix, w, wl_idx)
    r["fold_compacted"] = timeit(
        lambda a, p, ww, wl: accum.fold_spectral(a, p, ww, wl, eng.k_pool, basis_fn),
        acc, cp, cw, cwl,
    ) - r["rtt"]

    # Full step (with calibrated keep as the engine would use).
    r["step_nokeep"] = timeit(
        lambda a, b, c: eng._step_impl(a, b, c, None, 0), eng.accum, base, ctr
    ) - r["rtt"]
    r["step_keep"] = timeit(
        lambda a, b, c: eng._step_impl(a, b, c, (keep,), 0), eng.accum, base, ctr
    ) - r["rtt"]

    r.update(N_rows=N, live_rows=live, keep=keep, P=P,
             platform=jax.default_backend())
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
