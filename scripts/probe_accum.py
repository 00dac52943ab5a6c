#!/usr/bin/env python
"""Probe accumulation strategies on the current backend.

Measures the primitive costs that decide how scatter-add into the image
should be lowered on TPU: XLA sort with varying payload widths/dtypes,
scatter-add with/without sorted+unique index hints, segment_sum, and the
current sort_accumulate. Run: python scripts/probe_accum.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=5, warmup=2):
    # Scalarize inside jit and force a host transfer: block_until_ready does
    # NOT reliably synchronize on the axon tunnel backend.
    def scalarized(*a):
        out = fn(*a)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

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
    N = 4 * 1024 * 1024
    P = 2048 * 1024
    key = jax.random.PRNGKey(0)
    pix = jax.random.randint(key, (N,), 0, P, dtype=jnp.int32)
    pix_sorted = jnp.sort(pix)
    vals = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    v0 = vals[:, 0]
    acc = jnp.zeros((P, 3), jnp.float32)
    acc1 = jnp.zeros((P,), jnp.float32)

    r = {}
    base = timeit(lambda x: x + 1, jnp.ones((8,)))
    r["rtt"] = base

    # --- sort cost scaling ------------------------------------------------
    r["sort_key_only"] = timeit(lambda k: jax.lax.sort((k,), num_keys=1)[0], pix)
    r["sort_1pay"] = timeit(
        lambda k, a: jax.lax.sort((k, a), num_keys=1)[0], pix, v0)
    r["sort_3pay"] = timeit(
        lambda k, a: jax.lax.sort((k, a[:, 0], a[:, 1], a[:, 2]), num_keys=1)[0],
        pix, vals)
    # packed f16 pair payloads (2 u32 instead of 3 f32)
    p0 = pix.astype(jnp.uint32)
    r["sort_2pay_u32"] = timeit(
        lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1)[0], pix, p0, p0)

    # --- scatter variants -------------------------------------------------
    r["scatter_plain"] = timeit(
        lambda a, p, v: a.at[p].add(v, mode="drop"), acc, pix, vals)
    r["scatter_sorted_hint"] = timeit(
        lambda a, p, v: a.at[p].add(v, mode="drop", indices_are_sorted=True),
        acc, pix_sorted, vals)
    r["scatter_sorted_unique_hint"] = timeit(
        lambda a, p, v: a.at[p].add(
            v, mode="drop", indices_are_sorted=True, unique_indices=True),
        acc, pix_sorted, vals)
    r["scatter_1ch_sorted"] = timeit(
        lambda a, p, v: a.at[p].add(v, mode="drop", indices_are_sorted=True),
        acc1, pix_sorted, v0)

    # --- segment_sum ------------------------------------------------------
    r["segment_sum_sorted"] = timeit(
        lambda p, v: jax.ops.segment_sum(
            v, p, num_segments=P, indices_are_sorted=True),
        pix_sorted, vals)

    # --- current implementation ------------------------------------------
    from ice_halo_sim_tpu.core import accum
    r["sort_accumulate_cur"] = timeit(
        lambda a, p, v: accum.sort_accumulate(a, p, v), acc, pix, vals)

    r["platform"] = jax.default_backend()
    r["N"] = N
    r["P"] = P
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
