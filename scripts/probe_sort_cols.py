#!/usr/bin/env python
"""Honest sort cost vs payload columns / row count / dtype on TPU.

All outputs are consumed (summed) so XLA cannot DCE payload columns.
Run: python scripts/probe_sort_cols.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


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
    r = {}
    rtt = timeit(lambda x: x + 1, jnp.ones((8,)))
    r["rtt"] = rtt

    key = jax.random.PRNGKey(0)
    for M in (1 << 21, 1 << 22, 6 * (1 << 20), 1 << 23):
        k = jax.random.randint(key, (M,), 0, 1 << 22, dtype=jnp.int32)
        pays = [
            jax.random.uniform(jax.random.PRNGKey(i + 1), (M,)) for i in range(4)
        ]
        row = {}
        for ncol in (0, 1, 2, 3, 4):
            t = timeit(
                lambda kk, *pp: jax.lax.sort(tuple([kk] + list(pp)), num_keys=1),
                k, *pays[:ncol],
            )
            row[f"c{ncol}"] = (t - rtt) * 1e3
        # u16-ish key (small range) — does key range matter? (comparison sort: no)
        r[f"M{M}"] = row
        print(json.dumps({"M": M} | row), flush=True)

    # masked-shift compaction pass cost: 23 passes over [M] x 4 cols
    M = 6 * (1 << 20)
    cols = [jax.random.uniform(jax.random.PRNGKey(i), (M,)) for i in range(4)]
    d = jax.random.randint(jax.random.PRNGKey(9), (M,), 0, M, dtype=jnp.int32)

    def shift_compact(d, *cols):
        cols = list(cols)
        rem = d
        for b in range(22, -1, -1):
            s = 1 << b
            # row i takes row i+s if that row still needs to move >= s
            src_rem = jnp.roll(rem, -s)
            take = (src_rem & s) != 0
            moved = []
            for c in cols:
                shifted = jnp.roll(c, -s)
                moved.append(jnp.where(take, shifted, c))
            cols = moved
            rem = jnp.where(take, src_rem - s, rem)
        return tuple(cols)

    r["shift23_4col_ms"] = (timeit(shift_compact, d, *cols) - rtt) * 1e3
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
