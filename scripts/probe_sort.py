#!/usr/bin/env python
"""Probe XLA:TPU sort/scan building-block costs for the accumulation design."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    jfn = jax.jit(lambda *a: jax.tree.map(lambda x: jnp.sum(x, dtype=jnp.float32) if x.dtype != jnp.float32 else jnp.sum(x), fn(*a)))

    def run(*a):
        out = jfn(*a)
        leaves = jax.tree.leaves(out)
        tot = leaves[0]
        for l in leaves[1:]:
            tot = tot + l
        np.asarray(tot)

    # simpler: materialize all leaves via one combined scalar
    def run2(*a):
        out = jfn(*a)
        s = sum(jax.tree.leaves(out))
        np.asarray(s)

    for _ in range(warmup):
        run2(*args)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        run2(*args)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 6 * 1024 * 1024
    key = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, 1 << 22, dtype=jnp.int32)
    f1 = jax.random.uniform(jax.random.PRNGKey(1), (M,))
    f2 = jax.random.uniform(jax.random.PRNGKey(2), (M,))
    f3 = jax.random.uniform(jax.random.PRNGKey(3), (M,))
    f4 = jax.random.uniform(jax.random.PRNGKey(4), (M,))
    u2 = jax.random.randint(jax.random.PRNGKey(5), (M,), 0, 1 << 30, dtype=jnp.int32)

    r = {"M": M}
    r["rtt"] = timeit(lambda x: x + 1, jnp.ones((8,)))
    r["sort_1op_i32"] = timeit(lambda k: jax.lax.sort((k,), num_keys=1), key)
    r["sort_2op"] = timeit(lambda k, a: jax.lax.sort((k, a), num_keys=1), key, f1)
    r["sort_3op"] = timeit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1), key, f1, f2)
    r["sort_5op"] = timeit(
        lambda k, a, b, c, d: jax.lax.sort((k, a, b, c, d), num_keys=1), key, f1, f2, f3, f4)
    r["sort_2op_int_int"] = timeit(lambda k, a: jax.lax.sort((k, a), num_keys=1), key, u2)
    # stable 1-bit-key sort (the marker-extraction pass)
    bit = (key & 1)
    r["sort_bit_3payload_stable"] = timeit(
        lambda k, a, b, c: jax.lax.sort((k, a, b, c), num_keys=1, is_stable=True),
        bit, f1, f2, f3)
    # u64 single-operand
    k64 = key.astype(jnp.uint64) << 32 | u2.astype(jnp.uint64)
    r["sort_1op_u64"] = timeit(lambda k: jax.lax.sort((k,), num_keys=1), k64)
    # scan building blocks at [G, L, 3]
    G, L = M // 2048, 2048
    v3 = jax.random.uniform(jax.random.PRNGKey(6), (G, L, 3))
    r["cumsum_GL3"] = timeit(lambda v: jnp.cumsum(v, axis=1), v3)
    r["cummax_GL3"] = timeit(lambda v: jax.lax.cummax(v, axis=1), v3)
    # elementwise pass for reference (1 read+1 write of M*3 f32)
    r["elementwise_M3"] = timeit(lambda v: v * 1.0001 + 0.5, v3)
    r["platform"] = jax.default_backend()
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
