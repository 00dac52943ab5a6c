#!/usr/bin/env python
"""Round-3 probe: where do the sandwich fold's milliseconds go on-chip?

Chained-rep timing (K reps inside one jitted fori_loop, loop-carried data
dependency, one host sync) of each fold stage at bench-scene production
shapes: 7.34M contribution rows/batch, 2.76M live, hot NC=256, image
chunks 1024 (512x256 dual fisheye).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_REPS = 8


def timeit(jfn, n=3):
    np.asarray(jax_block(jfn()))
    np.asarray(jax_block(jfn()))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jax_block(jfn()))
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) / K_REPS * 1e3, 3)


def jax_block(x):
    import jax

    return jax.tree.leaves(x)[0]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/iht_jax_cache")
    )
    from ice_halo_sim_tpu.core import accum, pallas_sandwich as ps

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N = 7340032            # contribution rows/batch (512k rays, mh7, 2 passes)
    LIVE = 2760000
    P = 512 * 256
    NCHUNK = P // ps.NLO   # 1024
    K = 64

    pix = np.full(N, -1, np.int32)
    live_at = rng.choice(N, LIVE, replace=False)
    # concentrated image: 90% of live rows in 256 hot chunks
    hot_chunks = rng.choice(NCHUNK, 256, replace=False)
    n_hot = int(LIVE * 0.9)
    hc = hot_chunks[rng.integers(0, 256, n_hot)]
    pix[live_at[:n_hot]] = hc * ps.NLO + rng.integers(0, ps.NLO, n_hot)
    pix[live_at[n_hot:]] = rng.integers(0, P, LIVE - n_hot)
    w = np.zeros(N, np.float32)
    w[live_at] = rng.random(LIVE).astype(np.float32) + 0.1
    wl = rng.integers(0, K, N).astype(np.uint32)
    tbl = rng.random((K, 3)).astype(np.float32)

    jpix = jnp.asarray(pix)
    jw = jnp.asarray(w)
    jwl = jnp.asarray(wl)
    jtbl = jnp.asarray(tbl)
    hot_list = jnp.asarray(np.sort(hot_chunks).astype(np.int32))
    cold_list = jnp.asarray(np.arange(NCHUNK, dtype=np.int32))

    def chain(fn, *args):
        """K_REPS reps with a fake data dependency through the first arg."""

        @jax.jit
        def run(*a):
            def body(i, carry):
                out = fn(carry[0], *carry[1:])
                first = jax.tree.leaves(out)[0]
                bump = (jnp.real(jnp.ravel(first)[0]) * 0).astype(a[0].dtype)
                return (a[0] + bump,) + carry[1:]

            return jax.lax.fori_loop(0, K_REPS, body, a)[0]

        return lambda: run(*args)

    # 1. hot pass over ALL rows, RB sweep
    for rb in (2048, 4096, 8192):
        tile = jnp.zeros((256, 3 * ps.NLO), jnp.float32)
        fn = chain(
            lambda t, p, ww, wi: ps.sandwich_pass(
                t, hot_list, p, ww, wi, jtbl, k_pool=K, rb=rb
            )[0],
            tile, jpix, jw, jwl,
        )
        print(f"hot pass NC=256 N={N} rb={rb}: {timeit(fn)} ms", flush=True)

    # 2. hot pass over compacted rows (3.3M)
    kl = 3342336
    for rb in (2048, 8192):
        tile = jnp.zeros((256, 3 * ps.NLO), jnp.float32)
        fn = chain(
            lambda t, p, ww, wi: ps.sandwich_pass(
                t, hot_list, p[:kl], ww[:kl], wi[:kl], jtbl, k_pool=K, rb=rb
            )[0],
            tile, jpix, jw, jwl,
        )
        print(f"hot pass NC=256 N={kl} rb={rb}: {timeit(fn)} ms", flush=True)

    # 3. compact_rows (block sort) vs compact_valid (butterfly), 7.34M x 3 cols
    valid = jw > 0.0
    fn = chain(
        lambda p, ww, wi: accum.compact_rows(ww > 0, [p, ww, wi], kl)[0][0],
        jpix, jw, jwl,
    )
    print(f"compact_rows(blocksort) N={N}->keep{kl}: {timeit(fn)} ms", flush=True)

    keyv = jnp.where(valid, jpix.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    fn = chain(
        lambda k, ww, wi: accum.compact_valid(k, [ww, wi], kl)[0][0],
        keyv, jw, jwl,
    )
    print(f"compact_valid(butterfly) N={N}->keep{kl}: {timeit(fn)} ms", flush=True)

    # 4. cold pass: NC=1024 over 512k rows
    nc_rows = 524288
    for rb in (2048, 8192):
        tile = jnp.zeros((NCHUNK, 3 * ps.NLO), jnp.float32)
        fn = chain(
            lambda t, p, ww, wi: ps.sandwich_pass(
                t, cold_list, p[:nc_rows], ww[:nc_rows], wi[:nc_rows], jtbl,
                k_pool=K, rb=rb,
            )[0],
            tile, jpix, jw, jwl,
        )
        print(f"cold pass NC={NCHUNK} N={nc_rows} rb={rb}: {timeit(fn)} ms", flush=True)

    # 5. reference: the sort fold on the same rows
    acc = jnp.zeros((P, 3), jnp.float32)

    def basis_fn(idx):
        return jtbl[idx.astype(jnp.int32)]

    fn = chain(
        lambda a, p, ww, wi: accum.fold_spectral(a, p, ww, wi, K, basis_fn),
        acc, jpix, jw, jwl,
    )
    print(f"sort fold N={N}: {timeit(fn)} ms", flush=True)


if __name__ == "__main__":
    main()
