#!/usr/bin/env python
"""Where does lax.sort's ~3.3ms fixed cost live? Compare: flat [N] sorts,
batched dim-1 sorts [G, N/G] (one call, G independent segments), and
operand-count effects. Chained-rep timing."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_REPS = 8


def timed(jfn, *args, n=3):
    np.asarray(jfn(*args)); np.asarray(jfn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K_REPS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iht_jax_cache"))
    rng = np.random.default_rng(0)
    N = 3301376
    key = jnp.asarray(rng.integers(0, 1 << 25, N).astype(np.uint32))
    w = jnp.asarray(rng.random(N).astype(np.float32))
    out = {"platform": jax.default_backend(), "N": N}

    def rep(body):
        return jax.jit(lambda k, ww: jax.lax.fori_loop(
            0, K_REPS, lambda i, c: body(k, ww, c), jnp.uint32(0)))

    def flat(k, ww, c):
        sk, sw = jax.lax.sort((k ^ c, ww), num_keys=1)
        return sk[0] + sw[0].astype(jnp.uint32)

    out["flat_2op"] = round(timed(rep(flat), key, w), 3)

    def flat_1op(k, ww, c):
        sk = jax.lax.sort(k ^ c)
        return sk[0]

    out["flat_1op"] = round(timed(rep(flat_1op), key, w), 3)

    for G in (2, 4, 8, 16):
        n = N // G * G

        def seg(k, ww, c, G=G, n=n):
            kk = (k[:n] ^ c).reshape(G, n // G)
            vv = ww[:n].reshape(G, n // G)
            sk, sw = jax.lax.sort((kk, vv), dimension=1, num_keys=1)
            return sk[0, 0] + sw[0, 0].astype(jnp.uint32)

        out[f"dim1_G{G}_2op"] = round(timed(rep(seg), key, w), 3)

    # One quarter, flat (the per-call fixed cost reference point).
    q = N // 4

    def quarter(k, ww, c):
        sk, sw = jax.lax.sort((k[:q] ^ c, ww[:q]), num_keys=1)
        return sk[0] + sw[0].astype(jnp.uint32)

    out["flat_quarter_2op"] = round(timed(rep(quarter), key, w), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
