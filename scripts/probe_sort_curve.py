#!/usr/bin/env python
"""lax.sort cost vs row count on the current backend (u32 key + f32 payload).

Validates the split-fold plan: if sort cost is superlinear in rows, k
independent quarter sorts beat one global sort. Chained-rep timing (see
profile_r2.py) to survive the tunneled device's per-call sync cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_REPS = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iht_jax_cache"))
    rng = np.random.default_rng(0)
    out = {"platform": jax.default_backend()}
    for n in [1 << 18, 1 << 19, 1 << 20, 1 << 21, 3300352, 1 << 22, 1 << 23]:
        key = jnp.asarray(rng.integers(0, 1 << 25, n).astype(np.uint32))
        w = jnp.asarray(rng.random(n).astype(np.float32))

        def body(i, c, key=key, w=w):
            sk, sw = jax.lax.sort((key ^ c.astype(jnp.uint32), w), num_keys=1)
            return sk[0] + sw[0].astype(jnp.uint32)

        f = jax.jit(lambda key, w: jax.lax.fori_loop(
            0, K_REPS, lambda i, c: body(i, c), jnp.uint32(0)))
        np.asarray(f(key, w)); np.asarray(f(key, w))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(key, w))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) / K_REPS * 1e3
        out[f"sort_{n}"] = round(ms, 3)
        out[f"ns_per_row_{n}"] = round(ms * 1e6 / n, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
