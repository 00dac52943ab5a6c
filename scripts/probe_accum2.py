#!/usr/bin/env python
"""Compare sort_accumulate layouts: stacked [M,C] vs channel-separate [M]xC.

The scan machinery on [G, L, C] arrays has minor dim C=3, wasting 125/128
TPU vector lanes; the channel-separate formulation keeps every op on
[G, L] with full lanes. Run: python scripts/probe_accum2.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ice_halo_sim_tpu.core import accum

_NEG = -3.0e38


def sort_accumulate_chansep(acc, pix, vals, chunk: int = 2048):
    """Channel-separate variant: all scan ops on [G, chunk] full-lane arrays."""
    P, C = acc.shape
    N = pix.shape[0]
    valid = (pix >= 0) & (pix < P)
    key_contrib = jnp.where(valid, pix * 2, 2 * P)
    keys = jnp.concatenate([key_contrib, jnp.arange(P, dtype=pix.dtype) * 2 + 1])
    M = N + P
    G = -(-M // chunk)
    pad = G * chunk - M
    if pad:
        keys = jnp.concatenate([keys, jnp.full(pad, 2 * P + 2, keys.dtype)])
    chans = [
        jnp.concatenate(
            [jnp.where(valid, vals[:, c], 0.0), jnp.zeros(P + pad)]
        )
        for c in range(C)
    ]

    s = jax.lax.sort(tuple([keys] + chans), num_keys=1)
    sk = s[0]
    svs = s[1 : 1 + C]

    first = jnp.concatenate([jnp.ones(1, bool), (sk[1:] >> 1) != (sk[:-1] >> 1)])
    fg = first.reshape(G, chunk)
    started = jnp.cumsum(fg, axis=1) > 0
    has_start = jnp.any(fg, axis=1)
    a1 = (~has_start).astype(jnp.float32)

    def compose(p, q):
        pa, pb = p
        qa, qb = q
        return (pa * qa, qa * pb + qb)

    seg_chans = []
    for c in range(C):
        svg = svs[c].reshape(G, chunk)
        cs = jnp.cumsum(svg, axis=1)
        cs_prev = cs - svg
        base = jax.lax.cummax(jnp.where(fg, cs_prev, _NEG), axis=1)
        wseg = jnp.where(started, cs - base, cs)
        tail = wseg[:, -1]
        _, carry_incl = jax.lax.associative_scan(compose, (a1, tail), axis=0)
        carry_in = jnp.concatenate([jnp.zeros((1,)), carry_incl[:-1]])
        seg = wseg + jnp.where(started, 0.0, carry_in[:, None])
        seg_chans.append(seg.reshape(G * chunk))

    is_marker = (sk & 1) == 1
    key2 = jnp.where(is_marker, sk >> 1, jnp.int32(0x7FFFFFFF))
    s2 = jax.lax.sort(tuple([key2] + seg_chans), num_keys=1)
    totals = jnp.stack(s2[1 : 1 + C], axis=-1)[:P]
    return acc + totals


def timeit(fn, *args, n=5, warmup=2):
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
    P = 2048 * 1024
    key = jax.random.PRNGKey(0)
    r = {"platform": jax.default_backend(), "P": P}
    for N in (1 << 22, 1 << 24):
        pix = jax.random.randint(key, (N,), 0, P, dtype=jnp.int32)
        vals = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
        acc = jnp.zeros((P, 3), jnp.float32)

        cur = timeit(accum.sort_accumulate, acc, pix, vals)
        sep = timeit(sort_accumulate_chansep, acc, pix, vals)
        # correctness check
        a = np.asarray(jax.jit(accum.scatter_accumulate)(acc, pix[: 1 << 20], vals[: 1 << 20]))
        b = np.asarray(jax.jit(sort_accumulate_chansep)(acc, pix[: 1 << 20], vals[: 1 << 20]))
        err = float(np.abs(a - b).max())
        r[f"N{N}"] = {"cur_ms": cur * 1e3, "chansep_ms": sep * 1e3, "max_err": err}
        print(json.dumps(r[f"N{N}"] | {"N": N}), flush=True)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
