#!/usr/bin/env python
"""Stage-by-stage cost breakdown of sort_accumulate on TPU.

Times progressive prefixes of the fold pipeline (rtt-subtracted) to find
where the ~40ms of non-sort time goes. Run: python scripts/probe_accum3.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

_NEG = -3.0e38


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


def stages(acc, pix, vals, upto, chunk=2048):
    P, C = acc.shape
    N = pix.shape[0]
    valid = (pix >= 0) & (pix < P)
    key_contrib = jnp.where(valid, pix * 2, 2 * P)
    vals = jnp.where(valid[:, None], vals, 0.0)
    keys = jnp.concatenate([key_contrib, jnp.arange(P, dtype=pix.dtype) * 2 + 1])
    M = N + P
    G = -(-M // chunk)
    pad = G * chunk - M
    if pad:
        keys = jnp.concatenate([keys, jnp.full(pad, 2 * P + 2, keys.dtype)])
    chans = [jnp.concatenate([vals[:, c], jnp.zeros(P + pad)]) for c in range(C)]

    s = jax.lax.sort(tuple([keys] + chans), num_keys=1)
    sk, sv = s[0], jnp.stack(s[1 : 1 + C], axis=-1)
    if upto == "sort1":
        return sk, sv

    first = jnp.concatenate([jnp.ones(1, bool), (sk[1:] >> 1) != (sk[:-1] >> 1)])
    if upto == "flags":
        return sk, sv, first

    svg = sv.reshape(G, chunk, C)
    fg = first.reshape(G, chunk)
    cs = jnp.cumsum(svg, axis=1)
    if upto == "cumsum":
        return sk, cs

    cs_prev = cs - svg
    base = jax.lax.cummax(jnp.where(fg[..., None], cs_prev, _NEG), axis=1)
    if upto == "cummax":
        return sk, base

    started = jnp.cumsum(fg, axis=1) > 0
    wseg = jnp.where(started[..., None], cs - base, cs)
    if upto == "wseg":
        return sk, wseg

    has_start = jnp.any(fg, axis=1)
    tail = wseg[:, -1, :]
    a = jnp.broadcast_to((~has_start).astype(sv.dtype)[:, None], tail.shape)

    def compose(p, q):
        pa, pb = p
        qa, qb = q
        return (pa * qa, qa * pb + qb)

    _, carry_incl = jax.lax.associative_scan(compose, (a, tail), axis=0)
    carry_in = jnp.concatenate([jnp.zeros((1, C), sv.dtype), carry_incl[:-1]], axis=0)
    seg = wseg + jnp.where(started[..., None], 0.0, carry_in[:, None, :])
    seg = seg.reshape(G * chunk, C)
    if upto == "carry":
        return sk, seg

    is_marker = (sk & 1) == 1
    key2 = jnp.where(is_marker, sk >> 1, jnp.int32(0x7FFFFFFF))
    s2 = jax.lax.sort(tuple([key2] + [seg[:, c] for c in range(C)]), num_keys=1)
    totals = jnp.stack(s2[1 : 1 + C], axis=-1)[:P]
    return acc + totals


def main():
    N = 4 * 1024 * 1024
    P = 2048 * 1024
    pix = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, P, dtype=jnp.int32)
    vals = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    acc = jnp.zeros((P, 3), jnp.float32)

    r = {}
    r["rtt"] = timeit(lambda x: x + 1, jnp.ones((8,)))
    for st in ["sort1", "flags", "cumsum", "cummax", "wseg", "carry", "full"]:
        r[st] = timeit(lambda a, p, v, st=st: stages(a, p, v, st), acc, pix, vals)
        print(json.dumps({st: r[st], "minus_rtt": r[st] - r["rtt"]}), flush=True)

    # isolated primitives on the post-sort shapes
    G, chunk, C = -(-(N + P) // 2048), 2048, 3
    x = jax.random.uniform(jax.random.PRNGKey(2), (G, chunk, C))
    x2 = jax.random.uniform(jax.random.PRNGKey(3), (G, chunk))
    r["cumsum_GLC"] = timeit(lambda a: jnp.cumsum(a, axis=1), x)
    r["cumsum_GL"] = timeit(lambda a: jnp.cumsum(a, axis=1), x2)
    r["cummax_GLC"] = timeit(lambda a: jax.lax.cummax(a, axis=1), x)
    r["cummax_GL"] = timeit(lambda a: jax.lax.cummax(a, axis=1), x2)
    bigflat = jax.random.uniform(jax.random.PRNGKey(4), (G * chunk,))
    r["cumsum_flat_1d"] = timeit(lambda a: jnp.cumsum(a), bigflat)
    print(json.dumps({k: v for k, v in r.items()}, indent=1))


if __name__ == "__main__":
    main()
