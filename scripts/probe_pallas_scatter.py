#!/usr/bin/env python
"""Probe: Pallas marker-extraction scatter for the accumulation fold.

Replaces _marker_extract's XLA fori_loop of dynamic_update_slice (G
serialized DMAs, ~20+ ms/batch) with one Pallas kernel: the dense image
lives in VMEM as the kernel output (2-D [rows, 128]); each sorted block's
rows are shifted to their dense offset by a flat roll decomposed into
static sublane rolls (3 bits) + static lane rolls with cross-row carry
(7 bits), then blended into an 8-row-aligned window (Mosaic-safe: no
unaligned or 1-D accesses anywhere).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB_ALIGN = 8
ALIGN = LANES * SUB_ALIGN  # 1024: flat alignment of window starts


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


def _flat_roll(buf, delta):
    """Roll [R, 128] right by traced delta in [0, ALIGN) in FLAT row-major
    order, via static rolls only. delta = r * 128 + l."""
    r = delta // LANES
    l = delta % LANES
    # Sublane (row) roll by r: 3 bits (r < 8).
    a = buf
    bit = 1
    while bit < SUB_ALIGN:
        a = jnp.where((r & bit) != 0, pltpu.roll(a, bit, 0), a)
        bit <<= 1
    # Lane roll by l with cross-row carry: rows shifted by one extra row
    # feed lanes j < l.
    b = pltpu.roll(a, 1, 0)
    bit = 1
    while bit < LANES:
        take = (l & bit) != 0
        a = jnp.where(take, pltpu.roll(a, bit, 1), a)
        b = jnp.where(take, pltpu.roll(b, bit, 1), b)
        bit <<= 1
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane_iota < l, b, a)


def extract_pallas(vals, start, P, block):
    """vals: [G, block] f32 block-rowsorted values (markers first per block);
    start: [G] int32 dense offsets (nondecreasing, start[g]+valid_g <= P).
    Returns dense [P] (flat row-major of [P/128-ish, 128])."""
    G, blk = vals.shape
    assert blk % ALIGN == 0
    BR = blk // LANES                  # block rows
    WR = BR + SUB_ALIGN                # window rows
    SUP = 8
    Gp = -(-G // SUP) * SUP
    if Gp != G:
        vals = jnp.concatenate([vals, jnp.zeros((Gp - G, blk), vals.dtype)])
        start = jnp.concatenate([start, jnp.full((Gp - G,), P, jnp.int32)])
    P_rows = -(-P // ALIGN) * SUB_ALIGN + WR

    v2 = vals.reshape(Gp * BR, LANES)

    def kernel(start_ref, vals_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for k in range(SUP):
            s = start_ref[g * SUP + k]
            delta = s % ALIGN
            wr = pl.multiple_of((s - delta) // LANES, SUB_ALIGN)
            block2 = vals_ref[k * BR : (k + 1) * BR, :]
            buf = jnp.concatenate(
                [block2, jnp.zeros((SUB_ALIGN, LANES), block2.dtype)], axis=0
            )
            shifted = _flat_roll(buf, delta)
            flat_iota = (
                jax.lax.broadcasted_iota(jnp.int32, (WR, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (WR, LANES), 1)
            )
            window = out_ref[pl.ds(wr, WR), :]
            out_ref[pl.ds(wr, WR), :] = jnp.where(
                flat_iota >= delta, shifted, window
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Gp // SUP,),
        in_specs=[
            pl.BlockSpec(
                (SUP * BR, LANES), lambda g, s: (g, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dense = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P_rows, LANES), vals.dtype),
    )(start, v2)
    return dense.reshape(-1)[:P]


def np_reference(vals, start, P, block):
    G = vals.shape[0]
    out = np.zeros(P + block + ALIGN, np.float32)
    for g in range(G):
        s = int(start[g])
        out[s : s + block] = np.asarray(vals[g])
    return out[:P]


def main():
    P = 512 * 256
    block = 16384
    N = 3 * 1024 * 1024
    G = N // block
    vals = jax.random.uniform(jax.random.PRNGKey(0), (G, block), jnp.float32)
    cnt = jax.random.randint(jax.random.PRNGKey(9), (G,), 0, 1200, jnp.int32)
    cnt = (cnt * (P // max(1, int(jnp.sum(cnt))))).astype(jnp.int32)
    start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)[:-1]])

    f = jax.jit(functools.partial(extract_pallas, P=P, block=block))
    got = np.asarray(f(vals, start))
    want = np_reference(vals, np.asarray(start), P, block)
    ok = bool(np.array_equal(got, want))

    t = timeit(functools.partial(extract_pallas, P=P, block=block), vals, start)
    rtt = timeit(lambda x: x + 1, jnp.ones((8,)))
    print(json.dumps({
        "match": ok, "pallas_s": t, "rtt": rtt, "net": t - rtt, "G": int(G),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
