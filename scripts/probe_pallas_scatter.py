#!/usr/bin/env python
"""Smoke + timing probe: Pallas block-scatter kernel for _marker_extract.

Validates on this platform: PrefetchScalarGridSpec, in-kernel async DMA
VMEM->HBM at a dynamic row offset, overlapping forward-overwrite writes.
Compares against the XLA fori_loop-of-dynamic_update_slice formulation.
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


def xla_scatter(vals, start, P, block):
    G = vals.shape[0]
    dense = jnp.zeros((P + block, vals.shape[-1]), vals.dtype)

    def body(g, d):
        return jax.lax.dynamic_update_slice(d, vals[g], (start[g], 0))

    return jax.lax.fori_loop(0, G, body, dense)[:P]


def _scatter_kernel(start_ref, vals_ref, out_ref, sem):
    g = pl.program_id(0)
    # Forward overwrite: block g's rows land at start[g]; garbage rows past
    # its markers fall into later blocks' ranges and are overwritten by them,
    # so each DMA must complete before the next (sequential grid + wait).
    dma = pltpu.make_async_copy(
        vals_ref,
        out_ref.at[pl.ds(start_ref[g], vals_ref.shape[0]), :],
        sem,
    )
    dma.start()
    dma.wait()


def pallas_scatter(vals, start, P, block):
    G, blk, C = vals.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, blk, C), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )

    def kernel(start_ref, vals_ref, out_ref, sem):
        g = pl.program_id(0)
        dma = pltpu.make_async_copy(
            vals_ref.at[0],
            out_ref.at[pl.ds(start_ref[g], blk), :],
            sem,
        )
        dma.start()
        dma.wait()

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P + blk, C), vals.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(start, vals)
    return out[:P]


def main():
    P = 2048 * 1024
    block = 16384
    N = 6 * 1024 * 1024
    G = N // block
    key = jax.random.PRNGKey(0)
    vals = jax.random.uniform(key, (G, block, 3), jnp.float32)
    # Random marker counts per block; start = exclusive cumsum.
    cnt = jax.random.randint(jax.random.PRNGKey(1), (G,), 0, block // 2, jnp.int32)
    cnt = jnp.minimum(cnt, block)
    start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)[:-1]])

    a = np.asarray(jax.jit(functools.partial(xla_scatter, P=P, block=block))(vals, start))
    b = np.asarray(jax.jit(functools.partial(pallas_scatter, P=P, block=block))(vals, start))
    ok = bool(np.array_equal(a, b))

    t_xla = timeit(functools.partial(xla_scatter, P=P, block=block), vals, start)
    t_pal = timeit(functools.partial(pallas_scatter, P=P, block=block), vals, start)
    rtt = timeit(lambda x: x + 1, jnp.ones((8,)))
    print(json.dumps({
        "match": ok,
        "xla_s": t_xla, "pallas_s": t_pal, "rtt": rtt,
        "xla_net": t_xla - rtt, "pallas_net": t_pal - rtt,
        "G": int(G),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
