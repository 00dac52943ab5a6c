#!/usr/bin/env python
"""Component-level timing of the engine step on the current backend.

Splits the bench scene's per-batch time into: geometry pool sampling, the
bounce loop, projection, and accumulation — to direct optimization work.
Usage: python scripts/profile_step.py [batch_size_log2]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(fn):
    # Reduce the whole output tree to ONE scalar inside jit so the sync
    # costs exactly one device->host round trip.
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        return sum(jax.numpy.sum(l.astype(jax.numpy.float32)) for l in leaves)

    return jax.jit(wrapped)


def timeit(fn, *args, n=5, warmup=2):
    fn = _scalarize(fn)
    for _ in range(warmup):
        np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    B = 1 << blog
    sys.path.insert(0, ".")
    from bench import BENCH_CFG
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.core import accum, trace, projection, sampling, rng, optics, color

    cfg = load_project(BENCH_CFG)
    eng = Engine(cfg, seed=1, batch_size=B)
    B = eng.batch_size
    H = eng.max_hits
    plan = eng.layers[0]
    pplan = eng.proj_plans[0]
    P = pplan.height * pplan.width

    results = {}

    # Full step (single dispatch)
    def full(acc):
        return eng._step_impl(acc, jnp.uint32(0), jnp.uint32(0))[:3]

    acc0 = tuple(jnp.zeros_like(a) for a in eng.accum[:-1]) + (jnp.zeros_like(eng.accum[-1]),)
    results["full_step"] = timeit(full, acc0)

    # Geometry pool only
    results["geom_pool"] = timeit(lambda c: eng._sample_layer_pool(0, plan, c), jnp.uint32(0))

    # Trace only (sampling + bounce loop), reduced to scalars
    def trace_only(counter):
        lane = jnp.arange(B, dtype=jnp.uint32)
        ray_idx = lane
        seed0 = jnp.uint32(eng.seed)
        wl, w0, _wl_idx = eng._wavelength_draw(ray_idx, jnp.uint32(0))
        n_ior = optics.ice_refractive_index(wl)
        d_world = sampling.sample_sun_dirs(
            seed0 ^ rng.NONCE_SUN, ray_idx,
            cfg.light.sun.azimuth, cfg.light.sun.altitude, cfg.light.sun.diameter)
        pool = eng._sample_layer_pool(0, plan, counter)
        lon, lat, roll = sampling.sample_lat_lon_roll_row(
            seed0 ^ rng.NONCE_ORIENT, ray_idx, plan.axis_params, 0)
        rot = sampling.build_rotation(lon, lat, roll)
        exits = trace.trace_layer(seed0, ray_idx, d_world, w0, rot, None, pool,
                                  n_ior, eng.max_hits)
        return jnp.sum(exits.w), jnp.sum(exits.d_world)

    results["sample_plus_trace"] = timeit(trace_only, jnp.uint32(0))

    # Projection only
    d = jax.random.normal(jax.random.PRNGKey(0), (B * H, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def proj_only(dd):
        hits = projection.project(pplan, dd)
        return jnp.sum(hits.main)

    results["projection"] = timeit(proj_only, d)

    # Accumulation only (sort vs scatter)
    pix = jax.random.randint(jax.random.PRNGKey(1), (B * H,), -1, P, dtype=jnp.int32)
    vals = jax.random.uniform(jax.random.PRNGKey(2), (B * H, 3))
    img = jnp.zeros((P, 3), jnp.float32)
    results["accum_sort"] = timeit(
        lambda a, p, v: accum.sort_accumulate(a, p, v), img, pix, vals)
    results["accum_scatter"] = timeit(
        lambda a, p, v: accum.scatter_accumulate(a, p, v), img, pix, vals)

    one = jnp.ones((8,), jnp.float32)
    results["rtt_noop"] = timeit(lambda x: x + 1, one)
    results["platform"] = jax.default_backend()
    results["B"] = B
    results["BH_rows"] = B * H
    results["rays_per_sec_full"] = B / results["full_step"]
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
