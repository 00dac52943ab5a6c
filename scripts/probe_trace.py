#!/usr/bin/env python
"""Probe the bounce-loop cost structure: max_hits slope, unroll, variants."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(make_out, n=5, warmup=2):
    for _ in range(warmup):
        np.asarray(make_out())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(make_out())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    sys.path.insert(0, ".")
    from bench import BENCH_CFG
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.core import trace, sampling, rng, optics

    B = 1 << 19
    cfg = load_project(BENCH_CFG)
    r = {}

    def trace_fn(max_hits, unroll=1):
        cfg2 = dict(BENCH_CFG)
        eng = Engine(load_project(BENCH_CFG), seed=1, batch_size=B)
        plan = eng.layers[0]

        def impl(counter):
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
                                      n_ior, max_hits)
            return jnp.sum(exits.w) + jnp.sum(exits.d_world) + jnp.sum(exits.path)

        return jax.jit(impl)

    for h in (2, 4, 8):
        f = trace_fn(h)
        r[f"trace_h{h}"] = timeit(lambda: f(jnp.uint32(0)))

    # Entry-only (max_hits=1): sampling + entry fresnel dominate
    f1 = trace_fn(1)
    r["trace_h1"] = timeit(lambda: f1(jnp.uint32(0)))

    r["rtt"] = timeit(lambda: jnp.asarray(1.0) + 1)
    r["platform"] = jax.default_backend()
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
