#!/usr/bin/env python
"""Trace-side breakdown on the bench scene (chained-rep, DCE-proofed: every
stage's full outputs are folded into the loop carry)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_REPS = 8


def timeit(make_body, n=3):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda: jax.lax.fori_loop(
        0, K_REPS, make_body(), jnp.float32(0.0)))
    np.asarray(jfn()); np.asarray(jfn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jfn())
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) / K_REPS * 1e3, 3)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iht_jax_cache"))
    from functools import partial

    from bench import BENCH_CFG
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.core import optics, projection, rng, sampling, trace_soa
    from ice_halo_sim_tpu.engine.simulator import Engine

    cfg = load_project(BENCH_CFG)
    B = 1 << 19
    eng = Engine(cfg, seed=7, batch_size=B)
    plan = eng.layers[0]
    pplan = eng.proj_plans[0]
    res = {"platform": jax.default_backend(), "B": B}

    def consume(*arrs):
        return sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)

    # Full trace+project batch, everything consumed.
    def full_body():
        def body(i, c):
            contribs, landed, dropped, segs, cd = eng._trace_batch_impl(
                jnp.uint32(0), i.astype(jnp.uint32))
            (pix, w, wli, mask) = contribs[0]
            return c * 1e-30 + consume(pix, w, wli, mask)
        return body

    res["trace_plus_project"] = timeit(full_body)

    # Sampling + bounce loop only (exits fully consumed, no projection).
    def trace_only_body():
        def body(i, c):
            bc = i.astype(jnp.uint32)
            lane = jnp.arange(B, dtype=jnp.uint32)
            seed0 = jnp.uint32(eng.seed)
            wl, w0, wl_idx = eng._wavelength_draw(lane, bc)
            n_ior = optics.ice_refractive_index(wl)
            d_world = sampling.sample_sun_dirs_soa(
                seed0 ^ rng.NONCE_SUN, lane, cfg.light.sun.azimuth,
                cfg.light.sun.altitude, cfg.light.sun.diameter)
            pool = eng._sample_layer_pool(0, plan, bc)
            lon, lat, roll = sampling.sample_lat_lon_roll_row(
                seed0 ^ rng.NONCE_ORIENT, lane, plan.axis_params, 0)
            rot = trace_soa.rot_components(lon, lat, roll)
            exits = trace_soa.trace_layer_soa(
                seed0, lane, d_world, w0, rot, pool, n_ior, eng.max_hits,
                setting_blocks=tuple(
                    zip(plan.k_per_setting, plan.setting_counts)))
            return c * 1e-30 + consume(
                exits.dx, exits.dy, exits.dz, exits.w, exits.path)
        return body

    res["sample_plus_bounce"] = timeit(trace_only_body)

    # Wavelength draw alone.
    def wl_body():
        def body(i, c):
            wl, w0, wl_idx = eng._wavelength_draw(
                jnp.arange(B, dtype=jnp.uint32), i.astype(jnp.uint32))
            return c * 1e-30 + consume(wl, w0, wl_idx)
        return body

    res["wavelength_draw"] = timeit(wl_body)

    # Geometry pool alone.
    def pool_body():
        def body(i, c):
            pool = eng._sample_layer_pool(0, plan, i.astype(jnp.uint32))
            return c * 1e-30 + consume(*jax.tree.leaves(pool))
        return body

    res["geom_pool"] = timeit(pool_body)

    # Orientation sampling alone.
    def orient_body():
        def body(i, c):
            lane = jnp.arange(B, dtype=jnp.uint32)
            lon, lat, roll = sampling.sample_lat_lon_roll_row(
                jnp.uint32(eng.seed) ^ rng.NONCE_ORIENT ^ i.astype(jnp.uint32),
                lane, plan.axis_params, 0)
            return c * 1e-30 + consume(lon, lat, roll)
        return body

    res["orientation"] = timeit(orient_body)

    # Projection alone on H*B real-ish dirs (both passes like the batch).
    H = eng.max_hits
    N = H * B
    r0 = np.random.default_rng(0)
    d = r0.normal(size=(3, N)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    dxa, dya, dza = (jnp.asarray(d[i]) for i in range(3))

    def proj_body():
        def body(i, c):
            dx = dxa + c * 1e-30
            hits = projection.project_components(pplan, dx, dya, dza)
            return c * 1e-30 + consume(hits.main, hits.overlap)
        return body

    res["projection_2pass_HB"] = timeit(proj_body)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
