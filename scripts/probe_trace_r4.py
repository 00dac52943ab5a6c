#!/usr/bin/env python
"""Round-4 fine decomposition of the trace+project side of the step.

Same floor-corrected chained-rep harness as probe_step_r3.py. Stages are
cumulative prefixes of _trace_batch_impl's pipeline, so stage deltas are
the marginal cost of each block (modulo XLA fusing across the cut points,
which the scalar-reduction chain keeps honest enough for ranking).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_REPS = 8


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/iht_jax_cache")
    )
    import bench as bench_mod
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.core import optics, projection, rng, sampling, trace_soa
    from ice_halo_sim_tpu.engine.simulator import Engine

    print("backend:", jax.default_backend(), flush=True)
    cfg = load_project(bench_mod.BENCH_CFG)
    eng = Engine(cfg, seed=7, batch_size=1 << 19)
    B = eng.batch_size
    plan = eng.layers[0]
    pplan = eng.proj_plans[0]
    H = eng.max_hits

    def chain_scalar(fn, *args):
        @jax.jit
        def run(*a):
            def body(i, carry):
                acc_s, rest = carry
                out = fn(*rest)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)
                rest2 = (rest[0] + (s * 0).astype(rest[0].dtype),) + rest[1:]
                return (acc_s + s, rest2)

            return jax.lax.fori_loop(0, K_REPS, body, (jnp.float32(0), a))[0]

        float(run(*args)); float(run(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(run(*args)); ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / K_REPS * 1e3

    z = jnp.float32(1.0)
    floor = chain_scalar(lambda a: a, z)
    print(f"harness floor: {floor:.2f} ms", flush=True)

    def sample_stage(c):
        counter = c.astype(jnp.uint32)
        lane = jnp.arange(B, dtype=jnp.uint32)
        ray_idx = lane
        seed_vec = rng.epoch_seed(jnp.uint32(7), jnp.uint32(0), jnp.uint32(0), ray_idx)
        wl, w0, wl_idx = eng._wavelength_draw(ray_idx, counter, seed_vec)
        n_ior = optics.ice_refractive_index(wl)
        d = sampling.sample_sun_dirs_soa(
            seed_vec ^ rng.NONCE_SUN, ray_idx, 0.0, 20.0, 0.0
        )
        pool = eng._sample_layer_pool(0, plan, counter)
        lon, lat, roll = sampling.sample_lat_lon_roll_row(
            seed_vec ^ rng.NONCE_ORIENT, ray_idx, plan.axis_params, 0
        )
        rot = trace_soa.rot_components(lon, lat, roll)
        return d, w0, wl_idx, n_ior, rot, pool

    print(f"A sampling(all): {chain_scalar(sample_stage, z) - floor:.2f} ms", flush=True)

    def trace_stage(c):
        d, w0, wl_idx, n_ior, rot, pool = sample_stage(c)
        ex = trace_soa.trace_layer_soa(
            rng.epoch_seed(jnp.uint32(7), jnp.uint32(0), jnp.uint32(0),
                           jnp.arange(B, dtype=jnp.uint32)) ^ jnp.uint32(0xA5A5),
            jnp.arange(B, dtype=jnp.uint32), d, w0, rot, pool, n_ior, H,
            setting_blocks=tuple(zip(plan.k_per_setting, plan.setting_counts)),
        )
        return ex.w, ex.dx

    print(f"B +trace scan:   {chain_scalar(trace_stage, z) - floor:.2f} ms", flush=True)

    def flat_stage(c):
        ex_w, _ = 0, 0
        d, w0, wl_idx, n_ior, rot, pool = sample_stage(c)
        ray_idx = jnp.arange(B, dtype=jnp.uint32)
        ex = trace_soa.trace_layer_soa(
            rng.epoch_seed(jnp.uint32(7), jnp.uint32(0), jnp.uint32(0), ray_idx)
            ^ jnp.uint32(0xA5A5),
            ray_idx, d, w0, rot, pool, n_ior, H,
            setting_blocks=tuple(zip(plan.k_per_setting, plan.setting_counts)),
        )
        acc_w = ex.w
        w_cut = jnp.float32(1e-3) * jnp.mean(w0)
        tiny = acc_w < w_cut
        acc_w = jnp.where(tiny, 0.0, acc_w)
        return (acc_w.reshape(-1), ex.dx.reshape(-1), ex.dy.reshape(-1),
                ex.dz.reshape(-1),
                jnp.broadcast_to(wl_idx[None, :], ex.w.shape).reshape(-1))

    print(f"C +floor+flat:   {chain_scalar(flat_stage, z) - floor:.2f} ms", flush=True)

    def proj_stage(c):
        w, dx, dy, dz, wli = flat_stage(c)
        hits = projection.project_components(pplan, dx, dy, dz)
        main_ok = (hits.main >= 0) & (w > 0.0)
        pix = jnp.where(main_ok, hits.main, -1)
        w_row = jnp.where(main_ok, w, 0.0)
        ov_ok = (hits.overlap >= 0) & (w > 0.0)
        ov_pix = jnp.where(ov_ok, hits.overlap, -1)
        ov_w = jnp.where(ov_ok, w, 0.0)
        landed = jnp.sum(w_row)
        return pix, w_row, ov_pix, ov_w, landed

    print(f"D +projection:   {chain_scalar(proj_stage, z) - floor:.2f} ms", flush=True)

    def full(c):
        contribs, landed, dw, segs, cd, _sm = eng._trace_batch_impl(
            jnp.uint32(0), c.astype(jnp.uint32)
        )
        return [contribs[0][0], contribs[0][1]]

    print(f"E full trace+project: {chain_scalar(full, z) - floor:.2f} ms", flush=True)

    def step(c):
        acc, dw, segs, live, cd, _sm = eng._step_impl(
            eng.accum, jnp.uint32(0), c.astype(jnp.uint32)
        )
        return [acc[0]]

    print(f"F full step: {chain_scalar(step, z) - floor:.2f} ms", flush=True)


main()
