#!/usr/bin/env python
"""Round-2 stage profile of the bench scene step on the current backend.

Per-call host<->device sync over the tunneled TPU costs tens of ms, so each
stage is timed as K chained repetitions inside ONE jitted program (a
loop-carried f32 perturbs an input so XLA cannot hoist the body), synced
once. Prints one JSON dict of per-iteration milliseconds.
Usage: python scripts/profile_r2.py [batch_size_log2]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_REPS = 8


def timeit(fn, *args, n=3):
    """fn(carry_f32, *args) -> f32 scalar; returns per-iteration seconds."""
    import jax
    import jax.numpy as jnp

    def body(i, c):
        return fn(c, *args)

    jfn = jax.jit(lambda *a: jax.lax.fori_loop(0, K_REPS, body, jnp.float32(0.0)))
    np.asarray(jfn(*args))  # compile + warm
    np.asarray(jfn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K_REPS


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iht_jax_cache"))

    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    B = 1 << blog
    from bench import BENCH_CFG
    from functools import partial
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.core import accum as accum_mod
    from ice_halo_sim_tpu.core import pallas_scan

    cfg = load_project(BENCH_CFG)
    eng = Engine(cfg, seed=7, batch_size=B)
    res = {"platform": jax.default_backend(), "B": B}

    eng.run(n_batches=1)
    eng.run(n_batches=1)
    keep = eng._compact_keep
    res["compact_keep"] = keep
    pv = eng._plan_version
    acc0 = eng.accum

    def full(c, acc0=acc0):
        acc = jax.tree.map(lambda a: a + c * 1e-30, acc0)
        out = eng._step_impl(acc, jnp.uint32(0), jnp.uint32(0), keep, pv)
        return out[0][-1][0].astype(jnp.float32)

    res["full_step"] = timeit(full)

    def trace_only(c):
        contribs, landed, dropped, segs, cd = eng._trace_batch_impl(
            jnp.uint32(0), c.astype(jnp.uint32))
        return landed[0] + dropped

    res["trace_only"] = timeit(trace_only)

    # Real contribution rows.
    contribs = jax.jit(lambda bb, bc: eng._trace_batch_impl(bb, bc)[0])(
        jnp.uint32(0), jnp.uint32(0))
    pix, w, wl_idx, mask = [np.asarray(x) for x in contribs[0]]
    N = pix.shape[0]
    P = eng.accum[0].shape[0]
    live = int(((pix >= 0) & (w > 0)).sum())
    res.update(rows_total=N, rows_live=live, live_frac=round(live / N, 4), P=P)
    res["rows_live_main"] = int(((pix[:N // 2] >= 0) & (w[:N // 2] > 0)).sum())

    pix_j, w_j, wl_j = jnp.asarray(pix), jnp.asarray(w), jnp.asarray(wl_idx)
    basis_fn = partial(eng._xyz_basis, batch_counter=jnp.uint32(0))
    k_pool = eng.k_pool

    def pack(c, p, ww, wi):
        k, wz = accum_mod.pack_spectral_keys(p, ww + c * 1e-30, wi, P, k_pool)
        return wz[0] + k[0].astype(jnp.float32)

    res["pack_keys"] = timeit(pack, pix_j, w_j, wl_j)

    key_j, wz_j = jax.jit(
        lambda p, ww, wi: accum_mod.pack_spectral_keys(p, ww, wi, P, k_pool)
    )(pix_j, w_j, wl_j)

    kr = keep[0] if keep else None
    if kr:
        def prepass(c, k, ww):
            (ck, cw), nv = accum_mod.compact_by_key(
                k, [ww + c * 1e-30], kr)
            return cw[0] + nv.astype(jnp.float32)

        res["compact_prepass"] = timeit(prepass, key_j, wz_j)
        (ck, cw), _ = jax.jit(
            lambda k, ww: accum_mod.compact_by_key(k, [ww], kr)
        )(key_j, wz_j)
    else:
        ck, cw = key_j, wz_j

    acc_img = jnp.zeros((P, 3), jnp.float32)

    def fold(c, k, ww):
        out = accum_mod.fold_spectral_keys(
            acc_img, k, ww + c * 1e-30, k_pool, basis_fn)
        return out[0, 0]

    res["fold_on_kept"] = timeit(fold, ck, cw)

    M0 = ck.shape[0] + P
    shift = (2 * k_pool).bit_length() - 1
    block = accum_mod.BLOCK

    def sort_stage_raw(k, ww):
        marker_keys = (
            (jnp.arange(P, dtype=jnp.uint32) << shift)
            | jnp.uint32(2 * k_pool - 1))
        keys = jnp.concatenate([k, marker_keys])
        w_all = jnp.concatenate([ww, jnp.zeros(P, ww.dtype)])
        pad = -(-(keys.shape[0]) // block) * block - keys.shape[0]
        if pad:
            keys = jnp.concatenate([keys, jnp.full(pad, 0xFFFFFFFF, jnp.uint32)])
            w_all = jnp.concatenate([w_all, jnp.zeros(pad, ww.dtype)])
        return jax.lax.sort((keys, w_all), num_keys=1)

    def sort_stage(c, k, ww):
        sk, sw = sort_stage_raw(k, ww + c * 1e-30)
        return sw[0] + sk[0].astype(jnp.float32)

    res["fold_sort"] = timeit(sort_stage, ck, cw)
    sk, sw = jax.jit(sort_stage_raw)(ck, cw)
    res["fold_rows_sorted"] = int(sk.shape[0])

    tbl = basis_fn(jnp.arange(k_pool, dtype=jnp.uint32))

    def scan_stage(c, a, b):
        seg = pallas_scan.fused_scan_call(a, b + c * 1e-30, tbl, shift, k_pool)
        return seg[0][0]

    res["fold_scan"] = timeit(scan_stage, sk, sw)
    seg = jax.jit(
        lambda a, b: pallas_scan.fused_scan_call(a, b, tbl, shift, k_pool)
    )(sk, sw)

    def extract_stage(c, k, s0, s1, s2):
        is_marker = (k & jnp.uint32(2 * k_pool - 1)) == jnp.uint32(2 * k_pool - 1)
        key2 = jnp.where(is_marker, k >> shift, jnp.uint32(0xFFFFFFFF))
        out = accum_mod._marker_extract(
            key2, [s0 + c * 1e-30, s1, s2], P, block)
        return out[0, 0]

    res["fold_extract"] = timeit(extract_stage, sk, *seg)

    res["rays_per_sec_full"] = round(B / res["full_step"])
    for k, v in list(res.items()):
        if isinstance(v, float) and k not in ("live_frac",):
            res[k] = round(v, 5)
    print(json.dumps(res, indent=1, default=str))


if __name__ == "__main__":
    main()
