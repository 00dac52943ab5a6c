#!/usr/bin/env python
"""Round-4 fold stage decomposition at HEAD production shapes.

Bench scene after slot-cap calibration: N=5.24M contribution rows,
live ~1.92M, keep=2,207,744, P=131072, k_pool=64. Chained-rep harness
(see probe_step_r3.py).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_REPS = 8

def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/iht_jax_cache"))
    from ice_halo_sim_tpu.core import accum, pallas_scan, pallas_ops
    print("backend:", jax.default_backend(), flush=True)

    rng = np.random.default_rng(0)
    N = 5242880
    LIVE = 1920000
    P = 512 * 256
    KEEP = 2207744
    K = 64
    shift = (2 * K).bit_length() - 1

    pix = np.full(N, -1, np.int32)
    live_at = rng.choice(N, LIVE, replace=False)
    pix[live_at] = rng.integers(0, P, LIVE)
    w = np.where(pix >= 0, rng.random(N).astype(np.float32), 0.0).astype(np.float32)
    wl = rng.integers(0, K, N).astype(np.uint32)

    jpix = jnp.asarray(pix); jw = jnp.asarray(w); jwl = jnp.asarray(wl)
    key, wz = accum.pack_spectral_keys(jpix, jw, jwl, P, K)
    key = jax.device_put(key); wz = jax.device_put(wz)

    def chain(fn, *args):
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

    floor = chain(lambda a: a, jnp.float32(1.0))
    print(f"floor: {floor:.2f} ms", flush=True)

    # stage 1: compact_valid at default block
    def comp(k, v):
        (ck, cw), n = accum.compact_valid(k, [v], KEEP)
        return ck, cw, n
    t = chain(comp, key, wz) - floor
    print(f"compact_valid (block=4096): {t:.2f} ms", flush=True)

    # compacted inputs for the rest
    (ck, cw), _ = jax.jit(lambda k, v: accum.compact_valid(k, [v], KEEP))(key, wz)
    ck = jax.device_put(ck); cw = jax.device_put(cw)

    # stage 2: global sort keep+P (+pad)
    marker_keys = (jnp.arange(P, dtype=jnp.uint32) << shift) | jnp.uint32(2*K - 1)
    def srt(k, v):
        keys = jnp.concatenate([k, marker_keys])
        w_all = jnp.concatenate([v, jnp.zeros(P, v.dtype)])
        M = KEEP + P
        block = 4096
        pad = -(-M // block) * block - M
        if pad:
            keys = jnp.concatenate([keys, jnp.full(pad, 0xFFFFFFFF, jnp.uint32)])
            w_all = jnp.concatenate([w_all, jnp.zeros(pad, v.dtype)])
        s = jax.lax.sort((keys, w_all), num_keys=1)
        return s
    t = chain(srt, ck, cw) - floor
    print(f"global sort ({KEEP+P} rows +pad): {t:.2f} ms", flush=True)

    sk, sw = jax.jit(srt)(ck, cw)
    sk = jax.device_put(sk); sw = jax.device_put(sw)
    from ice_halo_sim_tpu.core import color
    tbl = jnp.asarray(rng.random((K, 3)), jnp.float32)

    # stage 3: fused scan
    def scan(k, v):
        return pallas_scan.fused_scan_call(k, v, tbl, shift, K)
    t = chain(scan, sk, sw) - floor
    print(f"fused scan: {t:.2f} ms", flush=True)

    seg = jax.jit(scan)(sk, sw)
    seg = [jax.device_put(s) for s in seg]

    # stage 4: marker extract
    def ext(k, *cols):
        is_marker = (k & jnp.uint32(2*K - 1)) == jnp.uint32(2*K - 1)
        key2 = jnp.where(is_marker, k >> shift, jnp.uint32(0xFFFFFFFF))
        return accum._marker_extract(key2, list(cols), P, 4096)
    t = chain(ext, sk, *seg) - floor
    print(f"marker extract: {t:.2f} ms", flush=True)

    # full fold for reference
    acc = jnp.zeros((P, 3), jnp.float32)
    def full(k, v):
        return accum.fold_spectral_keys(acc, k, v, K, lambda i: tbl[i], )
    t = chain(full, ck, cw) - floor
    print(f"fold_spectral_keys on compacted ({KEEP} rows): {t:.2f} ms", flush=True)
    def full_raw(k, v):
        return accum.fold_spectral_keys(acc, k, v, K, lambda i: tbl[i], )
    t = chain(full_raw, key, wz) - floor
    print(f"fold_spectral_keys uncompacted ({N} rows): {t:.2f} ms", flush=True)

main()
