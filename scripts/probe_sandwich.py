#!/usr/bin/env python
"""Probe: "matmul sandwich" scatter-add vs the production sort fold.

Binning N contribution rows into P pixels decomposes as a two-level
one-hot product on the MXU: with p = hi * NLO + lo,

    out[hi, c * NLO + lo] = sum_r [hi_r == hi] * (w_r * basis_c(wl_r)) * [lo_r == lo]
                          = (onehot_hi^T  @  (w * basis_c <*> onehot_lo))

i.e. ONE [NHI, RB] @ [RB, 3 * NLO] matmul per row block, accumulated in a
VMEM-resident [NHI, 3 * NLO] f32 output. Cost is ~2 * N * 3 * P FLOPs —
independent of how P splits into NHI * NLO — so it only beats the sort's
~2.9 ns/row when restricted to a HOT SUBSET of pixels (P_hot <= ~32k).
Dead rows (pix outside [0, P)) match no one-hot column and cost nothing.

This probe measures, on the real chip at production row counts:
  1. the sandwich kernel at NHI=256 (32k hot pixels) and NHI=1024 (full
     131k image), RB 1024/2048;
  2. the production fold_spectral_keys on the same rows;
  3. bf16 rounding error of the sandwich vs exact np.bincount.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_REPS = 8


def timeit(jfn, n=3):
    np.asarray(jfn()); np.asarray(jfn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jfn())
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) / K_REPS * 1e3, 3)


def make_sandwich(NHI, NLO, RB, K):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    C = 3

    def kernel(pixc_ref, pixr_ref, w_ref, wl_ref, tbl_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        pixc = pixc_ref[...]                                   # [1, RB] i32
        pixr = pixr_ref[...]                                   # [RB, 1] i32
        w = w_ref[...]                                         # [RB, 1] f32
        wl = wl_ref[...]                                       # [RB, 1] i32
        # Per-row basis from the K-entry pool table: one-hot [RB, K] @ [K, C].
        ohwl = (wl == jax.lax.broadcasted_iota(jnp.int32, (RB, K), 1)).astype(
            jnp.float32
        )
        basis = jnp.dot(ohwl, tbl_ref[...], preferred_element_type=jnp.float32)
        vals = basis * w                                       # [RB, C]

        hi = pixc // NLO                                       # [1, RB]
        lo = pixr - (pixr // NLO) * NLO                        # [RB, 1]
        ohT = (hi == jax.lax.broadcasted_iota(jnp.int32, (NHI, RB), 0)).astype(
            jnp.bfloat16
        )
        ohlo = (
            lo == jax.lax.broadcasted_iota(jnp.int32, (RB, NLO), 1)
        ).astype(jnp.float32)
        bmat = jnp.concatenate(
            [(ohlo * vals[:, c : c + 1]).astype(jnp.bfloat16) for c in range(C)],
            axis=1,
        )                                                      # [RB, C*NLO]
        out_ref[...] += jax.lax.dot_general(
            ohT, bmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def run(pix, w, wl_idx, tbl):
        N = pix.shape[0]
        assert N % RB == 0
        grid = (N // RB,)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, RB), lambda i: (0, i)),
                pl.BlockSpec((RB, 1), lambda i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda i: (i, 0)),
                pl.BlockSpec((K, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((NHI, C * NLO), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((NHI, C * NLO), jnp.float32),
        )(
            pix.reshape(1, N),
            pix.reshape(N, 1),
            w.reshape(N, 1),
            wl_idx.astype(jnp.int32).reshape(N, 1),
            tbl,
        )
        return out

    return run


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/iht_jax_cache")
    )
    from functools import partial

    from ice_halo_sim_tpu.core import accum as accum_mod

    P = 512 * 256
    K = 64
    N = 3_342_336  # ~ production fold rows/batch (multiple of 2048)
    rng = np.random.default_rng(0)
    # Realistic-ish pixel distribution: gaussian mixture -> ring-like
    # concentration, ~25% dead rows.
    pix_np = (rng.normal(0.4, 0.18, N) * P).astype(np.int64)
    dead = rng.random(N) < 0.25
    pix_np[dead] = -1
    pix_np = np.clip(pix_np, -1, P - 1).astype(np.int32)
    w_np = rng.random(N).astype(np.float32) * 0.9 + 0.1
    w_np[dead] = 0.0
    wl_np = rng.integers(0, K, N).astype(np.uint32)
    tbl_np = rng.random((K, 3)).astype(np.float32)

    pix = jnp.asarray(pix_np)
    w = jnp.asarray(w_np)
    wl = jnp.asarray(wl_np)
    tbl = jnp.asarray(tbl_np)
    res = {}

    # Exact reference for error measurement.
    vals_np = tbl_np[wl_np] * w_np[:, None]
    img_ref = np.zeros((P, 3))
    live = pix_np >= 0
    for c in range(3):
        img_ref[:, c] = np.bincount(
            pix_np[live], weights=vals_np[live][:, c], minlength=P
        )

    for NHI, NLO in [(256, 128), (1024, 128)]:
        for RB in (1024, 2048):
            run = make_sandwich(NHI, NLO, RB, K)
            Phot = NHI * NLO

            def fn(run=run):
                def body(i, c):
                    o = run(pix + (i - i).astype(jnp.int32), w, wl, tbl)
                    return c * 1e-30 + jnp.sum(o)
                return jax.lax.fori_loop(0, K_REPS, body, jnp.float32(0))

            try:
                ms = timeit(jax.jit(fn))
            except Exception as e:  # noqa: BLE001
                print(f"NHI={NHI} RB={RB}: FAILED {type(e).__name__}: {e}")
                continue
            res[f"sandwich_hi{NHI}_rb{RB}"] = ms
            # error check (only rows landing under Phot counted)
            out = np.asarray(run(pix, w, wl, tbl))
            img = out.reshape(NHI, 3, NLO).transpose(0, 2, 1).reshape(Phot, 3)
            ref = img_ref[:Phot]
            mass = ref.sum()
            err = np.abs(img - ref).sum() / max(mass, 1e-9)
            print(
                f"NHI={NHI:5d} RB={RB}: {ms:7.3f} ms  relL1={err:.2e}", flush=True
            )

    # Production fold on the same rows.
    key, wz = accum_mod.pack_spectral_keys(pix, w, wl, P, K)
    basis_fn = lambda idx: tbl[idx.astype(jnp.int32)]  # noqa: E731
    acc0 = jnp.zeros((P, 3), jnp.float32)

    def fold_fn():
        def body(i, c):
            a = accum_mod.fold_spectral_keys(
                acc0 + c * 1e-30, key, wz, K, basis_fn
            )
            return jnp.sum(a) * 1e-30
        return jax.lax.fori_loop(0, K_REPS, body, jnp.float32(0))

    ms = timeit(jax.jit(fold_fn))
    print(f"fold_spectral_keys (sort):        {ms:7.3f} ms", flush=True)
    print(res)


if __name__ == "__main__":
    main()
