#!/usr/bin/env python
"""Probe: distribution of live contribution-row weights on the bench scene.

Question: what fraction of live fold rows carry weight below a relative
threshold tau * w0_mean? Every live row costs the fold sort ~2.9 ns plus
scan/extract bandwidth; rows with negligible radiance could be dropped at
emit time (accounted into dropped_w) if the mass they carry is tiny.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    from bench import BENCH_CFG
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine

    cfg = load_project(BENCH_CFG)
    engine = Engine(cfg, seed=7, batch_size=1 << 14)
    contribs, landed, dropped, segs, dem = jax.jit(
        engine._trace_batch_impl
    )(np.uint32(0), np.uint32(0))
    (pix, w, wl_idx, mask) = contribs[0]
    w = np.asarray(w)
    pix = np.asarray(pix)
    live = w > 0
    n = w.size
    wl = w[live]
    total = wl.sum()
    print(f"rows={n} live={live.sum()} ({100*live.mean():.1f}%) mass={total:.4g}")
    # w0 scale: mean initial SPD weight
    w0 = float(np.mean(wl)) if wl.size else 1.0
    for tau in [1e-2, 3e-3, 1e-3, 3e-4, 1e-4, 1e-5]:
        cut = wl < tau
        print(
            f"tau={tau:8.0e}  rows_below={cut.sum():8d} ({100*cut.mean():5.1f}% of live)"
            f"  mass_below={wl[cut].sum()/total*100:8.4f}%"
        )
    q = np.quantile(wl, [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    print("weight quantiles:", [f"{x:.3g}" for x in q])
    # pixel concentration: top-k pixel mass coverage
    P = 512 * 256
    img = np.bincount(pix[live], weights=wl, minlength=P)
    order = np.sort(img)[::-1]
    cs = np.cumsum(order) / total
    for k in [8192, 16384, 32768, 65536]:
        nz = (img > 0).sum()
        print(f"top-{k} pixels cover {100*cs[k-1]:.2f}% of mass (nonzero px={nz})")


if __name__ == "__main__":
    main()
