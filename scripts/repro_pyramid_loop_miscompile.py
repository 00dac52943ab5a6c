#!/usr/bin/env python
"""Minimal repro: looped compilation of an NF=20 slab trace mis-traces on
real TPU (v5e/axon), while the identical straight-line (unrolled) program
is correct.

Distilled from the round-4 pyramid-blob bug (ice_halo_sim_tpu r4: with
`lax.fori_loop`/`lax.scan` around the batch step, every ray of an NF=20
(pyramid-slot) trace came out near-undeviated — 81% of image mass within
3 px of the sun vs 15% from the same step compiled straight-line; prism
NF=8 scenes were bit-identical loop-vs-unroll; CPU was correct in all
four combinations). The production workaround unrolls multi-step
dispatches host-side for pyramid scenes (engine/simulator.py
_multi_step_impl); scripts/tpu_smoke.py asserts the engine-level ring
structure on every TPU gate run. THIS script is the standalone A/B the
megakernel work and any upstream report can test against.

Structure kept from the real trace (everything else stripped):
  - a per-ray bounce loop over NF static plane normals: per bounce the
    argmin-t face is selected by masked min + one-hot reduction, the ray
    reflects off it, and per-face running distances update;
  - the whole batch step wrapped in lax.fori_loop over steps (the
    production multi-batch dispatch) vs a host-unrolled chain.

PASS = loop and unroll agree for both NF=8 and NF=20 (bug absent/fixed).
FAIL(NF=20 only) = the round-4 platform miscompile signature.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

B = 4096    # rays per step
H = 6       # bounces
STEPS = 4


def hashf(i, s):
    x = (i * jnp.uint32(1000003) + jnp.uint32(s)) * jnp.uint32(747796405)
    x = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * jnp.uint32(277803737)
    return ((x >> jnp.uint32(22)) ^ x >> jnp.uint32(8)).astype(
        jnp.int32
    ).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def make_planes(nf):
    """nf unit normals spread over the sphere (host constants, like the
    crystal face tables)."""
    g = np.linspace(0.15, 0.95, nf)
    th = np.linspace(0.0, 2 * np.pi, nf, endpoint=False)
    n = np.stack([np.cos(th) * g, np.sin(th) * g, np.sqrt(1 - g * g)], -1)
    return (n / np.linalg.norm(n, axis=1, keepdims=True)).astype(np.float32)


def one_step(counter, nf):
    planes = make_planes(nf)
    i = jnp.arange(B, dtype=jnp.uint32) + counter * jnp.uint32(B)
    # incoming directions: unit vectors, mostly downward (the sun beam)
    u1 = hashf(i, 1) * 0.2 - 0.1
    u2 = hashf(i, 2) * 0.2 - 0.1
    dz = -jnp.sqrt(jnp.maximum(1.0 - u1 * u1 - u2 * u2, 0.0))
    dx, dy = u1, u2
    dist = [hashf(i, 10 + f) + 0.5 for f in range(nf)]
    prev = jnp.full((B,), -1, jnp.int32)
    for _h in range(H):
        t_best = jnp.full((B,), 1e30, jnp.float32)
        fi = jnp.zeros((B,), jnp.int32)
        denoms = []
        for f in range(nf):
            nx, ny, nz = (float(planes[f, c]) for c in range(3))
            den = dx * nx + dy * ny + dz * nz
            denoms.append(den)
            t = -dist[f] / jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
            cand = (den > 1e-5) & (prev != f)
            tm = jnp.where(cand, t, 1e30)
            upd = tm < t_best
            fi = jnp.where(upd, f, fi)
            t_best = jnp.where(upd, tm, t_best)
        alive = t_best < 5e29
        nxs = jnp.zeros((B,)); nys = jnp.zeros((B,)); nzs = jnp.zeros((B,))
        for f in range(nf):
            m = fi == f
            nxs = jnp.where(m, float(planes[f, 0]), nxs)
            nys = jnp.where(m, float(planes[f, 1]), nys)
            nzs = jnp.where(m, float(planes[f, 2]), nzs)
        for f in range(nf):
            dist[f] = jnp.where(alive, dist[f] + t_best * denoms[f], dist[f])
        ct = dx * nxs + dy * nys + dz * nzs
        dx = jnp.where(alive, dx - 2 * ct * nxs, dx)
        dy = jnp.where(alive, dy - 2 * ct * nys, dy)
        dz = jnp.where(alive, dz - 2 * ct * nzs, dz)
        prev = jnp.where(alive, fi, prev)
    # deflection histogram: how far did rays turn from straight down?
    cos_dev = -dz  # 1.0 = undeviated
    return jnp.stack([
        jnp.sum((cos_dev > 0.999).astype(jnp.float32)),   # near-undeviated
        jnp.sum((cos_dev < 0.9).astype(jnp.float32)),     # strongly deviated
        jnp.sum(dx) + jnp.sum(dy) + jnp.sum(dz),          # checksum
    ])


def run(nf, looped):
    @jax.jit
    def prog():
        if looped:
            def body(k, acc):
                return acc + one_step(jnp.uint32(k), nf)
            return jax.lax.fori_loop(0, STEPS, body, jnp.zeros(3))
        acc = jnp.zeros(3)
        for k in range(STEPS):
            acc = acc + one_step(jnp.uint32(k), nf)
        return acc
    return np.asarray(prog())


def main():
    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    ok = True
    for nf in (8, 20):
        a = run(nf, looped=False)
        b = run(nf, looped=True)
        same = np.allclose(a, b, rtol=1e-5)
        print(f"NF={nf:2d}: unrolled {a} | fori_loop {b} | "
              f"{'MATCH' if same else 'MISMATCH  <-- miscompile signature'}")
        ok &= same
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
