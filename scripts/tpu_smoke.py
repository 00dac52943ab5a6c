#!/usr/bin/env python
"""On-TPU smoke gate: run before committing anything that touches core/.

Round 1 shipped a Pallas kernel that passed every CPU/interpreter test but
crashed in Mosaic LOWERING on the real chip (BENCH_r01: "Reductions over
unsigned integers not implemented") — a class of bug interpreter tests
cannot catch by construction. This script compiles and executes, on the
real TPU, in a few seconds:

  1. each Pallas kernel standalone (pallas_ops.scatter_blocks VMEM + HBM
     variants, pallas_scan.fused_scan_call), checked against its XLA
     fallback (IHT_PALLAS=0 re-run of the same jitted fn);
  2. one tiny-batch Engine._step_impl (the full fused trace program);
  3. a fold round-trip at production-like row counts.

Exit code 0 = safe to commit. Mirrors the reference's pre-commit perf/parity
discipline (doc/performance-testing.md:76-170).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[tpu_smoke] {msg}", flush=True)


def check_scatter_blocks():
    import jax
    import jax.numpy as jnp

    from ice_halo_sim_tpu.core import pallas_ops

    rng = np.random.default_rng(0)
    for out_len, G, block in [(131072, 24, 4096), (4 << 20, 48, 4096)]:
        vals = jnp.asarray(
            rng.standard_normal((G, block)).astype(np.float32)
        )
        cnt = rng.integers(0, block, G).astype(np.int32)
        start = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int32)
        start_j = jnp.asarray(start)
        got = np.asarray(
            jax.jit(pallas_ops.scatter_blocks, static_argnums=(2, 3))(
                vals, start_j, out_len, block
            )
        )
        want = np.zeros(out_len + block, np.float32)
        for g in range(G):
            if start[g] < out_len:
                want[start[g] : start[g] + block] = np.asarray(vals[g])
        np.testing.assert_allclose(got, want[:out_len], rtol=0, atol=0)
        log(f"scatter_blocks out_len={out_len}: OK")


def check_pack_valid():
    import jax
    import jax.numpy as jnp

    from ice_halo_sim_tpu.core import pallas_ops

    rng = np.random.default_rng(2)
    block, G = 4096, 24
    N = G * block
    key = rng.integers(0, 1 << 22, N).astype(np.uint32)
    key[rng.random(N) < 0.6] = 0xFFFFFFFF
    w = rng.uniform(0.1, 1.0, N).astype(np.float32)
    pk, (pw,), counts = jax.jit(
        lambda k, a: pallas_ops.pack_valid_blocks(k, [a], 0xFFFFFFFF, block)
    )(jnp.asarray(key), jnp.asarray(w))
    pk, pw, counts = map(np.asarray, (pk, pw, counts))
    for g in range(G):
        sl = slice(g * block, (g + 1) * block)
        sel = key[sl] != 0xFFFFFFFF
        n = int(sel.sum())
        assert counts[g] == n, (g, counts[g], n)
        np.testing.assert_array_equal(pk[sl][:n], key[sl][sel])
        np.testing.assert_array_equal(pw[sl][:n], w[sl][sel])
        assert (pk[sl][n:] == 0xFFFFFFFF).all() and (pw[sl][n:] == 0).all()
    log("pack_valid_blocks (butterfly compaction): OK")


def check_fused_scan():
    import jax
    import jax.numpy as jnp

    from ice_halo_sim_tpu.core import accum

    rng = np.random.default_rng(1)
    P, K, N = 131072, 8, 300000
    pix = rng.integers(0, P, N).astype(np.int32)
    w = rng.random(N).astype(np.float32)
    wl = rng.integers(0, K, N).astype(np.uint32)
    tbl = rng.random((K, 3)).astype(np.float32)

    def basis_fn(idx):
        return jnp.asarray(tbl)[idx]

    acc0 = jnp.zeros((P, 3), jnp.float32)
    f = jax.jit(
        lambda a, p, ww, wi: accum.fold_spectral(a, p, ww, wi, K, basis_fn)
    )
    got = np.asarray(f(acc0, jnp.asarray(pix), jnp.asarray(w), jnp.asarray(wl)))
    want = np.zeros((P, 3), np.float64)
    np.add.at(want, pix, tbl[wl] * w[:, None])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)
    log("fold_spectral (pallas_scan + scatter path): OK")


def check_sandwich():
    """sandwich_pass hot + cold + precise on the REAL chip vs float64 truth
    (round-2 regression class: kernel passed interpreter tests, failed
    Mosaic lowering — arith.cmpf on bf16 vectors, BENCH_r02)."""
    import jax.numpy as jnp

    from ice_halo_sim_tpu.core import pallas_sandwich as ps

    rng = np.random.default_rng(0)
    P, K, n = 256 * ps.NLO, 64, 1 << 16
    tbl = rng.random((K, 3)).astype(np.float32)
    hot = np.sort(rng.choice(P // ps.NLO, 128, replace=False)).astype(np.int32)
    cold = np.setdiff1d(np.arange(P // ps.NLO, dtype=np.int32), hot)
    pix = rng.integers(-1, P, n).astype(np.int32)
    w = rng.random(n).astype(np.float32)
    w[pix < 0] = 0
    wl = rng.integers(0, K, n).astype(np.uint32)

    vals = tbl[wl].astype(np.float64) * w[:, None]
    img = np.zeros((P, 3))
    np.add.at(img, pix[pix >= 0], vals[pix >= 0])

    for precise, tol in ((False, 4e-3), (True, 1e-5)):
        ht, m = ps.sandwich_pass(
            jnp.zeros((len(hot), 3 * ps.NLO), jnp.float32), jnp.asarray(hot),
            jnp.asarray(pix), jnp.asarray(w), jnp.asarray(wl),
            jnp.asarray(tbl), k_pool=K, precise=precise,
        )
        is_hot = np.isin(pix // ps.NLO, hot) & (pix >= 0)
        np.testing.assert_array_equal(np.asarray(m), is_hot.astype(np.int32))
        ct, _ = ps.sandwich_pass(
            jnp.zeros((len(cold), 3 * ps.NLO), jnp.float32), jnp.asarray(cold),
            jnp.asarray(np.where(is_hot, -1, pix).astype(np.int32)),
            jnp.asarray(np.where(is_hot, 0, w).astype(np.float32)),
            jnp.asarray(wl), jnp.asarray(tbl), k_pool=K, precise=precise,
        )
        got = ps.assemble_image([(ht, hot), (ct, cold)], P, 3)
        err = np.abs(got - img).max() / (np.abs(img).max() + 1e-12)
        assert err < tol, (precise, err)
        log(f"sandwich_pass precise={precise} two-pass vs f64: rel {err:.2e} OK")


def check_step_impl():
    import __graft_entry__ as ge

    # Pin the fold dispatch: the gate exists to exercise the SANDWICH path
    # end-to-end in a real engine; "auto" may legitimately choose the sort
    # fold for this scene's row spread (that is a dispatch decision, not a
    # fallback — the distinction the fold_kind assertion below enforces).
    os.environ["IHT_FOLD"] = "sandwich"
    try:
        engine = ge._bench_engine(batch_size=8192)
        assert engine._sandwich_on, (
            "sandwich fold did not engage with IHT_FOLD=sandwich — the gate "
            "exists to exercise the production fold, not the fallback"
        )
        engine.run(n_batches=2)
        engine.run(n_batches=2)  # post-calibration step (rebased hot lists)
        assert engine.fold_kind == "sandwich", (
            f"fold degraded to {engine.fold_kind!r} — the smoke gate treats "
            "any silent fallback as FAILURE (round-2 lesson)"
        )
        xyz = engine.raw_xyz(0)
        assert np.isfinite(xyz).all(), "step produced non-finite accumulators"
        assert xyz.sum() > 0, "step produced an empty image"
        log(f"Engine._step_impl tiny batch (fold={engine.fold_kind}, "
            f"{engine.fold_decision}): OK")
    finally:
        os.environ.pop("IHT_FOLD", None)



def check_pyramid_pool_faces():
    """r5 root-cause guard for the 'pyramid blob': the geometry builder's
    feasibility contraction must stay f32 (an einsum here lowers to the
    MXU at the stack's DEFAULT matmul precision — bf16 on current stacks —
    and drops every non-basal face; see
    scripts/repro_pyramid_loop_miscompile.py). All 20 faces of the e2e
    pyramid crystal must be present when the pool is built ON CHIP."""
    import jax.numpy as jnp
    import numpy as np

    from ice_halo_sim_tpu.config.loader import load_project_file
    from ice_halo_sim_tpu.engine.simulator import Engine

    cfg = load_project_file("/root/reference/test/e2e/configs/pyramid.json")
    eng = Engine(cfg, seed=3, batch_size=1 << 14)
    import jax

    pool = jax.jit(
        lambda: eng._sample_layer_pool(0, eng.layers[0], jnp.uint32(0))
    )()
    present = np.asarray(pool.face_present)[0]
    assert present.all(), (
        f"pyramid pool on chip dropped faces: present={present.astype(int)} "
        "— the geometry feasibility math is running below f32 again"
    )
    log("pyramid pool face presence on chip: OK (20/20)")


def check_trace_kernel_ab():
    """Megakernel A/B: the Pallas trace kernel and the XLA trace path must
    agree on chip (exact traced-segment counts — streams are shared
    bit-for-bit — and image mass to float noise). Guards the kernel
    against platform miscompiles the interpreter tests cannot see."""
    import numpy as np

    from ice_halo_sim_tpu.config.loader import load_project_file
    from ice_halo_sim_tpu.engine.simulator import Engine

    os.environ["IHT_MIN_EMIT_W"] = "0"
    os.environ["IHT_SLOT_CAP"] = "off"
    try:
        cfg = load_project_file(
            "/root/reference/test/e2e/configs/bench_light_single_ms.json"
        )
        ek = Engine(cfg, seed=9, batch_size=1 << 15, accum_method="sort")
        assert ek.trace_path == "pallas-megakernel", ek._kernel_reason
        ek.run(n_batches=2)
        ek.drain_stats()
        os.environ["IHT_PALLAS_TRACE"] = "0"
        ex = Engine(cfg, seed=9, batch_size=1 << 15, accum_method="sort")
        ex.run(n_batches=2)
        ex.drain_stats()
        assert ek.stats.ray_segments == ex.stats.ray_segments, (
            ek.stats.ray_segments, ex.stats.ray_segments,
        )
        a, b = ek.raw_xyz(0), ex.raw_xyz(0)
        rel = float(np.abs(a - b).sum() / max(b.sum(), 1e-9))
        assert rel < 5e-3, f"kernel-vs-XLA image divergence {rel:.2e}"
        log(f"trace kernel A/B vs XLA on chip: OK (segs exact, "
            f"sum|diff|/sum {rel:.1e})")
    finally:
        os.environ.pop("IHT_PALLAS_TRACE", None)
        os.environ.pop("IHT_MIN_EMIT_W", None)
        os.environ.pop("IHT_SLOT_CAP", None)


def check_pyramid_multistep_rings():
    """Round-4 regression guard: the looped (fori_loop/scan) compilation of
    the NF=20 pyramid trace MISCOMPILES on real TPU — rays come out
    near-undeviated and 81% of image mass piles within 3 px of the sun
    (vs 15% correct). The engine unrolls multi-step dispatches for pyramid
    scenes as the workaround; this check drives that exact path and
    asserts the halo ring structure survives."""
    import numpy as np

    from ice_halo_sim_tpu.config.loader import load_project_file
    from ice_halo_sim_tpu.engine.simulator import Engine

    cfg = load_project_file("/root/reference/test/e2e/configs/pyramid.json")
    eng = Engine(cfg, seed=3, batch_size=1 << 15, accum_method="scatter")
    eng.steps_per_dispatch = 4
    eng.run(n_batches=4)     # ONE multi-batch dispatch
    ia = eng.raw_xyz(0)
    h, w, _ = ia.shape
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.hypot(yy - h / 2, xx - w / 2)
    tot = ia.sum()
    near = ia[r < 3].sum() / tot
    ring = ia[(r >= 38) & (r < 58)].sum() / tot
    assert near < 0.4, (
        f"pyramid multi-step: {100 * near:.1f}% of mass within 3 px of the "
        "sun — the looped-trace miscompile is back (expected ~15%)"
    )
    assert ring > 0.2, (
        f"pyramid multi-step: outer ring band carries {100 * ring:.1f}% "
        "of mass (expected ~38%) — halo structure lost"
    )
    log(f"pyramid multi-step rings (near {100 * near:.1f}%, ring "
        f"{100 * ring:.1f}%): OK")


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/iht_jax_cache")
    )
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        log(f"backend is {backend!r}, not TPU — smoke gate is vacuous; FAIL")
        return 2
    t0 = time.time()
    check_scatter_blocks()
    check_pack_valid()
    check_fused_scan()
    check_sandwich()
    check_step_impl()
    check_pyramid_pool_faces()
    check_pyramid_multistep_rings()
    check_trace_kernel_ab()
    log(f"ALL OK in {time.time() - t0:.1f}s on {jax.devices()[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
