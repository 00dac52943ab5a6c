"""Matmul-sandwich fold: kernel parity (interpreter) + oracle exactness.

The sandwich (core/pallas_sandwich.py) is the sort-free scatter-add: an
arbitrary chunk-list one-hot matmul. Its contract: rows whose chunk appears
in the list accumulate exactly (up to bf16 rounding of the value operand);
all other rows contribute nothing; two passes with complementary lists
reconstruct the full image exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ice_halo_sim_tpu.core import pallas_sandwich as ps


@pytest.fixture()
def interpret():
    ps.INTERPRET = True
    yield
    ps.INTERPRET = False


def _rows(n, P, K, seed=0, dead_frac=0.3):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, P, n).astype(np.int32)
    dead = rng.random(n) < dead_frac
    pix[dead] = -1
    w = (rng.random(n) * 2).astype(np.float32)
    w[dead] = 0.0
    wl = rng.integers(0, K, n).astype(np.uint32)
    tbl = rng.random((K, 3)).astype(np.float32)
    return pix, w, wl, tbl


def _bincount_img(pix, w, wl, tbl, P):
    vals = tbl[wl] * w[:, None]
    img = np.zeros((P, 3))
    live = (pix >= 0) & (pix < P)
    for c in range(3):
        img[:, c] = np.bincount(pix[live], weights=vals[live][:, c], minlength=P)
    return img


def test_oracle_matches_bincount():
    P, K, n = 4 * ps.NLO, 8, 5000
    pix, w, wl, tbl = _rows(n, P, K)
    cl = jnp.arange(4, dtype=jnp.int32)
    tile = jnp.zeros((4, 3 * ps.NLO), jnp.float32)
    out, matched = ps.sandwich_oracle(tile, cl, jnp.asarray(pix), jnp.asarray(w),
                                      jnp.asarray(wl), jnp.asarray(tbl))
    np.testing.assert_array_equal(
        np.asarray(matched), ((pix >= 0) & (pix < P)).astype(np.int32)
    )
    img = ps.assemble_image([(out, cl)], P, 3)
    np.testing.assert_allclose(img, _bincount_img(pix, w, wl, tbl, P), rtol=2e-5,
                               atol=1e-4)


@pytest.mark.parametrize("precise", [False, True])
def test_kernel_matches_oracle_interpret(interpret, precise):
    P, K, n = 16 * ps.NLO, 16, 3 * 512
    pix, w, wl, tbl = _rows(n, P, K, seed=3)
    # Arbitrary (non-contiguous, shuffled) chunk list + padding slot.
    cl = jnp.asarray([5, 2, 11, 0, 7, 15, -1, -1], jnp.int32)
    tile0 = jnp.zeros((8, 3 * ps.NLO), jnp.float32)
    got, gm = ps.sandwich_pass(
        tile0, cl, jnp.asarray(pix), jnp.asarray(w), jnp.asarray(wl),
        jnp.asarray(tbl), k_pool=K, rb=512, precise=precise,
    )
    want, wm = ps.sandwich_oracle(tile0, cl, jnp.asarray(pix), jnp.asarray(w),
                                  jnp.asarray(wl), jnp.asarray(tbl))
    np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
    tol = 1e-4 if precise else 6e-3  # two-term bf16 split: ~2^-16 relative
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        rtol=tol, atol=tol * float(np.abs(np.asarray(want)).max() + 1),
    )


def test_two_pass_split_is_exact(interpret):
    """Hot pass (some chunks, all rows) + cold pass (complement chunks,
    only non-hot rows) reconstructs the full image: the production fold's
    correctness-without-calibration property."""
    P, K, n = 12 * ps.NLO, 8, 2048
    pix, w, wl, tbl = _rows(n, P, K, seed=9, dead_frac=0.2)
    hot = jnp.asarray([3, 0, 9, 10], jnp.int32)
    cold = jnp.asarray([1, 2, 4, 5, 6, 7, 8, 11], jnp.int32)
    hot_tile, _ = ps.sandwich_pass(
        jnp.zeros((4, 3 * ps.NLO), jnp.float32), hot, jnp.asarray(pix),
        jnp.asarray(w), jnp.asarray(wl), jnp.asarray(tbl), k_pool=K, rb=512,
        precise=True,
    )
    # Cold routing: mask hot rows dead (the engine compacts them too; the
    # kernel does not care).
    chunk = pix // ps.NLO
    is_hot = np.isin(chunk, np.asarray(hot))
    pix_c = np.where(is_hot, -1, pix).astype(np.int32)
    w_c = np.where(is_hot, 0.0, w).astype(np.float32)
    cold_tile, _ = ps.sandwich_pass(
        jnp.zeros((8, 3 * ps.NLO), jnp.float32), cold, jnp.asarray(pix_c),
        jnp.asarray(w_c), jnp.asarray(wl), jnp.asarray(tbl), k_pool=K, rb=512,
        precise=True,
    )
    img = ps.assemble_image([(hot_tile, hot), (cold_tile, cold)], P, 3)
    np.testing.assert_allclose(
        img, _bincount_img(pix, w, wl, tbl, P), rtol=2e-5, atol=1e-4
    )


def _mini_cfg(res):
    return {
        "crystal": [
            {"id": 1, "type": "prism", "shape": {"height": 1.2},
             "axis": {"zenith": {"type": "uniform", "mean": 90, "std": 360},
                      "azimuth": {"type": "uniform", "mean": 0, "std": 360}}}
        ],
        "filter": [],
        "scene": {
            "light_source": {"type": "sun", "altitude": 20, "spectrum": "D65"},
            "ray_num": 100000, "max_hits": 5,
            "scattering": [{"prob": 0.0,
                            "entries": [{"crystal": 1, "proportion": 10}]}],
        },
        "render": [
            {"id": 1, "lens": {"type": "fisheye_equal_area", "fov": 165},
             "resolution": list(res), "view": {"elevation": 90},
             "visible": "full"},
        ],
    }


@pytest.mark.slow
@pytest.mark.parametrize("res", [(96, 96), (256, 256)])
def test_engine_sandwich_matches_scatter_oracle(interpret, res):
    """Full engine: the sandwich fold (single-pass for the small render,
    two-pass hot/cold for the large one) matches the scatter-fold oracle
    across calibration (hot-list rebase + settle cycle) to bf16 rounding."""
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine

    cfg = load_project(_mini_cfg(res))
    a = Engine(cfg, seed=3, batch_size=1 << 12, accum_method="sort")
    assert a._sandwich_on, "sandwich path did not engage"
    # Small render: one full-coverage level; large: a multi-level cascade.
    assert (len(a._levels[0]) == 1) == (res == (96, 96))
    b = Engine(cfg, seed=3, batch_size=1 << 12, accum_method="scatter")
    # Two run calls: the first dispatch triggers calibration (hot-list
    # rebase + tile settle); the second exercises the recalibrated step.
    a.run(n_batches=2); a.run(n_batches=2)
    b.run(n_batches=2); b.run(n_batches=2)
    assert a._calibrated
    ia, ib = a.raw_xyz(0), b.raw_xyz(0)
    mass_a, mass_b = float(ia.sum()), float(ib.sum())
    assert mass_b > 0
    # bf16 value rounding: ~0.4% per row, averaging down per pixel.
    assert abs(mass_a - mass_b) / mass_b < 2e-3
    denom = np.abs(ib).sum()
    assert np.abs(ia - ib).sum() / denom < 6e-3
    # landed weight identical (computed pre-fold on both paths)
    np.testing.assert_allclose(
        np.asarray(a.accum[-1]), np.asarray(b.accum[-1]), rtol=1e-6
    )


@pytest.mark.slow
def test_demotion_preserves_mass(interpret):
    """Auto-dispatch demotion (sandwich -> sort at calibration) must carry
    the already-settled tile mass into the dense accumulator exactly ONCE.

    Regression for ADVICE r3 #1: _sandwich_recalibrate settled the tiles
    into _settled, then the demotion branch re-added the tiles via
    _sandwich_dense — 2x mass on every auto-demoted scene."""
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine

    cfg = load_project(_mini_cfg((96, 96)))
    a = Engine(cfg, seed=5, batch_size=1 << 12, accum_method="sort")
    assert a._sandwich_on
    # Force the dispatch to pick the sort fold at calibration time.
    a._C_SORT_FIX = -1e9
    b = Engine(cfg, seed=5, batch_size=1 << 12, accum_method="scatter")
    a.run(n_batches=2)       # first dispatch calibrates -> demotes
    assert not a._sandwich_on
    assert "sort fold" in a.fold_decision
    a.run(n_batches=2)       # post-demotion batches fold into dense accum
    b.run(n_batches=2); b.run(n_batches=2)
    ia, ib = a.raw_xyz(0), b.raw_xyz(0)
    mass_a, mass_b = float(ia.sum()), float(ib.sum())
    assert mass_b > 0
    assert abs(mass_a - mass_b) / mass_b < 2e-3
    np.testing.assert_allclose(
        np.asarray(a.accum[-1]), np.asarray(b.accum[-1]), rtol=1e-6
    )
