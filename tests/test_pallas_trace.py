"""Parity battery for the fused Pallas trace megakernel (core/pallas_trace).

The kernel reuses the XLA trace path's RNG (core/rng), samplers
(core/sampling), optics (core/trace_soa) and projection (core/projection)
VERBATIM, so on the Pallas interpreter (CPU) its output must match the XLA
trace path to float-reassociation tolerance — and integer statistics
(traced segments, live row counts) must match exactly.

Mirrors the reference's cross-backend parity discipline: legacy path is
ground truth, never correlation alone (doc/testing-architecture.md:271-288).
"""

import numpy as np
import pytest

from ice_halo_sim_tpu.config.loader import load_project_file
from ice_halo_sim_tpu.engine.simulator import Engine

CONFIG_DIR = "/root/reference/test/e2e/configs"


@pytest.fixture
def interpret_kernels(monkeypatch):
    from ice_halo_sim_tpu.core import pallas_ops, pallas_scan, pallas_trace

    monkeypatch.setattr(pallas_trace, "INTERPRET", True)
    monkeypatch.setattr(pallas_ops, "INTERPRET", True)
    monkeypatch.setattr(pallas_scan, "INTERPRET", True)
    yield


def _run_pair(monkeypatch, cfg, n_batches=2, batch=4096, seed=7):
    """Run the same scene through the megakernel and the XLA path."""
    # The emit floor's threshold constant differs between the paths
    # (analytic vs batch-mean w_scale) — disable it for exact comparison;
    # the slot cap exists only on the XLA path — disable it too.
    monkeypatch.setenv("IHT_MIN_EMIT_W", "0")
    monkeypatch.setenv("IHT_SLOT_CAP", "off")

    monkeypatch.setenv("IHT_PALLAS_TRACE", "auto")
    ek = Engine(cfg, seed=seed, batch_size=batch, accum_method="sort")
    assert ek.trace_path == "pallas-megakernel", ek._kernel_reason
    ek.run(n_batches=n_batches)
    ek.drain_stats()

    monkeypatch.setenv("IHT_PALLAS_TRACE", "0")
    ex = Engine(cfg, seed=seed, batch_size=batch, accum_method="sort")
    assert ex.trace_path == "xla"
    ex.run(n_batches=n_batches)
    ex.drain_stats()
    return ek, ex


def test_kernel_parity_vs_xla_path(interpret_kernels, monkeypatch):
    cfg = load_project_file(f"{CONFIG_DIR}/bench_light_single_ms.json")
    ek, ex = _run_pair(monkeypatch, cfg)

    # Integer statistics must agree exactly: same rays, same discrete
    # branches (streams are shared bit-for-bit).
    assert ek.stats.ray_segments == ex.stats.ray_segments
    assert ek.stats.rays_traced == ex.stats.rays_traced

    img_k = ek.raw_xyz(0)
    img_x = ex.raw_xyz(0)
    assert img_x.sum() > 0
    # Same contribution rows fold in different orders: allow float
    # reassociation noise only.
    np.testing.assert_allclose(img_k.sum(), img_x.sum(), rtol=1e-5)
    np.testing.assert_allclose(img_k, img_x, rtol=1e-4, atol=1e-6 * img_x.max())
    np.testing.assert_allclose(
        ek.stats.landed_weight, ex.stats.landed_weight, rtol=1e-5
    )


def test_kernel_parity_with_rr_floor_and_tail(interpret_kernels, monkeypatch):
    """The rr emit floor and the exact-ray-budget tail batch run through
    the kernel; with the floor threshold pinned to an absolute value both
    paths draw identical roulette outcomes."""
    cfg = load_project_file(f"{CONFIG_DIR}/bench_light_single_ms.json")
    monkeypatch.setenv("IHT_SLOT_CAP", "off")
    monkeypatch.setenv("IHT_MIN_EMIT_W", "0")

    monkeypatch.setenv("IHT_PALLAS_TRACE", "auto")
    ek = Engine(cfg, seed=3, batch_size=4096, accum_method="sort")
    assert ek.trace_path == "pallas-megakernel"
    ek.run(total_rays=6000)  # tail batch: 6000 = 4096 + 1904
    ek.drain_stats()

    monkeypatch.setenv("IHT_PALLAS_TRACE", "0")
    ex = Engine(cfg, seed=3, batch_size=4096, accum_method="sort")
    ex.run(total_rays=6000)
    ex.drain_stats()

    assert ek.stats.ray_segments == ex.stats.ray_segments
    np.testing.assert_allclose(
        ek.raw_xyz(0), ex.raw_xyz(0), rtol=1e-4,
        atol=1e-6 * float(np.max(ex.raw_xyz(0))),
    )


def _stochastic_cfg(kind="prism"):
    from ice_halo_sim_tpu.config.loader import load_project

    shape = (
        {"height": {"type": "gauss", "mean": 1.1, "std": 0.15}}
        if kind == "prism"
        else {"upper_h": {"type": "gauss", "mean": 0.3, "std": 0.05},
              "prism_h": 0.9, "lower_h": 0.3}
    )
    return load_project({
        "crystal": [
            {"id": 1, "type": kind, "shape": shape,
             "axis": {"zenith": {"type": "gauss", "mean": 90, "std": 1.2},
                      "azimuth": {"type": "uniform", "mean": 0, "std": 360}}}
        ],
        "filter": [],
        "scene": {
            "light_source": {"type": "sun", "altitude": 25,
                             "spectrum": [{"wavelength": 550, "weight": 1.0},
                                          {"wavelength": 650, "weight": 0.8}]},
            "ray_num": 10000, "max_hits": 5,
            "scattering": [{"prob": 0.0,
                            "entries": [{"crystal": 1, "proportion": 1}]}],
        },
        "render": [{"id": 1,
                    "lens": {"type": "fisheye_equal_area", "fov": 165},
                    "resolution": [128, 64], "view": {"elevation": 90},
                    "visible": "full"}],
    })


@pytest.mark.parametrize("kind", ["prism", "pyramid"])
def test_kernel_blocked_pool_parity(interpret_kernels, monkeypatch, kind):
    """Blocked-pool mode (stochastic K-shape geometry, geom_clock 128):
    the kernel consumes the SAME per-batch pool arrays the XLA path
    samples, so integer stats match exactly and images to float noise.
    Covers both NF=8 prisms and NF=20 pyramids (the r4 miscompile class
    ran through lax loops; the kernel's bounce loop is python-unrolled)."""
    cfg = _stochastic_cfg(kind)
    monkeypatch.setenv("IHT_MIN_EMIT_W", "0")
    monkeypatch.setenv("IHT_SLOT_CAP", "off")

    monkeypatch.setenv("IHT_PALLAS_TRACE", "auto")
    ek = Engine(cfg, seed=11, batch_size=4096, accum_method="sort")
    assert ek.trace_path == "pallas-megakernel", ek._kernel_reason
    assert ek.geom_clock == 128  # auto-bumped from the default
    assert ek._trace_plan.pool_k > 0
    ek.run(n_batches=2)
    ek.drain_stats()

    monkeypatch.setenv("IHT_PALLAS_TRACE", "0")
    ex = Engine(cfg, seed=11, batch_size=4096, accum_method="sort",
                geom_clock=128)
    assert ex.trace_path == "xla"
    ex.run(n_batches=2)
    ex.drain_stats()

    assert ek.stats.ray_segments == ex.stats.ray_segments
    img_k, img_x = ek.raw_xyz(0), ex.raw_xyz(0)
    assert img_x.sum() > 0
    np.testing.assert_allclose(img_k.sum(), img_x.sum(), rtol=1e-5)
    np.testing.assert_allclose(
        img_k, img_x, rtol=1e-4, atol=1e-6 * img_x.max()
    )


def test_kernel_fallback_reasons(interpret_kernels, monkeypatch):
    """Ineligible scenes fall back to the XLA path with a recorded reason."""
    monkeypatch.setenv("IHT_PALLAS_TRACE", "auto")
    # Multi-layer scattering scene -> fallback.
    cfg = load_project_file(f"{CONFIG_DIR}/ms_multi_crystal.json")
    eng = Engine(cfg, seed=3, batch_size=4096, accum_method="sort")
    assert eng.trace_path == "xla"
    assert "layer" in eng._kernel_reason or "setting" in eng._kernel_reason

    # Kill switch.
    monkeypatch.setenv("IHT_PALLAS_TRACE", "0")
    cfg2 = load_project_file(f"{CONFIG_DIR}/bench_light_single_ms.json")
    eng2 = Engine(cfg2, seed=3, batch_size=4096, accum_method="sort")
    assert eng2.trace_path == "xla"
    # And the scene still renders.
    eng2.run(n_batches=1)
    assert np.isfinite(eng2.raw_xyz(0)).all()
