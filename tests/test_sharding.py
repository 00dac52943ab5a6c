"""Sharding tests: the multi-device path must equal per-device independent runs.

Multi-device JAX requires the XLA device-count flag to be set before jaxlib
loads; the session's sitecustomize preloads jax, so these tests run the
sharded path in a subprocess with a scrubbed environment (see conftest)."""

import json
import os
import subprocess
import sys
import textwrap

import pytest

from tests.conftest import clean_jax_env

SCRIPT = textwrap.dedent(
    """
    import os, json
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.test_e2e import SMOKE_CFG
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.parallel.sharding import ShardedEngine, make_mesh

    assert len(jax.devices()) == 8, jax.devices()
    cfg = load_project(SMOKE_CFG)
    B = 4096
    se = ShardedEngine(cfg, make_mesh(), seed=9, per_device_batch=B)
    se.run(n_batches=2)
    xyz_sharded = se.raw_xyz(0)

    # Oracle: one single-device engine consuming the same global index
    # space, PRE-CALIBRATED exactly like the sharded engine's inner engine
    # (same scene/seed/batch => same slot cap / keep / plan, r4).
    e = Engine(cfg, seed=9, batch_size=B)
    e.run(n_batches=1)
    e.reset()
    accum = e.accum
    span = B * (len(e.layers) + 1)
    for counter in range(2):
        for dev in range(8):
            base = (counter * 8 * span + dev * span) & 0xFFFFFFFF
            accum = e._step(accum, np.uint32(base), np.uint32(counter),
                            e._compact_keep, e._plan_version)[0]
    p = e.proj_plans[0]
    xyz_ref = np.asarray(accum[0][:, :3]).reshape(p.height, p.width, 3)

    assert np.allclose(xyz_sharded, xyz_ref, rtol=1e-4, atol=1e-3), (
        float(np.abs(xyz_sharded - xyz_ref).max()))
    assert xyz_sharded.sum() > 0
    print(json.dumps({"ok": True, "total": float(xyz_sharded.sum()),
                      "rays": se.rays_traced}))
    """
)


@pytest.mark.slow
def test_sharded_equals_sequential():
    env = clean_jax_env(8)
    env["IHT_TEST_REEXEC"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, env=env,
        timeout=900, cwd="/root/repo",
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["rays"] == 2 * 8 * 4096


MS_SCRIPT = textwrap.dedent(
    """
    import json
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    import sys
    sys.path.insert(0, "/root/repo")
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.parallel.sharding import ShardedEngine, make_mesh

    assert len(jax.devices()) == 8, jax.devices()

    # Two scattering layers with prob > 0: the continuation buffer
    # (compaction + Feistel-style shuffle + truncation accounting) runs
    # UNDER the mesh — the exact path MULTICHIP_r01 failed on.
    cfg = load_project({
        "crystal": [
            {"id": 1, "type": "prism",
             "shape": {"height": {"type": "gauss", "mean": 1.0, "std": 0.2}},
             "axis": {
                 "zenith": {"type": "gauss", "mean": 90.0, "std": 2.0},
                 "azimuth": {"type": "uniform", "mean": 0.0, "std": 360.0},
                 "roll": {"type": "uniform", "mean": 0.0, "std": 360.0},
             }},
        ],
        "filter": [],
        "scene": {
            "light_source": {
                "type": "sun", "altitude": 25.0, "azimuth": 0.0,
                "diameter": 0.5,
                "spectrum": [{"wavelength": 550.0, "weight": 1.0}],
            },
            "ray_num": 100000,
            "max_hits": 5,
            "scattering": [
                {"prob": 0.7, "entries": [{"crystal": 1, "proportion": 100.0}]},
                {"prob": 0.0, "entries": [{"crystal": 1, "proportion": 100.0}]},
            ],
        },
        "render": [
            {"id": 1,
             "lens": {"type": "fisheye_equal_area", "fov": 150.0},
             "resolution": [128, 64],
             "view": {"elevation": 30.0},
             "visible": "full"},
        ],
    })
    B = 2048
    se = ShardedEngine(cfg, make_mesh(), seed=11, per_device_batch=B)
    se.run(n_batches=2)
    xyz_sharded = se.raw_xyz(0)

    # Oracle: one single-device engine consuming the same global index space
    # (device d's rays = base + d * span — identical RNG streams),
    # pre-calibrated exactly like the sharded engine's inner engine (r4).
    e = Engine(cfg, seed=11, batch_size=B)
    e.run(n_batches=1)
    e.reset()
    accum = e.accum
    span = B * (len(e.layers) + 1)
    for counter in range(2):
        for dev in range(8):
            base = (counter * 8 * span + dev * span) & 0xFFFFFFFF
            accum = e._step(accum, np.uint32(base), np.uint32(counter),
                            e._compact_keep, e._plan_version)[0]
    p = e.proj_plans[0]
    xyz_ref = np.asarray(accum[0][:, :3]).reshape(p.height, p.width, 3)

    assert np.allclose(xyz_sharded, xyz_ref, rtol=1e-4, atol=1e-3), (
        float(np.abs(xyz_sharded - xyz_ref).max()))
    assert xyz_sharded.sum() > 0
    print(json.dumps({"ok": True, "total": float(xyz_sharded.sum()),
                      "rays": se.rays_traced}))
    """
)


@pytest.mark.slow
def test_sharded_multi_scatter_equals_sequential():
    """2-layer prob>0 scene under an 8-device mesh vs the sequential oracle
    (the continuation compaction path MULTICHIP_r01 flagged)."""
    env = clean_jax_env(8)
    env["IHT_TEST_REEXEC"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", MS_SCRIPT], capture_output=True, text=True,
        env=env, timeout=900, cwd="/root/repo",
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["rays"] == 2 * 8 * 2048


SANDWICH_SCRIPT = textwrap.dedent(
    """
    import json
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.test_e2e import SMOKE_CFG
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.core import pallas_ops, pallas_sandwich, pallas_scan
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.parallel.sharding import ShardedEngine, make_mesh

    assert len(jax.devices()) == 8, jax.devices()
    pallas_ops.INTERPRET = True
    pallas_scan.INTERPRET = True
    pallas_sandwich.INTERPRET = True

    cfg = load_project(SMOKE_CFG)
    B = 2048
    # calibrate=False: this test pins the sandwich MECHANISM under
    # shard_map against the scatter oracle; the calibrated-dispatch path
    # (which may legitimately demote to sort) is covered by
    # test_sharded_equals_sequential and __graft_entry__.dryrun_multichip.
    se = ShardedEngine(cfg, make_mesh(), seed=9, per_device_batch=B,
                       accum_method="sort", calibrate=False)
    assert se.engine._sandwich_on, "sandwich did not engage under shard_map"
    se.run(n_batches=2)
    assert se.engine.fold_kind == "sandwich", se.engine.fold_kind
    xyz_sharded = se.raw_xyz(0)

    # Oracle: one single-device SCATTER-fold engine over the same global
    # ray-index space (identical RNG streams; fold architecture differs).
    e = Engine(cfg, seed=9, batch_size=B, accum_method="scatter")
    accum = e.accum
    span = B * (len(e.layers) + 1)
    for counter in range(2):
        for dev in range(8):
            base = (counter * 8 * span + dev * span) & 0xFFFFFFFF
            accum = e._step(accum, np.uint32(base), np.uint32(counter), None, 0)[0]
    p = e.proj_plans[0]
    xyz_ref = np.asarray(accum[0][:, :3]).reshape(p.height, p.width, 3)

    # bf16 value rounding in the sandwich kernel (~0.4%/row, averaging
    # down per pixel) bounds the comparison, not fp32 exactness.
    mass_s, mass_r = float(xyz_sharded.sum()), float(xyz_ref.sum())
    assert mass_r > 0
    assert abs(mass_s - mass_r) / mass_r < 2e-3, (mass_s, mass_r)
    assert np.abs(xyz_sharded - xyz_ref).sum() / np.abs(xyz_ref).sum() < 6e-3
    print(json.dumps({"ok": True, "total": mass_s, "rays": se.rays_traced}))
    """
)


@pytest.mark.slow
def test_sharded_sandwich_equals_scatter_oracle():
    """The PRODUCTION sandwich fold under an 8-device mesh (Pallas
    interpreter) vs the sequential scatter oracle: per-shard tiles sum at
    drain like dense accumulators (round-2 VERDICT missing #3 - one
    backend, same semantics everywhere, trace_backend.hpp:28-33)."""
    env = clean_jax_env(8)
    env["IHT_TEST_REEXEC"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", SANDWICH_SCRIPT], capture_output=True,
        text=True, env=env, timeout=900, cwd="/root/repo",
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["rays"] == 2 * 8 * 2048
