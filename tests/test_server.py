"""Server layer tests: commit/reuse protocol, lifecycle, result frames.

Mirrors the reference server contracts (src/server/server.cpp):
value-equal commit reuses accumulation, appearance-only render change
re-tone-maps without re-simulating, layout change resets and bumps the
generation, ray budget drains to IDLE, infinite budget runs until stopped.
"""

import dataclasses
import time

import numpy as np
import pytest

from ice_halo_sim_tpu.config.loader import load_project
from ice_halo_sim_tpu.engine.server import ResultFrame, Server, SimState

CFG = {
    "crystal": [
        {
            "id": 1,
            "type": "prism",
            "shape": {"height": 1.0},
            "axis": {
                "zenith": {"type": "uniform", "mean": 90, "std": 360},
                "azimuth": {"type": "uniform", "mean": 0, "std": 360},
            },
        }
    ],
    "filter": [],
    "scene": {
        "light_source": {
            "type": "sun",
            "altitude": 25,
            "spectrum": [{"wavelength": 550, "weight": 1.0}],
        },
        "ray_num": 65536,
        "max_hits": 6,
        "scattering": [{"prob": 0.0, "entries": [{"crystal": 1, "proportion": 1}]}],
    },
    "render": [
        {
            "id": 1,
            "lens": {"type": "fisheye_equal_area", "fov": 120},
            "resolution": [64, 64],
            "view": {"elevation": 25},
        }
    ],
}


@pytest.fixture(scope="module")
def server():
    with Server(seed=9, batch_size=1 << 14) as s:
        yield s


def test_commit_runs_to_idle(server):
    reused = server.commit(CFG)
    assert reused is False
    assert server.wait_idle(timeout=120)
    assert server.state() == SimState.IDLE
    frame = server.acquire_frame()
    assert isinstance(frame, ResultFrame)
    assert frame.is_idle
    assert frame.ray_count >= CFG["scene"]["ray_num"]
    assert frame.images[0].shape == (64, 64, 3)
    assert frame.raw_xyz[0].shape == (64, 64, 3)
    assert float(frame.raw_xyz[0].sum()) > 0


def test_identical_commit_reuses(server):
    server.commit(CFG)
    server.wait_idle(timeout=120)
    gen = server.generation()
    count = server.sim_ray_count()
    assert server.commit(CFG) is True
    assert server.generation() == gen
    assert server.sim_ray_count() == count  # accumulation preserved


def test_appearance_only_commit_keeps_accumulation(server):
    server.commit(CFG)
    server.wait_idle(timeout=120)
    before = server.acquire_frame()
    cfg2 = {**CFG, "render": [dict(CFG["render"][0], background=[0.3, 0.0, 0.0])]}
    assert server.commit(cfg2) is True
    after = server.acquire_frame()
    np.testing.assert_array_equal(before.raw_xyz[0], after.raw_xyz[0])
    assert not np.array_equal(before.images[0], after.images[0])  # re-tone-mapped


def test_layout_change_resets(server):
    server.commit(CFG)
    server.wait_idle(timeout=120)
    gen = server.generation()
    cfg2 = {**CFG, "render": [dict(CFG["render"][0], resolution=[32, 32])]}
    assert server.commit(cfg2) is False
    assert server.generation() == gen + 1
    server.wait_idle(timeout=120)
    frame = server.acquire_frame()
    assert frame.images[0].shape == (32, 32, 3)
    assert frame.generation == gen + 1


def test_infinite_budget_runs_until_stopped(server):
    cfg = {**CFG, "scene": {**CFG["scene"], "ray_num": -1}}
    server.commit(cfg)
    deadline = time.time() + 60
    first = server.sim_ray_count()
    while server.sim_ray_count() <= first and time.time() < deadline:
        time.sleep(0.1)
    assert server.sim_ray_count() > first
    assert server.state() == SimState.RUNNING
    server.stop()
    assert server.wait_idle(timeout=60)
    assert server.state() == SimState.IDLE
    # Results remain readable after stop.
    assert server.acquire_frame().ray_count > 0


def test_typed_config_commit(server):
    cfg = load_project(CFG)
    server.commit(dataclasses.replace(cfg))
    server.wait_idle(timeout=120)
    assert server.acquire_frame().ray_count >= cfg.scene.ray_num
