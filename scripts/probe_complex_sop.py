#!/usr/bin/env python
"""Decompose complex_sop step cost by ablating scene features.

Times the calibrated multi-step dispatch for the ms_multi_crystal_complex_filter
scene and variants (no filter / no continuation / no overlap / small res) to
locate the dominant cost. Usage: python scripts/probe_complex_sop.py
"""

import copy
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def time_engine(cfg_dict, label, batch=1 << 18, res=(2048, 1024), reps=3):
    from ice_halo_sim_tpu.config.loader import load_project
    from ice_halo_sim_tpu.engine.simulator import Engine

    d = copy.deepcopy(cfg_dict)
    for r in d["render"]:
        r["resolution"] = list(res)
    import jax

    cfg = load_project(d)
    eng = Engine(cfg, seed=1, batch_size=batch)
    # Warm up + calibrate (first dispatch measures live counts).
    eng.run(n_batches=eng.steps_per_dispatch * 2)
    jax.block_until_ready(eng.accum)
    n = eng.steps_per_dispatch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        eng.run(n_batches=n)
        jax.block_until_ready(eng.accum)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    rays = n * eng.batch_size
    print(json.dumps({
        "variant": label,
        "batch": eng.batch_size,
        "res": list(res),
        "sec_per_dispatch": round(dt, 4),
        "rays_per_sec": round(rays / dt),
    }), flush=True)
    del eng
    return rays / dt


def main():
    with open("/root/reference/test/e2e/configs/ms_multi_crystal_complex_filter.json") as f:
        base = json.load(f)

    time_engine(base, "full")

    v = copy.deepcopy(base)
    for layer in v["scene"]["scattering"]:
        for e in layer["entries"]:
            e.pop("filter", None)
    time_engine(v, "no_filter")

    v = copy.deepcopy(base)
    v["scene"]["scattering"][0]["prob"] = 0.0
    v["scene"]["scattering"] = v["scene"]["scattering"][:1]
    time_engine(v, "single_layer")

    v = copy.deepcopy(base)
    v["render"][0]["overlap"] = 0.0
    time_engine(v, "no_overlap")

    v = copy.deepcopy(base)
    v["render"][0]["lens"]["type"] = "rectangular"
    v["render"][0].pop("overlap", None)
    time_engine(v, "rect_lens")

    time_engine(base, "full_512", res=(512, 256))


if __name__ == "__main__":
    main()
