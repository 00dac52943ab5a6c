"""Command-line renderer.

TPU-native counterpart of the reference CLI (/root/reference/src/main.cpp):
load a project JSON, run the simulation, write one PNG per renderer. Progress
prints once per second like the reference's poll loop; `--benchmark` emits a
single [BENCHMARK] JSON line with the steady-state rays/s (the reference's
benchmark discipline, doc/performance-testing.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native ice-halo renderer")
    parser.add_argument("config", help="project JSON file")
    parser.add_argument("-o", "--output", default=".", help="output directory")
    parser.add_argument("--ray-num", type=int, default=None, help="override scene ray_num")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--geom-clock", type=int, default=32)
    parser.add_argument("--benchmark", action="store_true",
                        help="measure steady-state rays/s and print [BENCHMARK] JSON")
    parser.add_argument("--draw-overlays", action="store_true",
                        help="rasterize grid lines / celestial outline onto outputs "
                             "(display-time overlays; the reference draws these only "
                             "in its GUI shader)")
    parser.add_argument("--platform", default=None,
                        help="force a JAX platform (e.g. cpu)")
    args = parser.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ice_halo_sim_tpu.config.loader import load_project_file
    from ice_halo_sim_tpu.engine.simulator import Engine
    from ice_halo_sim_tpu.utils.png import write_png

    cfg = load_project_file(args.config)
    total = args.ray_num if args.ray_num is not None else cfg.scene.ray_num
    if total < 0:
        print("infinite ray_num requires --benchmark or --ray-num", file=sys.stderr)
        if not args.benchmark:
            return 2
        total = None

    batch = args.batch_size
    if batch is None:
        batch = 1 << 17 if jax.devices()[0].platform == "cpu" else 1 << 20
    if total is not None:
        batch = min(batch, max(4096, total))

    t0 = time.time()
    engine = Engine(cfg, seed=args.seed, batch_size=batch, geom_clock=args.geom_clock)

    if args.benchmark:
        # Warm-up pass (compile + cache), then timed steady-state batches.
        engine.run(n_batches=1)
        jax.block_until_ready(engine.accum)
        n_timed = max(1, (total or 20 * batch) // batch)
        t1 = time.time()
        engine.run(n_batches=n_timed)
        jax.block_until_ready(engine.accum)
        dt = time.time() - t1
        rays = n_timed * batch
        res = engine.cfg.renders[0].resolution if engine.cfg.renders else (0, 0)
        print(json.dumps({
            "metric": "rays_per_sec",
            "value": rays / dt,
            "unit": "rays/s",
            "rays": rays,
            "seconds": dt,
            "batch_size": batch,
            "resolution": list(res),
            "platform": jax.devices()[0].platform,
        }))
        return 0

    n_batches = max(1, -(-total // batch))
    done = 0
    last_print = 0.0
    for i in range(n_batches):
        engine.run(n_batches=1)
        done += batch
        now = time.time()
        if now - last_print > 1.0 or i == n_batches - 1:
            print(f"\r{min(done, total)}/{total} rays ({100.0 * min(done, total) / total:.1f}%)",
                  end="", flush=True)
            last_print = now
    jax.block_until_ready(engine.accum)
    print(f"\nsimulated {n_batches * batch} rays in {time.time() - t0:.1f}s")

    os.makedirs(args.output, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.config))[0]
    for r, (img, rcfg) in enumerate(zip(engine.snapshot(), cfg.renders)):
        if args.draw_overlays:
            from ice_halo_sim_tpu.engine.overlay import draw_overlays_u8

            img = draw_overlays_u8(
                img, rcfg, engine.proj_plans[r],
                cfg.light.sun.azimuth, cfg.light.sun.altitude,
            )
        out_path = os.path.join(args.output, f"{stem}_render{rcfg.id}.png")
        write_png(out_path, img)
        print("wrote", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
