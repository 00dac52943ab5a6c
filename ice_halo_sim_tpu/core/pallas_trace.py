"""Pallas TPU trace megakernel: sample -> trace -> project -> emit-pack.

The TPU-native equivalent of the reference's fused device megakernel
(/root/reference/src/core/backend/cuda_trace_backend.cu:603-1219: one thread
per ray fusing root generation, the bounce loop, the probability gate,
projection and accumulation in ONE kernel, zero intermediate global-memory
round trips). Here one Pallas program per ray-block runs:

  per-ray RNG (the shared counter-PCG streams from core/rng — reused
  VERBATIM, so streams are bit-identical to the XLA trace path)
  -> wavelength draw + SPD weight -> sun-cap direction -> orientation
  rotation (core/sampling.sample_rot_row, shared) -> entry-face sampling
  over the STATIC fan-triangle table -> entry Fresnel -> unrolled bounce
  loop over the STATIC face planes (slab min-t, Fresnel split, TIR)
  -> per-exit probability gate + Russian-roulette emit floor
  -> lens projection (core/projection.project_components, shared)
  -> spectral sort-key pack (core/accum.pack_spectral_keys, shared)
  -> in-block butterfly valid-pack (pallas_ops._pack_one_block, shared)

and writes BLOCK-PACKED contribution rows (key, w) + per-block live counts
+ partial stats. The XLA side then runs one forward-overwrite block scatter
(pallas_ops.scatter_blocks) and feeds the existing sort fold — replacing
the XLA trace program's sampling + bounce scan + slot compaction +
projection + key pack + compact_valid prepass (~8.5 ms of the 16.8 ms
round-4 step at B = 512k) with one fused pass.

Scope (v1, checked by build_plan; ineligible scenes fall back to the XLA
trace path automatically, same program semantics):
  - single scattering layer, single crystal setting;
  - deterministic crystal shape (K == 1): the geometry and entry-triangle
    tables are STATIC python constants baked into the kernel;
  - no ray-path filters, no raypath-color classes;
  - lens types without inverse-trig forward math (Mosaic has no
    asin/acos/atan lowering): linear, (dual-)fisheye equal-area /
    orthographic, globe;
  - sort-fold accumulation with packable spectral keys.

Differences from the XLA path, by design:
  - the emit floor's threshold uses the ANALYTIC mean initial weight
    (mean of the SPD pool) instead of the per-batch sample mean — a
    deterministic constant; with the default unbiased rr floor the
    expected image is identical either way;
  - no per-ray exit-slot cap: the in-kernel pack keeps every live row, so
    the calibrated-cap mass trimming (and its dropped-mass accounting)
    does not exist on this path.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ice_halo_sim_tpu.config.schema import LensType
from ice_halo_sim_tpu.core import accum as accum_mod
from ice_halo_sim_tpu.core import optics, pallas_ops, projection, rng, sampling
from ice_halo_sim_tpu.core import trace_soa

LANES = 128

# Test hook, mirrors pallas_ops.INTERPRET.
INTERPRET = False

# Lens forward projections free of inverse trig (Mosaic lowering limit).
SUPPORTED_LENSES = frozenset(
    int(t)
    for t in (
        LensType.LINEAR,
        LensType.FISHEYE_EQUAL_AREA,
        LensType.FISHEYE_ORTHOGRAPHIC,
        LensType.DUAL_FISHEYE_EQUAL_AREA,
        LensType.DUAL_FISHEYE_ORTHOGRAPHIC,
        LensType.GLOBE,
    )
)


def available() -> bool:
    from ice_halo_sim_tpu.utils import env_knobs

    if str(env_knobs.get("IHT_PALLAS", "1")).lower() in ("0", "off"):
        return False
    if str(env_knobs.get("IHT_PALLAS_TRACE", "auto")).lower() in ("0", "off"):
        return False
    return INTERPRET or jax.default_backend() in ("tpu", "axon")


class TracePlan(NamedTuple):
    """Static (host-side) kernel plan. Everything here is baked into the
    compiled kernel as constants; the kernel's only runtime inputs are
    (batch_base_lo, batch_base_hi, n_active)."""

    batch: int
    nr: int                  # rays per kernel block
    h: int                   # max_hits
    k_pool: int
    seed: int
    prob: float              # final-layer probability gate (drop semantics)
    wl_mode: str             # "illuminant" | "discrete"
    spd: tuple               # illuminant: K pool SPD weights
    wl_weights: tuple        # discrete: per-entry weights
    wl_values: tuple         # discrete: per-entry wavelengths (nm)
    n_wl: int
    sun_az: float
    sun_alt: float
    sun_diam: float
    axis_params: object      # sampling.AxisParams (host numpy)
    planes: tuple            # static mode: per present face (slot, nx, ny, nz, d)
    tris: tuple              # static mode: per live tri (ch*, v0*, e1*, e2*, face_slot)
    emit_frac: float
    emit_mode: str
    w_scale: float           # analytic mean initial weight
    renders: tuple           # projection.ProjPlan per render (static)
    rows_block: tuple        # per render: padded slab rows (pow2 multiple of 128)
    # Blocked-pool mode (stochastic K-shape geometry, r5 v2): the pool is
    # sampled per batch on the XLA side (identical arrays to the XLA trace
    # path) and fed to the kernel as [K, NF*5] / [K, T*13] tables; with
    # geom_clock == 128 each 128-lane sublane row shares ONE shape, so
    # every per-face/per-tri read is a [R, 1] -> [R, 128] lane broadcast.
    pool_k: int = 0          # 0 = static baked geometry; else pool rows
    nf: int = 0              # faces per shape (blocked mode)
    n_tris: int = 0          # entry fan triangles per shape (blocked mode)
    gc: int = 0              # geom clock (blocked mode; must be 128)


def build_plan(engine) -> Optional[TracePlan]:
    """Inspect an Engine and return a TracePlan if the scene qualifies for
    the fused kernel, else None (with the reason recorded on the engine)."""
    reason = None
    cfg = engine.cfg
    if not available():
        reason = "pallas trace kernel disabled/unavailable on this backend"
    elif engine._resolved_accum_method() != "sort" or not engine.spectral_ok:
        reason = "needs the sort fold with packable spectral keys"
    elif len(engine.layers) != 1:
        reason = "multi-layer scattering (continuation emit not in kernel v1)"
    elif engine.layers[0].n_settings != 1:
        reason = "multiple crystal settings per layer"
    elif (
        not engine.layers[0].deterministic_shape[0]
        and engine.geom_clock != 128
    ):
        reason = ("stochastic crystal shape needs geom_clock == 128 "
                  "(one shape per 128-lane row; engine auto-bumps the "
                  "default, a pinned IHT_GEOM_CLOCK is respected)")
    elif engine.layers[0].filter_plans[0] is not None:
        reason = "ray-path filter attached"
    elif engine.color_classes:
        reason = "raypath-color classes need the mask column"
    elif any(int(p.lens_type) not in SUPPORTED_LENSES for p in engine.proj_plans):
        reason = "lens type needs inverse trig (no Mosaic lowering)"
    elif engine.wl_mode == "discrete" and (
        engine.wl_table.shape[0] & (engine.wl_table.shape[0] - 1)
    ):
        reason = "discrete spectrum size not a power of two (lane % n_wl)"
    elif len(engine.proj_plans) > 4:
        reason = "more than 4 renderers (kernel VMEM slab budget)"
    if reason is None:
        nr = min(2048, engine.batch_size)
        if engine.batch_size % nr:
            reason = f"batch size {engine.batch_size} not a multiple of {nr}"
    if reason is not None:
        engine._kernel_reason = reason
        return None

    plan0 = engine.layers[0]
    planes = ()
    tris = ()
    pool_k = nf = n_tris = gc = 0
    if plan0.deterministic_shape[0]:
        # Deterministic K==1 geometry: sample the pool once (NO_RANDOM
        # draws ignore the seed/counter — THE geometry for every batch)
        # and bake it as python constants.
        pool = engine._sample_layer_pool(0, plan0, jnp.uint32(0))
        plane_n = np.asarray(pool.plane_n[0], np.float32)    # [NF, 3]
        plane_d = np.asarray(pool.plane_d[0], np.float32)
        present = np.asarray(pool.face_present[0])
        planes = tuple(
            (int(f), float(plane_n[f, 0]), float(plane_n[f, 1]),
             float(plane_n[f, 2]), float(plane_d[f]))
            for f in range(plane_n.shape[0])
            if present[f]
        )
        ch = np.asarray(pool.tri_cross_half[0], np.float32)  # [T, 3]
        v0 = np.asarray(pool.tri_v0[0], np.float32)
        e1 = np.asarray(pool.tri_e1[0], np.float32)
        e2 = np.asarray(pool.tri_e2[0], np.float32)
        tf = np.asarray(pool.tri_face[0], np.int32)
        live = np.abs(ch).sum(axis=1) > 0
        tris = tuple(
            tuple(float(x) for x in (*ch[t], *v0[t], *e1[t], *e2[t]))
            + (int(tf[t]),)
            for t in range(ch.shape[0])
            if live[t]
        )
        if not tris or not planes:
            engine._kernel_reason = "degenerate geometry (no live entry faces)"
            return None
    else:
        # Blocked-pool mode: the per-batch pool arrays are kernel inputs.
        pool_k = plan0.k_per_setting[0]
        gc = engine.geom_clock
        from ice_halo_sim_tpu.core import geometry as geom_mod

        nf = (geom_mod.PYRAMID_FACES
              if engine.any_pyramid else geom_mod.PRISM_FACES)
        n_tris = nf * 4   # build_entry_tris: T = NF * (6 - 2)

    if engine.wl_mode == "illuminant":
        from ice_halo_sim_tpu.core import color

        pool_idx = jnp.arange(engine.k_pool, dtype=jnp.uint32)
        wl_grid = engine._wl_from_idx(pool_idx, jnp.uint32(0))
        spd = tuple(
            float(x)
            for x in np.asarray(
                color.illuminant_spd_fast(engine.illuminant, wl_grid)
            )
        )
        wl_weights = ()
        wl_values = ()
        n_wl = 0
        w_scale = float(np.mean(spd))
    else:
        spd = ()
        wl_weights = tuple(float(x) for x in np.asarray(engine.wl_weights))
        wl_values = tuple(float(x) for x in np.asarray(engine.wl_table))
        n_wl = int(engine.wl_table.shape[0])
        w_scale = float(np.mean(wl_weights))

    sun = cfg.light.sun
    H = engine.max_hits
    rows_block = []
    for pp in engine.proj_plans:
        passes = 2 if pp.max_abs_dz > 0.0 else 1
        r0 = H * passes * nr
        rows_block.append(max(1024, 1 << (r0 - 1).bit_length()))

    return TracePlan(
        batch=engine.batch_size,
        nr=nr,
        h=H,
        k_pool=engine.k_pool,
        seed=engine.seed,
        prob=float(plan0.prob),
        wl_mode=engine.wl_mode,
        spd=spd,
        wl_weights=wl_weights,
        wl_values=wl_values,
        n_wl=n_wl,
        sun_az=float(sun.azimuth),
        sun_alt=float(sun.altitude),
        sun_diam=float(sun.diameter),
        axis_params=plan0.axis_params,
        planes=planes,
        tris=tris,
        emit_frac=float(engine.min_emit_frac),
        emit_mode=str(engine.emit_floor_mode),
        w_scale=w_scale,
        renders=tuple(engine.proj_plans),
        rows_block=tuple(rows_block),
        pool_k=pool_k,
        nf=nf,
        n_tris=n_tris,
        gc=gc,
    )


def _sel_const(sel, pairs, dtype=jnp.float32):
    """Select-by-index from a static constant list: pairs = [(idx, value)].
    Ascending last-write select chain; sel int32 array."""
    out = jnp.zeros(sel.shape, dtype)
    for i, v in pairs:
        out = jnp.where(sel == i, dtype(v), out)
    return out


def _sel_many(sel, idx_list, value_lists, dtypes=None):
    """Select SEVERAL constant tables by one index array, computing each
    one-hot mask once (the per-table _sel_const chain re-derives the same
    compares; at 20+ tables x 20 rows that is ~half the entry-sampling
    ops). idx_list: static indices; value_lists: per-output list of values
    aligned with idx_list."""
    n_out = len(value_lists)
    dtypes = dtypes or [jnp.float32] * n_out
    outs = [jnp.zeros(sel.shape, dt) for dt in dtypes]
    for j, i in enumerate(idx_list):
        m = sel == i
        for o in range(n_out):
            outs[o] = jnp.where(m, dtypes[o](value_lists[o][j]), outs[o])
    return outs


def make_trace_emit(plan: TracePlan):
    """Compile the kernel; returns run(base_lo, base_hi, n_active) ->
    (per_render, landed [R], dropped, segs) where per_render[r] =
    (keys [G, rows_block], w [G, rows_block], counts [G])."""
    NR, H, B = plan.nr, plan.h, plan.batch
    G = B // NR
    R = NR // LANES
    K = plan.k_pool
    n_renders = len(plan.renders)
    seed0_c = np.uint32(plan.seed)
    layer_nonce = np.uint32(0xA5A5)  # layer 0 nonce (0xA5A5 * (li+1))
    f32 = jnp.float32
    i32 = jnp.int32
    u32 = jnp.uint32
    Rb = [rb // LANES for rb in plan.rows_block]
    nbits = [int(math.log2(rb)) for rb in plan.rows_block]

    blocked = plan.pool_k > 0

    def kernel(sref, *refs):
        # refs: [ptbl_ref, ttbl_ref,] then per render (key, w, cnt), stats.
        if blocked:
            ptbl_ref, ttbl_ref = refs[0], refs[1]
            out_refs = refs[2:]
        else:
            out_refs = refs
        g = pl.program_id(0)
        stats_ref = out_refs[3 * n_renders]

        flat = (
            jax.lax.broadcasted_iota(i32, (R, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(i32, (R, LANES), 1)
        )
        lane_global = g * NR + flat                       # i32, < 2^31
        base_lo_i = jnp.full((R, LANES), sref[0], i32)
        ray_idx = pltpu.bitcast(base_lo_i + lane_global, u32)
        base_lo = pltpu.bitcast(base_lo_i, u32)
        base_hi = pltpu.bitcast(jnp.full((R, LANES), sref[1], i32), u32)

        # 64-bit epoch seed mix (rng.epoch_seed, vector form).
        carry = (ray_idx < base_lo).astype(u32)
        hi = base_hi + carry
        seed0 = jnp.full((R, LANES), seed0_c, u32)
        seed_vec = jnp.where(hi == 0, seed0, seed0 ^ rng.pcg_hash(hi))

        # Wavelength draw (engine._wavelength_draw semantics).
        if plan.wl_mode == "illuminant":
            wseed = seed_vec ^ rng.NONCE_WL ^ u32(0x6A09E667)
            uwl = rng.uniform(wseed, ray_idx, 0)
            wl = 380.0 + uwl * 400.0
            wl_idx = jnp.minimum(
                (uwl * K).astype(i32), i32(K - 1)
            )
            w0 = _sel_const(wl_idx, list(enumerate(plan.spd)))
        else:
            # XLA path: wl_idx = global ray index mod n_wl (power of two
            # checked by build_plan, so the mod is a mask).
            wl_idx = pltpu.bitcast(
                ray_idx & u32(plan.n_wl - 1), i32
            )
            wl = _sel_const(wl_idx, list(enumerate(plan.wl_values)))
            w0 = _sel_const(wl_idx, list(enumerate(plan.wl_weights)))
        n_ior = optics.ice_refractive_index(wl)
        wl_idx_u = pltpu.bitcast(wl_idx, u32)

        n_active = jnp.full((R, LANES), sref[2], i32)
        w0 = jnp.where(lane_global < n_active, w0, 0.0)

        wx, wy, wz = sampling.sample_sun_dirs_soa(
            seed_vec ^ rng.NONCE_SUN, ray_idx,
            plan.sun_az, plan.sun_alt, plan.sun_diam,
        )

        layer_seed = seed_vec ^ layer_nonce
        rot = sampling.sample_rot_row(
            layer_seed ^ rng.NONCE_ORIENT, ray_idx, plan.axis_params, 0,
            lut_loop=True,
        )
        dx, dy, dz = trace_soa.rot_apply_inv(rot, wx, wy, wz)

        # ---- geometry accessors: static python constants or per-row
        # broadcasts from the blocked pool tables (one shape per 128-lane
        # sublane row; geom_clock == 128 makes shape index == row index).
        if blocked:
            ptbl = ptbl_ref[...]             # [R, NF*5]
            ttbl = ttbl_ref[...]             # [R, T*13]

            def _bc(tbl, c):
                return jnp.broadcast_to(tbl[:, c:c + 1], (R, LANES))

            face_ids = list(range(plan.nf))
            fgeo = {
                f: (_bc(ptbl, 5 * f), _bc(ptbl, 5 * f + 1),
                    _bc(ptbl, 5 * f + 2), _bc(ptbl, 5 * f + 3),
                    _bc(ptbl, 5 * f + 4) > 0.5)
                for f in face_ids
            }
            n_tris = plan.n_tris

            def tri_val(t, c):
                return _bc(ttbl, 13 * t + c)
        else:
            face_ids = [pp[0] for pp in plan.planes]
            fgeo = {
                pp[0]: (pp[1], pp[2], pp[3], pp[4], None)
                for pp in plan.planes
            }
            n_tris = len(plan.tris)

            def tri_val(t, c):
                return plan.tris[t][c]

        # ---- entry-face sampling over the fan-triangle table ----
        entry_seed = layer_seed ^ rng.NONCE_ENTRY
        ws = []
        total = jnp.zeros((R, LANES), f32)
        for t in range(n_tris):
            chx, chy, chz = tri_val(t, 0), tri_val(t, 1), tri_val(t, 2)
            wt = jnp.maximum(-(chx * dx + chy * dy + chz * dz), 0.0)
            ws.append(wt)
            total = total + wt
        entry_ok = total > 0.0
        target = rng.uniform(entry_seed, ray_idx, 10) * total
        cdf = jnp.zeros((R, LANES), f32)
        sel = jnp.zeros((R, LANES), i32)
        for wt in ws:
            cdf = cdf + wt
            sel = sel + (cdf <= target).astype(i32)
        sel = jnp.clip(sel, 0, n_tris - 1)

        u = rng.uniform(entry_seed, ray_idx, 11)
        v = rng.uniform(entry_seed, ray_idx, 12)
        over = u + v > 1.0
        u = jnp.where(over, 1.0 - u, u)
        v = jnp.where(over, 1.0 - v, v)

        # One-hot picks of the selected triangle's 10 values (masks shared
        # across tables; values are python floats or [R,1]-broadcast rows).
        picks = [jnp.zeros((R, LANES), f32) for _ in range(10)]
        for t in range(n_tris):
            m = sel == t
            for o, c in enumerate((3, 4, 5, 6, 7, 8, 9, 10, 11, 12)):
                picks[o] = jnp.where(m, tri_val(t, c) * jnp.ones((), f32),
                                     picks[o])
        px = picks[0] + u * picks[3] + v * picks[6]
        py = picks[1] + u * picks[4] + v * picks[7]
        pz = picks[2] + u * picks[5] + v * picks[8]
        f0 = (picks[9] + 0.5).astype(i32)

        w = jnp.where(entry_ok, w0, 0.0)

        # Entry normal + entry Fresnel (air -> ice).
        n0x = jnp.zeros((R, LANES), f32)
        n0y = jnp.zeros((R, LANES), f32)
        n0z = jnp.zeros((R, LANES), f32)
        for f in face_ids:
            nx, ny, nz, _d, _pres = fgeo[f]
            m = f0 == f
            n0x = jnp.where(m, nx * jnp.ones((), f32), n0x)
            n0y = jnp.where(m, ny * jnp.ones((), f32), n0y)
            n0z = jnp.where(m, nz * jnp.ones((), f32), n0z)
        (rx, ry, rz), (tx, ty, tz), w_r, w_t, _ = trace_soa._fresnel_split_soa(
            dx, dy, dz, n0x, n0y, n0z, w, n_ior
        )
        e0x, e0y, e0z = trace_soa.rot_apply(rot, rx, ry, rz)
        exit0_w = jnp.where(entry_ok, w_r, 0.0)

        # Incremental plane distances of the entry point.
        dists = {
            f: px * fgeo[f][0] + py * fgeo[f][1] + pz * fgeo[f][2]
            + fgeo[f][3]
            for f in face_ids
        }

        # ---- emit machinery ----
        slabs = [[] for _ in range(n_renders)]  # list of (key, w) per render
        landed = [jnp.float32(0.0)] * n_renders
        dropped = jnp.float32(0.0)
        segs = jnp.zeros((R, LANES), i32)
        gate_seed = layer_seed ^ rng.NONCE_GATE
        rr_seed = layer_seed ^ rng.NONCE_EMIT

        def emit_slot(h_slot, ex, ey, ez, w_raw):
            nonlocal dropped, landed, segs
            segs = jnp.where(w_raw > 0.0, i32(h_slot + 1), segs)
            if plan.prob > 0.0:
                ug = rng.uniform(gate_seed, ray_idx, 100 + h_slot)
                acc_w = jnp.where(ug >= f32(plan.prob), w_raw, 0.0)
            else:
                acc_w = w_raw
            if plan.emit_frac > 0.0:
                cut = f32(plan.emit_frac * plan.w_scale)
                tiny = (acc_w > 0.0) & (acc_w < cut)
                if plan.emit_mode == "rr":
                    urr = rng.uniform(rr_seed, ray_idx, h_slot)
                    new_w = jnp.where(
                        tiny, jnp.where(urr * cut < acc_w, cut, 0.0), acc_w
                    )
                else:
                    new_w = jnp.where(tiny, 0.0, acc_w)
                dropped = dropped + jnp.sum(acc_w) - jnp.sum(new_w)
                acc_w = new_w
            for r, pp in enumerate(plan.renders):
                P = pp.height * pp.width
                hits = projection.project_components(pp, ex, ey, ez)
                main_ok = (hits.main >= 0) & (acc_w > 0.0)
                pix = jnp.where(main_ok, hits.main, -1)
                w_row = jnp.where(main_ok, acc_w, 0.0)
                key, wz_row = accum_mod.pack_spectral_keys(
                    pix, w_row, wl_idx_u, P, K
                )
                landed[r] = landed[r] + jnp.sum(wz_row)
                slabs[r].append((key, wz_row))
                if pp.max_abs_dz > 0.0:
                    ov_ok = (hits.overlap >= 0) & (acc_w > 0.0)
                    ov_pix = jnp.where(ov_ok, hits.overlap, -1)
                    kov, wov = accum_mod.pack_spectral_keys(
                        ov_pix, jnp.where(ov_ok, acc_w, 0.0), wl_idx_u, P, K
                    )
                    slabs[r].append((kov, wov))

        emit_slot(0, e0x, e0y, e0z, exit0_w)

        # ---- unrolled bounce loop over the static face planes ----
        cx, cy, cz, cw = tx, ty, tz, w_t
        prev_f = f0
        for h_slot in range(1, H):
            t_best = jnp.full((R, LANES), 1e30, f32)
            fi = jnp.zeros((R, LANES), i32)
            denoms = {}
            for f in face_ids:
                nx, ny, nz, _d, pres = fgeo[f]
                denom = cx * nx + cy * ny + cz * nz
                denoms[f] = denom
                t_f = -dists[f] / jnp.where(
                    jnp.abs(denom) > 1e-30, denom, 1e-30
                )
                cand = (denom > optics.SLAB_EPS) & (prev_f != f)
                if pres is not None:
                    cand = cand & pres
                t_m = jnp.where(cand, t_f, 1e30)
                upd = t_m < t_best
                fi = jnp.where(upd, i32(f), fi)
                t_best = jnp.where(upd, t_m, t_best)
            found = (t_best < 5e29) & (t_best > -optics.SLAB_EPS)
            alive = found & (cw > 0.0)

            nfx = jnp.zeros((R, LANES), f32)
            nfy = jnp.zeros((R, LANES), f32)
            nfz = jnp.zeros((R, LANES), f32)
            for f in face_ids:
                nx, ny, nz, _d, _pres = fgeo[f]
                m = fi == f
                nfx = jnp.where(m, nx * jnp.ones((), f32), nfx)
                nfy = jnp.where(m, ny * jnp.ones((), f32), nfy)
                nfz = jnp.where(m, nz * jnp.ones((), f32), nfz)
            for f in face_ids:
                dists[f] = jnp.where(
                    alive, dists[f] + t_best * denoms[f], dists[f]
                )
            (rx, ry, rz), (tx2, ty2, tz2), w_r, w_t2, is_tir = (
                trace_soa._fresnel_split_soa(
                    cx, cy, cz, nfx, nfy, nfz, cw, n_ior
                )
            )
            cos_exit = tx2 * nfx + ty2 * nfy + tz2 * nfz
            emit_ok = alive & (~is_tir) & (cos_exit > 0.0)
            emit_w = jnp.where(emit_ok, w_t2, 0.0)
            ex, ey, ez = trace_soa.rot_apply(rot, tx2, ty2, tz2)
            emit_slot(h_slot, ex, ey, ez, emit_w)

            cx = jnp.where(alive, rx, cx)
            cy = jnp.where(alive, ry, cy)
            cz = jnp.where(alive, rz, cz)
            cw = jnp.where(alive, w_r, 0.0)
            prev_f = jnp.where(alive, fi, prev_f)

        # ---- per-render slab pack + outputs ----
        for r in range(n_renders):
            key_parts = [k.reshape(R, LANES) for (k, _w) in slabs[r]]
            w_parts = [w_.reshape(R, LANES) for (_k, w_) in slabs[r]]
            pad_rows = Rb[r] - R * len(key_parts)
            if pad_rows:
                key_parts.append(
                    jnp.full((pad_rows, LANES), 0xFFFFFFFF, u32)
                )
                w_parts.append(jnp.zeros((pad_rows, LANES), f32))
            key2 = jnp.concatenate(key_parts, axis=0)
            w2 = jnp.concatenate(w_parts, axis=0)
            pk, pcols, tot = pallas_ops._pack_one_block(
                key2, [w2], 0xFFFFFFFF, Rb[r], nbits[r]
            )
            out_refs[3 * r][...] = pk
            out_refs[3 * r + 1][...] = pcols[0]
            out_refs[3 * r + 2][...] = jnp.full((8, LANES), tot, i32)

        segs_tot = jnp.sum(segs).astype(f32)
        lane1 = jax.lax.broadcasted_iota(i32, (8, LANES), 1)
        stats = jnp.where(lane1 == 0, dropped, 0.0)
        stats = stats + jnp.where(lane1 == 1, segs_tot, 0.0)
        for r in range(n_renders):
            stats = stats + jnp.where(lane1 == 2 + r, landed[r], 0.0)
        stats_ref[...] = stats

    out_specs = []
    out_shape = []
    for r in range(n_renders):
        spec = pl.BlockSpec((Rb[r], LANES), lambda g, s: (g, 0),
                            memory_space=pltpu.VMEM)
        cnt_spec = pl.BlockSpec((8, LANES), lambda g, s: (g, 0),
                                memory_space=pltpu.VMEM)
        out_specs += [spec, spec, cnt_spec]
        out_shape += [
            jax.ShapeDtypeStruct((G * Rb[r], LANES), jnp.uint32),
            jax.ShapeDtypeStruct((G * Rb[r], LANES), jnp.float32),
            jax.ShapeDtypeStruct((G * 8, LANES), jnp.int32),
        ]
    out_specs.append(
        pl.BlockSpec((8, LANES), lambda g, s: (g, 0), memory_space=pltpu.VMEM)
    )
    out_shape.append(jax.ShapeDtypeStruct((G * 8, LANES), jnp.float32))

    in_specs = []
    if blocked:
        in_specs = [
            pl.BlockSpec((R, plan.nf * 5), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, plan.n_tris * 13), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=INTERPRET,
    )

    def run(base_lo, base_hi, n_active, ptbl=None, ttbl=None):
        sc = jnp.stack(
            [
                jax.lax.bitcast_convert_type(
                    jnp.asarray(base_lo, jnp.uint32), jnp.int32
                ),
                jax.lax.bitcast_convert_type(
                    jnp.asarray(base_hi, jnp.uint32), jnp.int32
                ),
                jnp.asarray(n_active, jnp.uint32).astype(jnp.int32),
            ]
        )
        outs = call(sc, ptbl, ttbl) if blocked else call(sc)
        per_render = []
        for r in range(n_renders):
            keys = outs[3 * r].reshape(G, Rb[r] * LANES)
            wvals = outs[3 * r + 1].reshape(G, Rb[r] * LANES)
            counts = outs[3 * r + 2].reshape(G, 8, LANES)[:, 0, 0]
            per_render.append((keys, wvals, counts))
        stats = outs[-1].reshape(G, 8, LANES)[:, 0, :]
        dropped = jnp.sum(stats[:, 0])
        segs = jnp.sum(stats[:, 1]).astype(jnp.uint32)
        landed = jnp.stack(
            [jnp.sum(stats[:, 2 + r]) for r in range(n_renders)]
        )
        return per_render, landed, dropped, segs

    return run
