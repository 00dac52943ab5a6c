"""Closed-form hexagonal crystal geometry as differentiable JAX functions.

The reference represents crystals as a flat POD of plane equations +
face-present mask + parametric face numbers + per-face CCW polygons
(/root/reference/src/core/crystal.hpp:67-104, built by the closed-form
evaluators in geo3d_closedform.cpp). We keep exactly that representation as
fixed-shape arrays — it is what a fixed-shape vectorized tracer needs, and
being a pure function of the shape scalars it makes the rendered image
differentiable w.r.t. crystal geometry.

Conventions (mirroring geo3d_closedform.cpp):
  - Six fixed horizontal face directions theta_i = i*60 deg.
  - Side plane i: x cos(theta_i) + y sin(theta_i) <= r_i with
    r_i = (sqrt(3)/4) * dist_i  (plane constant d_i = -r_i for unit normal).
  - Basal planes at z = +-h/2 (prism).
  - Face numbers: prism slots [1, 2, 3..8] (geo3d_closedform.cpp:1322-1324);
    pyramid slots [1, 2, 3..8, 13..18, 23..28] (:748-753).

Degenerate shapes (empty cross-section, h <= eps) yield face_present all
False; the sampler then gives such rays zero weight (the reference's
empty-crystal contract, crystal.hpp:207-218).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SQRT3 = float(np.sqrt(3.0))
SQRT3_4 = SQRT3 / 4.0

# Exact theta_i = i*60deg direction tables (geo3d_closedform.hpp:53-57).
HEX_COS = np.array([1.0, 0.5, -0.5, -1.0, -0.5, 0.5], np.float32)
HEX_SIN = np.array([0.0, SQRT3 / 2, SQRT3 / 2, 0.0, -SQRT3 / 2, -SQRT3 / 2], np.float32)

# Candidate 2D cross-section corners: direction pairs (i, j), i < j, skipping
# exactly-opposite pairs (j == i + 3). 12 candidates total.
_PAIRS = np.array([(i, j) for i in range(6) for j in range(i + 1, 6) if j != i + 3], np.int32)
N_CANDIDATES = len(_PAIRS)  # 12

PRISM_FACES = 8
PYRAMID_FACES = 20
MAX_FACE_VTX = 12  # reference kCrystalGeomMaxVtxPerFace (crystal.hpp:80)

# Prism face-number constants per slot.
PRISM_FACE_NUMBER = np.array([1, 2, 3, 4, 5, 6, 7, 8], np.int32)
# Pyramid slots: 0/1 basal, 2+i prism side (3+i), 8+i upper cone (13+i),
# 14+i lower cone (23+i).
PYRAMID_FACE_NUMBER = np.array(
    [1, 2] + [3 + i for i in range(6)] + [13 + i for i in range(6)] + [23 + i for i in range(6)],
    np.int32,
)

_EPS = 1e-5  # reference math::kFloatEps


class CrystalGeom(NamedTuple):
    """Flat fixed-shape crystal geometry (batchable: leading dims broadcast)."""

    plane_n: jnp.ndarray      # [NF, 3] unit outward normals
    plane_d: jnp.ndarray      # [NF] plane constant (p . n + d = 0; inside <= 0)
    face_number: jnp.ndarray  # [NF] int32 parametric face numbers
    face_present: jnp.ndarray  # [NF] bool
    face_vtx: jnp.ndarray     # [NF, MV, 3] CCW-from-outside polygon vertices
    face_vtx_cnt: jnp.ndarray  # [NF] int32 (0 when absent)

    @property
    def n_faces(self) -> int:
        return self.plane_n.shape[-2]


class HexCrossSection(NamedTuple):
    """2D hex half-plane intersection at fixed offsets r[6]."""

    corner_xy: jnp.ndarray      # [12, 2] candidate corners
    corner_valid: jnp.ndarray   # [12] bool feasibility
    side_present: jnp.ndarray   # [6] bool (edge of positive length on line i)
    side_lo: jnp.ndarray        # [6, 2] edge endpoint at min tangent coord
    side_hi: jnp.ndarray        # [6, 2] edge endpoint at max tangent coord
    is_bounded: jnp.ndarray     # [] bool (>= 3 distinct corners, positive area)


def hex_cross_section(r: jnp.ndarray) -> HexCrossSection:
    """Intersection of the 6 fixed-direction half-planes x.dir_i <= r_i.

    Pure jnp mirror of SolveHexCrossSection (geo3d_closedform.cpp): candidate
    corners from all non-parallel direction pairs, feasibility by half-plane
    test with a relative tolerance. Duplicate corners are NOT deduped — they
    contribute zero-area fan triangles downstream, which is the same
    "zero-weight discard" the reference applies to degenerate faces.
    """
    r = jnp.asarray(r, jnp.float32)
    cos_t = jnp.asarray(HEX_COS)
    sin_t = jnp.asarray(HEX_SIN)

    i_idx = jnp.asarray(_PAIRS[:, 0])
    j_idx = jnp.asarray(_PAIRS[:, 1])
    ci, si, ri = cos_t[i_idx], sin_t[i_idx], r[i_idx]
    cj, sj, rj = cos_t[j_idx], sin_t[j_idx], r[j_idx]
    det = ci * sj - si * cj  # sin(theta_j - theta_i); never 0 for kept pairs
    px = (ri * sj - rj * si) / det
    py = (rj * ci - ri * cj) / det
    corners = jnp.stack([px, py], axis=-1)  # [12, 2]

    # Feasibility: corner satisfies every half-plane within tolerance.
    # Relative tolerance scaled by the offset magnitude (numerical-robustness
    # convention: no absolute epsilon on a scale-variant quantity).
    scale = jnp.maximum(jnp.max(jnp.abs(r)), 1.0)
    tol = _EPS * scale * 8.0
    proj = corners[:, 0:1] * cos_t[None, :] + corners[:, 1:2] * sin_t[None, :]  # [12, 6]
    valid = jnp.all(proj <= r[None, :] + tol, axis=-1)

    # Per-direction edge: extreme feasible corners along the tangent
    # t_i = (-sin, cos) among corners lying on line i.
    on_line = jnp.zeros((N_CANDIDATES, 6), bool)
    on_line = on_line.at[jnp.arange(N_CANDIDATES), i_idx].set(True)
    on_line = on_line.at[jnp.arange(N_CANDIDATES), j_idx].set(True)
    use = on_line & valid[:, None]  # [12, 6]
    tang_u = -corners[:, 0:1] * sin_t[None, :] + corners[:, 1:2] * cos_t[None, :]  # [12, 6]
    big = jnp.float32(1e30)
    u_min = jnp.min(jnp.where(use, tang_u, big), axis=0)
    u_max = jnp.max(jnp.where(use, tang_u, -big), axis=0)
    any_on = jnp.any(use, axis=0)
    side_present = any_on & ((u_max - u_min) > tol)

    # Edge endpoints: foot point on line i plus tangent offset.
    foot = jnp.stack([cos_t * r, sin_t * r], axis=-1)      # [6, 2]
    tang = jnp.stack([-sin_t, cos_t], axis=-1)             # [6, 2]
    u_min_c = jnp.where(any_on, u_min, 0.0)
    u_max_c = jnp.where(any_on, u_max, 0.0)
    side_lo = foot + u_min_c[:, None] * tang
    side_hi = foot + u_max_c[:, None] * tang

    # Bounded polygon: >= 3 present sides is necessary & sufficient for the
    # fixed-direction family (a non-empty bounded region needs >= 3 edges).
    is_bounded = jnp.sum(side_present.astype(jnp.int32)) >= 3
    return HexCrossSection(corners, valid, side_present, side_lo, side_hi, is_bounded)


def _sorted_polygon_ccw(corners: jnp.ndarray, valid: jnp.ndarray, flip: bool,
                        max_vtx: int) -> tuple:
    """Order feasible 2D corners CCW by angle around their centroid.

    Returns ([max_vtx, 2] vertices padded with the first vertex, count).
    `flip=True` reverses to CW in the xy-plane (used for the lower basal face,
    whose outward normal is -z, so CCW-from-outside is CW-from-above).
    Duplicate corners stay in the list (zero-area contributions downstream).
    """
    cnt = jnp.sum(valid.astype(jnp.int32))
    w = valid.astype(jnp.float32)
    centroid = jnp.sum(corners * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    d = corners - centroid
    ang = jnp.arctan2(d[:, 1], d[:, 0])
    ang = jnp.where(flip, -ang, ang)
    ang = jnp.where(valid, ang, jnp.float32(1e9))  # invalid sort last
    order = jnp.argsort(ang)
    sorted_c = corners[order]
    sorted_v = valid[order]
    # Pad invalid slots with the first vertex (harmless for fan triangles).
    first = sorted_c[0]
    out = jnp.where(sorted_v[:, None], sorted_c, first[None, :])
    out = out[:max_vtx]
    pad = max_vtx - out.shape[0]
    if pad > 0:
        out = jnp.concatenate([out, jnp.tile(first[None, :], (pad, 1))], axis=0)
    return out, jnp.minimum(cnt, max_vtx)


@jax.jit
def prism_geom(h: jnp.ndarray, dist: jnp.ndarray) -> CrystalGeom:
    """Closed-form hexagonal prism (ComputeClosedFormPrism,
    geo3d_closedform.cpp:1318-1400).

    h: scalar height ratio; dist: [6] signed face distances. vmap over leading
    axes for shape pools.
    """
    h = jnp.asarray(h, jnp.float32)
    dist = jnp.asarray(dist, jnp.float32)
    r_side = jnp.float32(SQRT3_4) * dist
    xs = hex_cross_section(r_side)

    h_half = 0.5 * h
    plane_n = jnp.concatenate(
        [
            jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], jnp.float32),
            jnp.stack([jnp.asarray(HEX_COS), jnp.asarray(HEX_SIN), jnp.zeros(6, jnp.float32)], axis=-1),
        ],
        axis=0,
    )  # [8, 3]
    plane_d = jnp.concatenate([jnp.stack([-h_half, -h_half]), -r_side])  # [8]

    degenerate = h <= _EPS
    present_basal = xs.is_bounded & ~degenerate
    face_present = jnp.concatenate(
        [jnp.stack([present_basal, present_basal]), xs.side_present & present_basal]
    )

    # Basal polygons: feasible cross-section corners at z = +-h/2.
    top2d, top_cnt = _sorted_polygon_ccw(xs.corner_xy, xs.corner_valid, flip=False,
                                         max_vtx=MAX_FACE_VTX)
    bot2d, bot_cnt = _sorted_polygon_ccw(xs.corner_xy, xs.corner_valid, flip=True,
                                         max_vtx=MAX_FACE_VTX)
    top_vtx = jnp.concatenate([top2d, jnp.full((MAX_FACE_VTX, 1), 1.0, jnp.float32) * h_half], axis=-1)
    bot_vtx = jnp.concatenate([bot2d, jnp.full((MAX_FACE_VTX, 1), -1.0, jnp.float32) * h_half], axis=-1)

    # Side rectangles: (lo,-h/2) (hi,-h/2) (hi,+h/2) (lo,+h/2) — CCW from
    # outside for outward normal (cos, sin, 0).
    lo3b = jnp.concatenate([xs.side_lo, -h_half * jnp.ones((6, 1))], axis=-1)
    hi3b = jnp.concatenate([xs.side_hi, -h_half * jnp.ones((6, 1))], axis=-1)
    hi3t = jnp.concatenate([xs.side_hi, h_half * jnp.ones((6, 1))], axis=-1)
    lo3t = jnp.concatenate([xs.side_lo, h_half * jnp.ones((6, 1))], axis=-1)
    side_vtx4 = jnp.stack([lo3b, hi3b, hi3t, lo3t], axis=1)  # [6, 4, 3]
    side_vtx = jnp.concatenate(
        [side_vtx4, jnp.tile(side_vtx4[:, :1, :], (1, MAX_FACE_VTX - 4, 1))], axis=1
    )  # [6, MV, 3]

    face_vtx = jnp.concatenate([top_vtx[None], bot_vtx[None], side_vtx], axis=0)  # [8, MV, 3]
    face_vtx_cnt = jnp.concatenate(
        [jnp.stack([top_cnt, bot_cnt]), jnp.full((6,), 4, jnp.int32)]
    )
    face_vtx_cnt = jnp.where(face_present, face_vtx_cnt, 0)

    return CrystalGeom(
        plane_n=plane_n,
        plane_d=plane_d,
        face_number=jnp.asarray(PRISM_FACE_NUMBER),
        face_present=face_present,
        face_vtx=face_vtx,
        face_vtx_cnt=face_vtx_cnt,
    )


prism_geom_batch = jax.vmap(prism_geom, in_axes=(0, 0))


def pad_geom_faces(geom: CrystalGeom, nf: int) -> CrystalGeom:
    """Pad the face dimension to `nf` slots (absent faces). Lets prism (8)
    and pyramid (20) geometries share one pool layout."""
    cur = geom.plane_n.shape[-2]
    if cur == nf:
        return geom
    pad = nf - cur

    def pad_axis(a, axis, fill=0):
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        return jnp.pad(a, widths, constant_values=fill)

    return CrystalGeom(
        plane_n=pad_axis(geom.plane_n, -2),
        plane_d=pad_axis(geom.plane_d, -1, fill=-1e6),  # inert: always satisfied
        face_number=pad_axis(geom.face_number, -1),
        face_present=pad_axis(geom.face_present, -1, fill=False),
        face_vtx=pad_axis(geom.face_vtx, -3),
        face_vtx_cnt=pad_axis(geom.face_vtx_cnt, -1),
    )


@jax.jit
def polygon_areas(geom: CrystalGeom) -> jnp.ndarray:
    """Per-face polygon area via the fan-triangle cross products. [NF]."""
    v0 = geom.face_vtx[..., 0:1, :]
    # Fan triangles (v0, v[k], v[k+1]) for k = 1..MV-2.
    a = geom.face_vtx[..., 1:-1, :] - v0
    b = geom.face_vtx[..., 2:, :] - v0
    cross = jnp.cross(a, b)
    cross_sq = jnp.sum(cross * cross, axis=-1)  # [NF, MV-2]
    # Double-where so padded zero-area triangles don't poison gradients
    # (sqrt'(0) = inf; jnp.where alone still propagates NaN).
    nonzero = cross_sq > 0
    tri_area = jnp.where(nonzero, 0.5 * jnp.sqrt(jnp.where(nonzero, cross_sq, 1.0)), 0.0)
    k = jnp.arange(1, geom.face_vtx.shape[-2] - 1)
    mask = k[None, :] + 1 < geom.face_vtx_cnt[..., None]
    return jnp.sum(jnp.where(mask, tri_area, 0.0), axis=-1)
