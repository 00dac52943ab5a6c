"""The trace kernel: batched single-path weighted bounce loop.

This is the TPU formulation of the reference's per-ray megakernel
(/root/reference/src/core/backend/cuda_trace_backend.cu:603-1219, which the
reference itself validated as statistically equivalent to its fan-out CPU
tracer): per bounce, the child that exits the convex crystal is EMITTED with
its Fresnel weight and the internal child continues — so a fixed ray batch
traces in lockstep with no population growth:

  entry (air->ice):  reflected child exits (slot 0), refracted continues
  bounce k (inside): refracted child exits (slot k), reflected continues
  TIR:               nothing exits, full weight continues

All rays march through `max_hits` interactions total (entry + max_hits - 1
internal bounces, matching the legacy CPU hit-loop count,
simulator.cpp:1306-1352) as fixed-shape [B] arrays under lax.scan; dead lanes
(no entry, anomalous geometry) carry zero weight. The raypath recorder is an
int32 [B, max_hits] face-number buffer; exit k consumes the prefix of length
k + 1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ice_halo_sim_tpu.core import hw, optics, sampling


class GeomPool(NamedTuple):
    """K-shape crystal geometry pool for one scattering layer (the reference's
    GPU K-shape pool design, cuda_trace_backend.cu geometry pools).

    Per-ray data is gathered by shape index at trace time.
    """

    plane_n: jnp.ndarray       # [K, NF, 3]
    plane_d: jnp.ndarray       # [K, NF]
    face_present: jnp.ndarray  # [K, NF]
    face_number: jnp.ndarray   # [K, NF] int32
    tri_v0: jnp.ndarray        # [K, T, 3] entry fan sub-triangles
    tri_e1: jnp.ndarray        # [K, T, 3]
    tri_e2: jnp.ndarray        # [K, T, 3]
    tri_cross_half: jnp.ndarray  # [K, T, 3]
    tri_face: jnp.ndarray      # [K, T] int32


def make_geom_pool(geoms, entry_tris) -> GeomPool:
    """Pack batched CrystalGeom [K, ...] + EntryTris [K, ...] into a pool."""
    return GeomPool(
        plane_n=geoms.plane_n,
        plane_d=geoms.plane_d,
        face_present=geoms.face_present,
        face_number=geoms.face_number,
        tri_v0=entry_tris.v0,
        tri_e1=entry_tris.e1,
        tri_e2=entry_tris.e2,
        tri_cross_half=entry_tris.cross_half,
        tri_face=entry_tris.face_idx,
    )


class TraceExits(NamedTuple):
    """Per-ray exit slots from one scattering layer.

    H = max_hits slots per ray: slot 0 = entry external reflection, slot k
    (k >= 1) = refracted exit of internal bounce k. Weight 0 marks a dead
    slot (TIR or dead lane).
    """

    d_world: jnp.ndarray   # [B, H, 3] exit directions (world frame)
    w: jnp.ndarray         # [B, H]
    path_len: jnp.ndarray  # [B, H] int32, prefix length of `path`
    path: jnp.ndarray      # [B, H] int32 face numbers (shared prefix buffer)
    entry_ok: jnp.ndarray  # [B] bool — lane actually hit a crystal


def trace_layer(
    seed,
    ray_idx: jnp.ndarray,
    d_world: jnp.ndarray,
    w0: jnp.ndarray,
    rot: jnp.ndarray,
    shape_idx: jnp.ndarray,
    pool: GeomPool,
    n_ior: jnp.ndarray,
    max_hits: int,
    score_grad: bool = False,
) -> TraceExits:
    """Trace B rays through one scattering layer's crystals.

    seed: uint32 seed (entry-sampling domain is derived internally).
    ray_idx: [B] uint32 global ray indices (RNG stream identity).
    d_world: [B, 3] incident directions (world frame, light propagation).
    w0: [B] initial weights.
    rot: [B, 3, 3] crystal->world rotations.
    shape_idx: [B] int32 indices into the geometry pool.
    n_ior: [B] per-ray refractive index (wavelength-dependent).
    max_hits: total surface interactions (entry + max_hits-1 internal).
    """
    from ice_halo_sim_tpu.core import rng as _rng

    B = d_world.shape[0]
    entry_seed = jnp.uint32(seed) ^ _rng.NONCE_ENTRY

    if shape_idx is None:
        # Blocked geom-clock assignment: ray i uses shape i // (B / K). A
        # broadcast+reshape is a streaming copy XLA fuses into consumers —
        # row-gathers with per-ray indices lower catastrophically on TPU.
        K = pool.plane_n.shape[0]
        assert B % K == 0, (B, K)
        G = B // K

        def expand(a):
            return jnp.broadcast_to(a[:, None], (K, G) + a.shape[1:]).reshape(
                (B,) + a.shape[1:]
            )
    else:
        def expand(a):
            return a[shape_idx]

    plane_n = expand(pool.plane_n)           # [B, NF, 3]
    plane_d = expand(pool.plane_d)           # [B, NF]
    face_present = expand(pool.face_present)  # [B, NF]
    face_number = expand(pool.face_number)   # [B, NF]
    tris = sampling.EntryTris(
        v0=expand(pool.tri_v0),
        e1=expand(pool.tri_e1),
        e2=expand(pool.tri_e2),
        cross_half=expand(pool.tri_cross_half),
        face_idx=expand(pool.tri_face),
    )

    # Crystal-frame incident direction + entry point/face.
    d_local = sampling.rotate_inv(rot, d_world)
    p, f0, entry_ok, log_p = sampling.sample_entry(entry_seed, ray_idx, d_local, tris)
    w = jnp.where(entry_ok, w0, 0.0)
    if score_grad:
        # REINFORCE surrogate: multiply by exp(logp - sg(logp)) == 1 in the
        # forward pass; in reverse mode every downstream contribution picks
        # up d(log p)/d(params) — the gradient of the discrete entry-face
        # selection probability that plain autodiff misses.
        w = w * jnp.exp(log_p - jax.lax.stop_gradient(log_p))

    # Per-ray reads along the tiny face axis: gather on CPU, one-hot masked
    # sum on TPU (hw.take_rows; TPU gathers lower near-serially).
    def take_face(arr, f):
        return hw.take_rows(arr, f, axis=-2 if arr.ndim == 3 else -1)

    n0 = take_face(plane_n, f0)  # [B, 3]
    fn0 = take_face(face_number, f0)

    path = jnp.zeros((B, max_hits), jnp.int32)
    path = path.at[:, 0].set(fn0)

    # Entry Fresnel (air -> ice): reflected child exits as slot 0; never TIR
    # (rr = 1/n < 1 => delta > 0; cuda_trace_backend.cu:861-869).
    d_r, d_t, w_r, w_t, _ = optics.fresnel_split(d_local, n0, w, n_ior)
    exit0_d = sampling.rotate(rot, d_r)
    exit0_w = jnp.where(entry_ok, w_r, 0.0)
    exit0_len = jnp.where(entry_ok, 1, 0).astype(jnp.int32)

    def bounce(carry, k):
        p, d, w, from_face, path = carry
        t, fi, found = optics.slab_next_face(p, d, from_face, plane_n, plane_d, face_present)
        alive = found & (w > 0.0)
        p = jnp.where(alive[:, None], p + t[:, None] * d, p)
        fn = take_face(face_number, fi)
        path = jnp.where(alive[:, None] & (jnp.arange(max_hits)[None, :] == k), fn[:, None], path)

        n_face = take_face(plane_n, fi)
        d_r, d_t, w_r, w_t, is_tir = optics.fresnel_split(d, n_face, w, n_ior)
        # Refracted exit: defensive outward check (cuda_trace_backend.cu:1090-1094).
        cos_exit = jnp.sum(d_t * n_face, axis=-1)
        emit_w = jnp.where(alive & ~is_tir & (cos_exit > 0.0), w_t, 0.0)
        emit_d = sampling.rotate(rot, d_t)
        emit_len = jnp.where(emit_w > 0.0, k + 1, 0).astype(jnp.int32)

        d = jnp.where(alive[:, None], d_r, d)
        w = jnp.where(alive, w_r, 0.0)
        from_face = jnp.where(alive, fi, from_face)
        return (p, d, w, from_face, path), (emit_d, emit_w, emit_len)

    carry = (p, d_t, w_t, f0, path)
    (p, d, w, from_face, path), (ys_d, ys_w, ys_len) = jax.lax.scan(
        bounce, carry, jnp.arange(1, max_hits)
    )

    exit_d = jnp.concatenate([exit0_d[:, None, :], jnp.moveaxis(ys_d, 0, 1)], axis=1)
    exit_w = jnp.concatenate([exit0_w[:, None], jnp.moveaxis(ys_w, 0, 1)], axis=1)
    exit_len = jnp.concatenate([exit0_len[:, None], jnp.moveaxis(ys_len, 0, 1)], axis=1)
    return TraceExits(d_world=exit_d, w=exit_w, path_len=exit_len, path=path, entry_ok=entry_ok)


def total_exit_weight(exits: TraceExits) -> jnp.ndarray:
    """Sum of emitted weights per ray [B] (energy accounting)."""
    return jnp.sum(exits.w, axis=-1)
