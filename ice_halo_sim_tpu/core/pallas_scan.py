"""Pallas fused segmented-scan kernel for the accumulation fold.

Replaces the XLA stage chain between the fold's global sort and its marker
extraction (accum._segmented_totals + the basis expansion): per sorted row,

  chans[c] = basis_tbl[wl_bits(key), c] * w
  seg[c]   = segmented inclusive scan of chans[c] over same-pixel runs

XLA runs this as ~8 separate HBM passes (compare/flags, 3x cumsum,
3x cummax, selects, associative carry scan); this kernel is ONE pass with
the cross-block carry held in VMEM scratch across the sequential grid.

Formulation: classic segmented-scan operator on (flag, value) pairs
  (f1, v1) (+) (f2, v2) = (f1 | f2, v2 + (f2 ? 0 : v1))
applied as a Hillis-Steele prefix over the flattened [R, 128] block (lane
prefix passes + sublane prefix passes via static rolls), identical math to
accum._segmented_totals' cumsum/cummax trick but without the chunk-carry
approximation boundary: the per-row float error bound is the same
(run-local summation).

The marker extraction (block sort + pallas_ops.scatter_blocks) stays in
accum.py — its input is this kernel's output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Test hook, mirrors pallas_ops.INTERPRET.
INTERPRET = False


def available() -> bool:
    from ice_halo_sim_tpu.utils import env_knobs

    if str(env_knobs.get("IHT_PALLAS", "1")).lower() in ("0", "off"):
        return False
    return INTERPRET or jax.default_backend() in ("tpu", "axon")


def _lane_prefix(v, f, op_rows):
    """Segmented inclusive prefix along the LANE axis of [R, 128] pairs.

    v: values f32, f: segment-start flags (1.0 where a new segment begins).
    A lane's prefix stops extending across a flag: standard segmented scan
    with the flag-OR / conditional-add operator, log2(128) = 7 passes.
    """
    del op_rows
    dist = 1
    while dist < LANES:
        vs = pltpu.roll(v, dist, 1)
        fs = pltpu.roll(f, dist, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        take = lane >= dist
        # add previous-window value unless our own window already saw a flag
        v = v + jnp.where(take & (f < 0.5), vs, 0.0)
        f = jnp.maximum(f, jnp.where(take, fs, 0.0))
        dist <<= 1
    return v, f


def _row_prefix(v_last, f_last):
    """Segmented inclusive prefix along SUBLANES of the per-row pairs
    [R, 128] (only column content matters — caller passes row aggregates
    broadcast across lanes). log2(R) passes of static sublane rolls."""
    R = v_last.shape[0]
    dist = 1
    while dist < R:
        vs = pltpu.roll(v_last, dist, 0)
        fs = pltpu.roll(f_last, dist, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, v_last.shape, 0)
        take = row >= dist
        v_last = v_last + jnp.where(take & (f_last < 0.5), vs, 0.0)
        f_last = jnp.maximum(f_last, jnp.where(take, fs, 0.0))
        dist <<= 1
    return v_last, f_last


def _block_seg_scan(vals, flags):
    """Segmented inclusive scan over a [R, 128] block in FLAT row-major
    order. vals: list of C channel arrays; flags: 1.0 at segment starts.
    Returns (scanned channel list, block aggregate per channel (scalar-ish
    [1, 128] last-position values), block has-flag)."""
    R = vals[0].shape[0]
    # Lane-direction segmented prefix per row.
    lane_scans = []
    f_lane = None
    for v in vals:
        sv, f_lane = _lane_prefix(v, flags, R)
        lane_scans.append(sv)
    # Row aggregates: last lane's (value, flag) per row, broadcast to lanes.
    last_col = LANES - 1
    f_row = f_lane[:, last_col:last_col + 1]                # [R, 1]
    f_row_b = jnp.broadcast_to(f_row, (R, LANES))
    v_rows = [
        jnp.broadcast_to(sv[:, last_col:last_col + 1], (R, LANES))
        for sv in lane_scans
    ]
    # Exclusive segmented prefix of row aggregates = shift rows down by one
    # then inclusive prefix.
    out = []
    carry_rows = []
    for vr in v_rows:
        vr_shift = pltpu.roll(vr, 1, 0)
        fr_shift = pltpu.roll(f_row_b, 1, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, vr.shape, 0)
        vr_shift = jnp.where(row >= 1, vr_shift, 0.0)
        fr_shift = jnp.where(row >= 1, fr_shift, 0.0)
        pv, pf = _row_prefix(vr_shift, fr_shift)
        carry_rows.append((pv, pf))
        out.append(pv)
    # Add the exclusive row carry to every lane whose prefix window reaches
    # the row start (i.e. lanes whose segmented lane-prefix saw no flag yet).
    lane = jax.lax.broadcasted_iota(jnp.int32, flags.shape, 1)
    # seg-start seen at or before lane j in this row:
    seen_flag, _ = _lane_prefix_flagonly(flags)
    res = []
    for sv, pv in zip(lane_scans, out):
        res.append(sv + jnp.where(seen_flag < 0.5, pv, 0.0))
    del lane
    return res, lane_scans, seen_flag


def _lane_prefix_flagonly(f):
    dist = 1
    while dist < LANES:
        fs = pltpu.roll(f, dist, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
        f = jnp.maximum(f, jnp.where(lane >= dist, fs, 0.0))
        dist <<= 1
    return f, None




def _scan_kernel(sk_ref, sw_ref, tbl_ref, c0_ref, c1_ref, c2_ref,
                 *rest, K: int, shift: int, emit_key2: bool = False):
    if emit_key2:
        k2_ref, carry_ref = rest
    else:
        (carry_ref,) = rest
    g = pl.program_id(0)
    sk = sk_ref[...]
    sw = sw_ref[...]
    R = sk.shape[0]

    @pl.when(g == 0)
    def _():
        # carry scratch [8, 128]: rows 0..2 = channel carries (broadcast
        # across lanes — Mosaic has no scalar VMEM stores), row 3 = previous
        # block's last pixel key, bitcast to f32 and broadcast.
        carry_ref[:] = jnp.zeros_like(carry_ref)
        carry_ref[3:4, :] = pltpu.bitcast(
            jnp.full((1, LANES), 0xFFFFFFFF, jnp.uint32), jnp.float32
        )

    wl = (sk >> 1) & jnp.uint32(K - 1)
    # Basis channels via K-way masked accumulation from the (tiny) table:
    # one compare + three FMAs per table entry (4K ops/element — the
    # two-select formulation cost 6K and dominated the kernel at K=64).
    c = [jnp.zeros(sk.shape, jnp.float32) for _ in range(3)]
    for k in range(K):
        m = (wl == jnp.uint32(k)).astype(jnp.float32)
        for ch in range(3):
            c[ch] = c[ch] + m * tbl_ref[k, ch]

    vals = [ci * sw for ci in c]

    pix = sk >> jnp.uint32(shift)
    prev_pix = pltpu.roll(pix, 1, 1)  # careful: flat order crosses rows
    # Build flat previous-pixel: shift by one in flat row-major order.
    # roll along lanes moves within rows; lane 0 must take the previous
    # row's last lane.
    prev_row = pltpu.roll(pix, 1, 0)
    prev_last = pltpu.roll(prev_row, 1, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, pix.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, pix.shape, 0)
    prev_flat = jnp.where(lane == 0, prev_last, prev_pix)
    # First flat element continues the previous BLOCK's last pixel. The
    # carry row is lane-broadcast, so use it as a [1, 128] row and let
    # broadcasting pick it up — Mosaic has no unsigned reductions
    # (jnp.max over uint32 raised NotImplementedError at lowering).
    carry_key = pltpu.bitcast(carry_ref[3:4, :], jnp.uint32)
    prev_flat = jnp.where(
        (lane == 0) & (row == 0), jnp.broadcast_to(carry_key, pix.shape),
        prev_flat,
    )
    flags = (pix != prev_flat).astype(jnp.float32)

    scanned, _, seen = _block_seg_scan(vals, flags)
    # Cross-block carry: add previous carry to rows before the first flag.
    no_flag_yet = seen < 0.5
    # seen is lane-prefix within rows only; extend across rows: a position
    # has seen a flag iff any earlier flat position in the block flagged.
    # Compute via row-level prefix of row-has-flag.
    row_has = jnp.max(flags, axis=1, keepdims=True)            # [R, 1]
    row_has_b = jnp.broadcast_to(row_has, flags.shape)
    row_prev_or = _row_prefix_or_exclusive(row_has_b)
    seen_any = jnp.maximum(jnp.minimum(row_prev_or + seen, 1.0), seen)
    open_mask = seen_any < 0.5
    outs = []
    for ch in range(3):
        cv = jnp.max(carry_ref[ch:ch + 1, :])
        outs.append(scanned[ch] + jnp.where(open_mask, cv, 0.0))

    c0_ref[...] = outs[0]
    c1_ref[...] = outs[1]
    c2_ref[...] = outs[2]
    if emit_key2:
        # Marker-extraction key for the pre-merged fold: the pixel id at
        # marker rows (all-ones low bits), 0xFFFFFFFF elsewhere — computed
        # here for free (pix is already decoded) instead of a separate
        # XLA elementwise pass re-reading the sorted keys from HBM.
        is_marker = (sk & jnp.uint32(2 * K - 1)) == jnp.uint32(2 * K - 1)
        k2_ref[...] = jnp.where(is_marker, pix, jnp.uint32(0xFFFFFFFF))

    # New carry = value at the LAST flat position (inclusive scan there is
    # the open-run total including any inherited carry).
    for ch, o in enumerate(outs):
        carry_ref[ch:ch + 1, :] = jnp.broadcast_to(
            o[R - 1:R, LANES - 1:LANES], (1, LANES)
        )
    carry_ref[3:4, :] = pltpu.bitcast(
        jnp.broadcast_to(pix[R - 1:R, LANES - 1:LANES], (1, LANES)),
        jnp.float32,
    )


def _row_prefix_or_exclusive(f):
    """Exclusive OR-prefix along sublanes of [R, 128] flags (row i sees 1
    if any row < i has a flag)."""
    R = f.shape[0]
    fs = pltpu.roll(f, 1, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
    acc = jnp.where(row >= 1, fs, 0.0)
    dist = 1
    while dist < R:
        sh = pltpu.roll(acc, dist, 0)
        acc = jnp.maximum(acc, jnp.where(row >= dist, sh, 0.0))
        dist <<= 1
    return jnp.minimum(acc, 1.0)


def fused_scan_call(sk, sw, basis_tbl, shift: int, k_pool: int,
                    rows_per_block: int = 256, emit_key2: bool = False):
    """Host wrapper: [M] inputs -> 3 x [M] segmented-prefix channels.

    Pads internally to a rows_per_block*128 multiple (pad keys 0xFFFFFFFF,
    zero weight — the scan is causal, so trailing pad never affects real
    rows) and slices the outputs back to M.

    emit_key2: also return the marker-extraction key (pixel id at marker
    rows, 0xFFFFFFFF elsewhere) as a 4th array — (chans, key2) instead of
    chans.
    """
    M = sk.shape[0]
    R = rows_per_block
    grain = R * LANES
    pad = -(-M // grain) * grain - M
    if pad:
        sk = jnp.concatenate([sk, jnp.full(pad, 0xFFFFFFFF, sk.dtype)])
        sw = jnp.concatenate([sw, jnp.zeros(pad, sw.dtype)])
    G = (M + pad) // grain
    sk2 = sk.reshape(G * R, LANES)
    sw2 = sw.reshape(G * R, LANES)

    n_out = 4 if emit_key2 else 3
    kernel = functools.partial(
        _scan_kernel, K=k_pool, shift=shift, emit_key2=emit_key2
    )
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        out_shape=(
            [jax.ShapeDtypeStruct((G * R, LANES), jnp.float32)] * 3
            + ([jax.ShapeDtypeStruct((G * R, LANES), jnp.uint32)]
               if emit_key2 else [])
        ),
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32)],
        interpret=INTERPRET,
    )(sk2, sw2, basis_tbl)
    chans = [o.reshape(-1)[:M] for o in outs[:3]]
    if emit_key2:
        return chans, outs[3].reshape(-1)[:M]
    return chans
