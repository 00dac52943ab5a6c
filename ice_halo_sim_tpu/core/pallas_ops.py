"""Pallas TPU kernels for the accumulation fold's scatter stage.

The fold (core/accum.py) turns scatter-add into sort + segmented scan +
"block scatter": after a block-local row sort, block g's leading rows must
land at dense offset start[g] (forward overwrite: a block's garbage tail
falls into later blocks' ranges and is overwritten by them — see
accum._marker_extract). XLA can only express that as a fori_loop of
dynamic_update_slice — G serialized full-latency DMAs, measured ~60 us per
block on v5e (~20+ ms per fold, the single largest cost in the renderer).

This kernel does the same writes inside ONE Pallas program. Mosaic requires
vector slices to be tile-aligned, so instead of writing at the raw offset,
each block is rotated into place and blended into an ALIGNED window:

  delta = start % 1024; window = out[start - delta : ... + block + 1024]
  out_window = where(flat_index >= delta, roll_flat(block_rows, delta),
                     window)

roll_flat decomposes the traced delta into static sublane rolls (3 bits)
plus static lane rolls with a cross-row carry (7 bits) — every primitive
is a static-shift pltpu.roll, which Mosaic lowers natively. Two variants:

  - VMEM-resident output (small dense images): the window blend is pure
    vector ops; measured ~0 ms net at G=192 (vs 12+ ms XLA).
  - HBM output with DMA read-modify-write windows (large buffers, e.g.
    compact_rows' row buffers that exceed VMEM).

Parity contract: bit-identical to the XLA fori_loop formulation (probe:
scripts/probe_pallas_scatter.py; unit tests run the interpreter on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB_ALIGN = 8
ALIGN = LANES * SUB_ALIGN      # 1024: flat element alignment of windows
SUP = 8                        # blocks handled per grid step

# VMEM budget for the dense output (leave room for input double-buffering).
_VMEM_OUT_BYTES = 10 * 1024 * 1024

# Test hook: run kernels through the Pallas interpreter (works on CPU) and
# treat them as available. Set by tests only.
INTERPRET = False


def available() -> bool:
    """True when the Pallas TPU lowering is usable on this backend.

    IHT_PALLAS=0 is the runtime kill switch: a Mosaic lowering regression
    degrades to the pure-XLA fold instead of crashing the renderer.
    """
    from ice_halo_sim_tpu.utils import env_knobs

    if str(env_knobs.get("IHT_PALLAS", "1")).lower() in ("0", "off"):
        return False
    return INTERPRET or jax.default_backend() in ("tpu", "axon")


def _flat_roll(buf, delta):
    """Roll [R, 128] right by traced delta in [0, ALIGN) in flat row-major
    order, using static rolls only. delta = r * 128 + l."""
    r = delta // LANES
    l = delta % LANES
    a = buf
    bit = 1
    while bit < SUB_ALIGN:
        a = jnp.where((r & bit) != 0, pltpu.roll(a, bit, 0), a)
        bit <<= 1
    b = pltpu.roll(a, 1, 0)     # one extra row: feeds lanes j < l
    bit = 1
    while bit < LANES:
        take = (l & bit) != 0
        a = jnp.where(take, pltpu.roll(a, bit, 1), a)
        b = jnp.where(take, pltpu.roll(b, bit, 1), b)
        bit <<= 1
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane_iota < l, b, a)


def _window_values(vals_ref, k, br, delta):
    """Shifted window [br + SUB_ALIGN, LANES] for sub-block k of a
    [SUP*br, LANES] VMEM input block."""
    block2 = vals_ref[k * br : (k + 1) * br, :]
    buf = jnp.concatenate(
        [block2, jnp.zeros((SUB_ALIGN, LANES), block2.dtype)], axis=0
    )
    return _flat_roll(buf, delta)


def _flat_iota(wr_rows):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (wr_rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (wr_rows, LANES), 1)
    )


def _scatter_vmem(vals2, start, out_rows: int, br: int, limit: int):
    """Dense output resident in VMEM for the whole grid."""
    WR = br + SUB_ALIGN
    Gp = vals2.shape[0] // br

    def kernel(start_ref, vals_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for k in range(SUP):
            s = start_ref[g * SUP + k]

            @pl.when(s < limit)
            def _(k=k, s=s):
                delta = s % ALIGN
                wr = pl.multiple_of((s - delta) // LANES, SUB_ALIGN)
                shifted = _window_values(vals_ref, k, br, delta)
                window = out_ref[pl.ds(wr, WR), :]
                out_ref[pl.ds(wr, WR), :] = jnp.where(
                    _flat_iota(WR) >= delta, shifted, window
                )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Gp // SUP,),
        in_specs=[
            pl.BlockSpec(
                (SUP * br, LANES), lambda g, s: (g, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), vals2.dtype),
        interpret=INTERPRET,
    )(start, vals2)


def _scatter_hbm(vals2, start, out_rows: int, br: int, limit: int):
    """Dense output in HBM; each window is a DMA read-modify-write through
    a VMEM scratch (sequential — consecutive windows may overlap)."""
    WR = br + SUB_ALIGN
    Gp = vals2.shape[0] // br

    def kernel(start_ref, zeros_ref, vals_ref, out_ref, win_ref, sem):
        del zeros_ref  # aliased to out_ref: provides the zero init
        g = pl.program_id(0)
        for k in range(SUP):
            s = start_ref[g * SUP + k]

            @pl.when(s < limit)
            def _(k=k, s=s):
                delta = s % ALIGN
                wr = pl.multiple_of((s - delta) // LANES, SUB_ALIGN)
                load = pltpu.make_async_copy(
                    out_ref.at[pl.ds(wr, WR), :], win_ref, sem
                )
                load.start()
                load.wait()
                shifted = _window_values(vals_ref, k, br, delta)
                win_ref[:] = jnp.where(
                    _flat_iota(WR) >= delta, shifted, win_ref[:]
                )
                store = pltpu.make_async_copy(
                    win_ref, out_ref.at[pl.ds(wr, WR), :], sem
                )
                store.start()
                store.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Gp // SUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (SUP * br, LANES), lambda g, s: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((WR, LANES), vals2.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros((out_rows, LANES), vals2.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), vals2.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(start, zeros, vals2)


def _flat_roll_left(x, s: int, R: int):
    """Flat row-major LEFT shift by static s (a ROTATION — the caller masks
    wrapped positions): res[r, l] = x[flat + s]."""
    if s >= LANES:
        m = s // LANES
        assert s % LANES == 0
        return pltpu.roll(x, R - m, 0)
    rolled = pltpu.roll(x, LANES - s, 1)          # x[r, (l+s) % 128]
    nxt = pltpu.roll(x, R - 1, 0)                 # x[(r+1) % R, l]
    b = pltpu.roll(nxt, LANES - s, 1)             # x[r+1, (l+s) % 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - s, rolled, b)


def _flat_prefix_sum_excl(v, R: int):
    """Exclusive prefix sum of [R, 128] int32 in flat row-major order.
    Returns (excl, total) with total broadcast [R, 128]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    inc = v
    bit = 1
    while bit < LANES:
        sh = pltpu.roll(inc, bit, 1)
        inc = inc + jnp.where(lane >= bit, sh, 0)
        bit <<= 1
    row_tot = jnp.broadcast_to(inc[:, LANES - 1 : LANES], v.shape)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    rp = jnp.where(row >= 1, pltpu.roll(row_tot, 1, 0), 0)
    bit = 1
    while bit < R:
        sh = pltpu.roll(rp, bit, 0)
        rp = rp + jnp.where(row >= bit, sh, 0)
        bit <<= 1
    incl_flat = rp + inc
    # The block total as a SCALAR (prefix sums are nondecreasing, so the
    # max IS the last element). Mosaic rejects [1,1]->[R,128] broadcasts
    # ("Broadcast in both sublanes and lanes", caught by the TPU smoke
    # gate); scalar splats are fine, and signed-int reductions lower.
    total = jnp.max(incl_flat)
    return incl_flat - v, total


def _pack_one_block(key, cols, thresh: int, R: int, nbits: int,
                    carry_key: bool = True):
    """Stable compaction of one [R, 128] block in VMEM: rows with
    u32 key < thresh move to the flat front, original order preserved.

    Butterfly routing: each valid element's displacement d = index - rank
    (the count of invalid elements before it) is non-decreasing across
    valid elements, so moving elements left by 2^j for each set bit of d
    (LSB first) is collision-free (verified exhaustively for n=16 and
    randomized for n=64 against a numpy oracle). 12 stages for a
    4096-element block vs the 78 compare-exchange stages of the bitonic
    block sort this replaces — the compaction needs no key ORDER at all.
    """
    i32 = jnp.int32
    flip = jnp.int32(-0x80000000)
    keyi = pltpu.bitcast(key, i32) ^ flip          # u32 order -> i32 order
    valid = keyi < (jnp.int32((thresh & 0xFFFFFFFF) - 0x80000000))
    flat = (
        jax.lax.broadcasted_iota(i32, key.shape, 0) * LANES
        + jax.lax.broadcasted_iota(i32, key.shape, 1)
    )
    rank, total = _flat_prefix_sum_excl(valid.astype(i32), R)
    d = jnp.where(valid, flat - rank, -1)

    # carry_key=False: the key is used only to derive the masks above and
    # is not routed/emitted — callers that need counts + payloads only
    # (marker extraction) save a full operand of roll-selects per stage.
    arrs = ([key] if carry_key else []) + list(cols)
    for j in range(nbits):
        s = 1 << j
        # Masks ride as int32: Mosaic's dynamic rotate rejects i1 vectors
        # ("Rotate with non-32-bit data", caught by the TPU smoke gate).
        move = jnp.where((d >= 0) & (((d >> j) & 1) == 1), i32(1), i32(0))
        inc = (
            (_flat_roll_left(move, s, R) != 0) & (flat < R * LANES - s)
        )
        d_in = _flat_roll_left(d, s, R) - s
        vacated = (move != 0) & ~inc
        d = jnp.where(inc, d_in, jnp.where(vacated, -1, d))
        arrs = [
            jnp.where(inc, _flat_roll_left(a, s, R), a) for a in arrs
        ]

    keep = flat < total
    if carry_key:
        out_key = jnp.where(keep, arrs[0], jnp.uint32(0xFFFFFFFF))
        payloads = arrs[1:]
    else:
        out_key = None
        payloads = arrs
    out_cols = [
        jnp.where(keep, a, jnp.zeros_like(a)) for a in payloads
    ]
    return out_key, out_cols, total


def pack_valid_blocks(key, cols, thresh: int, block: int):
    """Per-block stable compaction: rows with key < thresh (u32 compare)
    move to each block's flat front in original order; the tail is masked
    to (key=0xFFFFFFFF, cols=0). Returns (packed_key [N], packed_cols,
    counts [G] int32).

    key: [N] uint32, N % block == 0; cols: [N] 32-bit arrays.
    The TPU-native replacement for a block SORT when only validity
    partitioning is needed (the fold prepass and marker extraction).
    """
    N = key.shape[0]
    G = N // block
    assert G * block == N, (N, block)
    assert block % (SUP * LANES) == 0, block
    R = block // LANES
    nbits = int(np.log2(block))
    assert 1 << nbits == block, block

    def kernel(key_ref, *rest):
        cols_refs = rest[: len(cols)]
        okey_ref = rest[len(cols)]
        ocols_refs = rest[len(cols) + 1 : 2 * len(cols) + 1]
        cnt_ref = rest[2 * len(cols) + 1]
        for k in range(SUP):
            sl = slice(k * R, (k + 1) * R)
            pk, pc, tot = _pack_one_block(
                key_ref[sl, :], [c[sl, :] for c in cols_refs],
                thresh, R, nbits,
            )
            okey_ref[sl, :] = pk
            for ref, v in zip(ocols_refs, pc):
                ref[sl, :] = v
            cnt_ref[k : k + 1, :] = jnp.full((1, LANES), tot, jnp.int32)

    Gp = -(-G // SUP) * SUP
    if Gp != G:
        pad = (Gp - G) * block
        key = jnp.concatenate([key, jnp.full(pad, 0xFFFFFFFF, key.dtype)])
        cols = [jnp.concatenate([c, jnp.zeros(pad, c.dtype)]) for c in cols]
    key2 = key.reshape(Gp * R, LANES)
    cols2 = [c.reshape(Gp * R, LANES) for c in cols]

    spec = pl.BlockSpec((SUP * R, LANES), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((SUP, LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(Gp // SUP,),
        in_specs=[spec] * (1 + len(cols)),
        out_specs=[spec] * (1 + len(cols)) + [cnt_spec],
        out_shape=(
            [jax.ShapeDtypeStruct((Gp * R, LANES), key.dtype)]
            + [jax.ShapeDtypeStruct((Gp * R, LANES), c.dtype) for c in cols]
            + [jax.ShapeDtypeStruct((Gp, LANES), jnp.int32)]
        ),
        interpret=INTERPRET,
    )(key2, *cols2)
    pk = outs[0].reshape(-1)[:N]
    pcols = [o.reshape(-1)[:N] for o in outs[1 : 1 + len(cols)]]
    counts = outs[-1][:G, 0]
    return pk, pcols, counts


def pack_payload_blocks(key, cols, thresh: int, block: int):
    """pack_valid_blocks WITHOUT routing/emitting the key: returns
    (packed_cols, counts). The key only derives the validity masks — one
    fewer operand through every butterfly stage (the marker-extraction
    shape: destination is the rank, the key itself is never needed)."""
    N = key.shape[0]
    G = N // block
    assert G * block == N, (N, block)
    assert block % (SUP * LANES) == 0, block
    R = block // LANES
    nbits = int(np.log2(block))
    assert 1 << nbits == block, block

    def kernel(key_ref, *rest):
        cols_refs = rest[: len(cols)]
        ocols_refs = rest[len(cols) : 2 * len(cols)]
        cnt_ref = rest[2 * len(cols)]
        for k in range(SUP):
            sl = slice(k * R, (k + 1) * R)
            _pk, pc, tot = _pack_one_block(
                key_ref[sl, :], [c[sl, :] for c in cols_refs],
                thresh, R, nbits, carry_key=False,
            )
            for ref, v in zip(ocols_refs, pc):
                ref[sl, :] = v
            cnt_ref[k : k + 1, :] = jnp.full((1, LANES), tot, jnp.int32)

    Gp = -(-G // SUP) * SUP
    if Gp != G:
        pad = (Gp - G) * block
        key = jnp.concatenate([key, jnp.full(pad, 0xFFFFFFFF, key.dtype)])
        cols = [jnp.concatenate([c, jnp.zeros(pad, c.dtype)]) for c in cols]
    key2 = key.reshape(Gp * R, LANES)
    cols2 = [c.reshape(Gp * R, LANES) for c in cols]

    spec = pl.BlockSpec((SUP * R, LANES), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((SUP, LANES), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(Gp // SUP,),
        in_specs=[spec] * (1 + len(cols)),
        out_specs=[spec] * len(cols) + [cnt_spec],
        out_shape=(
            [jax.ShapeDtypeStruct((Gp * R, LANES), c.dtype) for c in cols]
            + [jax.ShapeDtypeStruct((Gp, LANES), jnp.int32)]
        ),
        interpret=INTERPRET,
    )(key2, *cols2)
    pcols = [o.reshape(-1)[:N] for o in outs[: len(cols)]]
    counts = outs[-1][:G, 0]
    return pcols, counts


def marker_tail_ok(n_vals: int, out_len: int, block: int,
                   tail_start: int, tail_len: int) -> bool:
    """Whether scatter_blocks_multi can honor a marker_tail request: the
    VMEM-output variant must apply (the per-array fallback cannot write
    the tail) and the tail must be whole-row aligned."""
    br = block // LANES
    out_rows = (-(-out_len // ALIGN)) * SUB_ALIGN + br + 2 * SUB_ALIGN
    out_rows = -(-out_rows // SUB_ALIGN) * SUB_ALIGN
    return (
        n_vals * out_rows * LANES * 4 <= _VMEM_OUT_BYTES
        and tail_start % ALIGN == 0
        and tail_len % ALIGN == 0
        and tail_start + tail_len <= out_len
    )


def scatter_blocks_multi(vals_list, start, out_len: int, block: int,
                         marker_tail=None):
    """scatter_blocks for V payload arrays sharing ONE start vector: one
    kernel computes each window's roll/blend masks once and applies them
    to every payload (measured ~30-40% cheaper than V separate calls).
    VMEM-output variant only — falls back to per-array scatter_blocks when
    the dense outputs exceed the VMEM budget.

    marker_tail: optional (tail_start, tail_len, shift, low_or) — after
    every window write, the FINAL grid step fills channel 0's flat range
    [tail_start, tail_start + tail_len) with ((i << shift) | low_or) for
    i in [0, tail_len) (u32 marker keys for the pre-merged accumulation
    fold: the sort input comes straight out of this kernel with the
    per-pixel marker rows already in place — no XLA concatenate pass).
    Ranges must be ALIGN-aligned; caller gates with marker_tail_ok()."""
    V = len(vals_list)
    G, blk = vals_list[0].shape
    assert blk % ALIGN == 0, blk
    br = blk // LANES
    out_rows = (-(-out_len // ALIGN)) * SUB_ALIGN + br + 2 * SUB_ALIGN
    out_rows = -(-out_rows // SUB_ALIGN) * SUB_ALIGN
    if V * out_rows * LANES * 4 > _VMEM_OUT_BYTES:
        assert marker_tail is None, (
            "marker_tail needs the VMEM scatter variant (marker_tail_ok)"
        )
        return [
            scatter_blocks(v, start, out_len, block) for v in vals_list
        ]
    if marker_tail is not None:
        t0, tlen, msh, mlow = marker_tail
        assert t0 % ALIGN == 0 and tlen % ALIGN == 0, (t0, tlen)
        assert t0 + tlen <= out_len, (t0, tlen, out_len)
    Gp = -(-G // SUP) * SUP
    if Gp != G:
        vals_list = [
            jnp.concatenate([v, jnp.zeros((Gp - G, blk), v.dtype)])
            for v in vals_list
        ]
        start = jnp.concatenate(
            [start, jnp.full((Gp - G,), jnp.int32(0x7FFFFFF0))]
        )
    vals2 = [v.reshape(Gp * br, LANES) for v in vals_list]
    WR = br + SUB_ALIGN

    def kernel(start_ref, *rest):
        vals_refs = rest[:V]
        out_refs = rest[V:]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            for o in out_refs:
                o[:] = jnp.zeros_like(o)

        for k in range(SUP):
            s = start_ref[g * SUP + k]

            @pl.when(s < out_len)
            def _(k=k, s=s):
                delta = s % ALIGN
                wr = pl.multiple_of((s - delta) // LANES, SUB_ALIGN)
                fio = _flat_iota(WR) >= delta
                for v_ref, o_ref in zip(vals_refs, out_refs):
                    shifted = _window_values(v_ref, k, br, delta)
                    window = o_ref[pl.ds(wr, WR), :]
                    o_ref[pl.ds(wr, WR), :] = jnp.where(fio, shifted, window)

        if marker_tail is not None:
            # Marker keys into channel 0's tail — on the LAST grid step,
            # AFTER its windows: trailing blocks' window slop (zero rows
            # past a block's live count) can reach up to `blk` flat
            # elements past their start, so markers written any earlier
            # could be stomped back to zero.
            tr0, trn = t0 // LANES, tlen // LANES

            @pl.when(g == n_steps - 1)
            def _():
                row_i = jax.lax.broadcasted_iota(
                    jnp.uint32, (trn, LANES), 0
                )
                lane_i = jax.lax.broadcasted_iota(
                    jnp.uint32, (trn, LANES), 1
                )
                idx = row_i * jnp.uint32(LANES) + lane_i
                out_refs[0][tr0:tr0 + trn, :] = (
                    (idx << jnp.uint32(msh)) | jnp.uint32(mlow)
                ).astype(out_refs[0].dtype)

    n_steps = Gp // SUP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Gp // SUP,),
        in_specs=[
            pl.BlockSpec((SUP * br, LANES), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(V)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(V)
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LANES), v.dtype)
            for v in vals_list
        ],
        interpret=INTERPRET,
    )(start, *vals2)
    return [o.reshape(-1)[:out_len] for o in outs]


def scatter_blocks(vals, start, out_len: int, block: int):
    """Forward-overwrite block scatter: out[start[g] : start[g] + block] =
    vals[g] applied in ascending g, on a zero-initialized out[out_len].

    vals: [G, block] (32-bit dtype), block % 1024 == 0.
    start: [G] int32, nondecreasing. Blocks with start >= out_len are
    skipped (their rows cannot land below out_len); a straddling block
    writes its full window, absorbed by internal padding.
    """
    G, blk = vals.shape
    assert blk % ALIGN == 0, blk
    assert np.dtype(vals.dtype).itemsize == 4, vals.dtype
    br = blk // LANES
    Gp = -(-G // SUP) * SUP
    if Gp != G:
        vals = jnp.concatenate([vals, jnp.zeros((Gp - G, blk), vals.dtype)])
        start = jnp.concatenate(
            [start, jnp.full((Gp - G,), jnp.int32(0x7FFFFFF0))]
        )
    vals2 = vals.reshape(Gp * br, LANES)
    # Rows covering [0, out_len + window), window-aligned.
    out_rows = (-(-out_len // ALIGN)) * SUB_ALIGN + br + 2 * SUB_ALIGN
    out_rows = -(-out_rows // SUB_ALIGN) * SUB_ALIGN
    if out_rows * LANES * 4 <= _VMEM_OUT_BYTES:
        dense = _scatter_vmem(vals2, start, out_rows, br, out_len)
    else:
        dense = _scatter_hbm(vals2, start, out_rows, br, out_len)
    return dense.reshape(-1)[:out_len]
