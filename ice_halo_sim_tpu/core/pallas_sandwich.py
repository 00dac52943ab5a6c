"""The "matmul sandwich" fold: scatter-add on the MXU, no sort at all.

Binning N spectral contribution rows into pixels decomposes as a two-level
one-hot product. Split the pixel id as p = chunk * NLO + lo (NLO = 128, the
lane width); then for a LIST of chunks `cl[0..NC)` (an arbitrary subset —
not an interval, not an iota):

    out[k, c * NLO + lo] = sum_r [chunk_r == cl[k]] * vals[r, c] * [lo_r == lo]
                         = onehot_cl^T  @  (vals <*> onehot_lo)

one [NC, RB] @ [RB, C * NLO] matmul per row block, accumulated into a
VMEM-resident [NC, C * NLO] f32 tile. vals[r, c] = w_r * basis_c(wl_r) is
rebuilt in-kernel from the wavelength-pool table (one tiny [RB, K] @ [K, C]
one-hot matmul), so the fold reads only (pix, w, wl_idx) per row — same
inputs as the sort fold.

Why this beats the sort fold (measured cost model, doc/perf-notes.md): the
global sort costs ~3.3 ms fixed + ~2.9 ns/row and drags a segmented scan +
marker extraction behind it. The sandwich costs ~2 * NC * C * NLO FLOPs/row
on the MXU with NO fixed cost, no markers, no scan: at NC = 256 that is
~197 kFLOP/row ≈ 1 ns/row at v5e bf16 peak. The catch: cost scales with NC,
so covering all P/NLO chunks is slower than the sort. The production fold
(engine/simulator.py) therefore runs TWO passes:

  1. HOT pass: the top-mass NC=256 chunks (32k pixels — probe-measured to
     carry 99.7% of image mass on the bench scene) over ALL rows;
  2. COLD pass: the remaining chunks over only the rows the hot pass missed
     (compacted first — ~10% of rows), so its larger NC meets few rows.

Both passes are EXACT for any chunk split (a row matches exactly one chunk
once across both passes); hot-list calibration quality affects only speed,
never correctness — there is no drift fallback to reason about.

Key trick vs. the round-2 blocker (doc/perf-notes.md §round-3 item 1): the
hot set enters as a chunk-LIST operand compared against each row's chunk id
(`chunk_r == cl[k]`) — a broadcast compare, NOT a per-row rank lookup — so
arbitrary hot sets cost the same as an iota and no gather exists anywhere.

Precision: the one-hot factors are exact in bf16; `vals` rounds to bf16
(~0.4% per row, unbiased), which averages out per pixel and sits 1-2 orders
below Monte-Carlo noise at any realistic rays-per-pixel. The `precise`
variant Dekker-splits vals into two bf16 terms (~2^-16 relative) at twice
the matmul cost.

Reference parity note: this replaces the CUDA megakernel's atomic XYZ
accumulation (cuda_trace_backend.cu:603-1219, accum_shared.h:33-49) — the
TPU has no atomics, the MXU is the scatter substitute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NLO = 128          # lo width = lane count; chunk = pix // NLO
DEFAULT_RB = 2048  # rows per grid step
SUB_CHUNKS = 256   # chunk-list slice per in-kernel matmul ([sub, RB] one-hot)

# Test hook (mirrors pallas_ops.INTERPRET): run through the Pallas
# interpreter on CPU and treat the kernel as available.
INTERPRET = False


def available() -> bool:
    from ice_halo_sim_tpu.utils import env_knobs

    if str(env_knobs.get("IHT_PALLAS", "1")).lower() in ("0", "off"):
        return False
    if str(env_knobs.get("IHT_SANDWICH", "1")).lower() in ("0", "off"):
        return False
    return INTERPRET or jax.default_backend() in ("tpu", "axon")


def _kernel(chunks_ref, pixc_ref, pixr_ref, w_ref, wl_ref, tbl_ref, out_ref,
            matched_ref, *, nc, rb, k_pool, c_out, precise):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    pixc = pixc_ref[...]                                   # [1, RB] i32
    pixr = pixr_ref[...]                                   # [RB, 1] i32
    w = w_ref[...]                                         # [RB, 1] f32
    wl = wl_ref[...]                                       # [RB, 1] i32
    # Negative list ids are padding: remap far negative so they can never
    # equal a dead row's chunk (-1 from pix = -1 floor-division).
    cl = chunks_ref[...]                                   # [NC, 1] i32
    cl = jnp.where(cl < 0, jnp.int32(-0x40000000), cl)

    # Per-row XYZ basis from the wavelength-pool table.
    ohwl = (wl == jax.lax.broadcasted_iota(jnp.int32, (rb, k_pool), 1)).astype(
        jnp.float32
    )
    # HIGHEST precision: the default MXU f32 matmul runs at bf16 precision,
    # which would round `vals` BEFORE the precise variant's two-term split
    # (measured on v5e: the split then recovers nothing).
    vals = jax.lax.dot_general(
        ohwl, tbl_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    vals = vals * w                                        # [RB, C]

    # Level-1: row chunk vs the chunk LIST (arbitrary subset, no gather).
    hi = pixc // NLO                                       # [1, RB]
    eq = cl == hi                                          # [NC, RB] i1
    ohT = eq.astype(jnp.bfloat16)
    # Per-row membership — the cold-routing flag. Derived from the INTEGER
    # compare: a bf16 vector compare (round-2 formulation jnp.max(ohT) > 0)
    # lowers to arith.cmpf on vector<...xbf16>, which Mosaic rejects
    # ("Target does not support this comparison", BENCH_r02).
    matched_ref[...] = jnp.max(eq.astype(jnp.int32), axis=0, keepdims=True)
    # Level-2: lo one-hot.
    lo = pixr - (pixr // NLO) * NLO                        # [RB, 1]
    ohlo = (lo == jax.lax.broadcasted_iota(jnp.int32, (rb, NLO), 1)).astype(
        jnp.float32
    )                                                      # [RB, NLO]

    def accumulate(vpart):
        bmat = jnp.concatenate(
            [
                (ohlo * vpart[:, c : c + 1]).astype(jnp.bfloat16)
                for c in range(c_out)
            ],
            axis=1,
        )                                                  # [RB, C*NLO]
        return jax.lax.dot_general(
            ohT, bmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if precise:
        v_hi = vals.astype(jnp.bfloat16).astype(jnp.float32)
        out_ref[...] += accumulate(v_hi) + accumulate(vals - v_hi)
    else:
        out_ref[...] += accumulate(vals)


def _kernel_lane(chunks_ref, pixc_ref, w_ref, wl_ref, tbl_ref, out_ref,
                 matched_ref, *, nc, rb, k_pool, c_out, precise, sub):
    """Lane-major kernel: EVERY per-row operand is [1, RB] (rows in lanes).

    The [RB, 1] sublane-major operands of `_kernel` force XLA to relayout
    [N, 1] arrays whose physical footprint pads the lane dim 1 -> 128
    (~64 bytes per row per operand); at fold row counts those relayouts
    dominate the pass. Here the second one-hot factor is built TRANSPOSED
    ([C*NLO, RB]) and the product contracts both operands on the lane dim
    (A @ B^T), which the MXU supports natively.

    Lists wider than `sub` chunks loop in-kernel over `sub`-chunk slices
    of the (whole, VMEM-resident) chunk list and out tile: the transposed
    factor is built ONCE per row block and every slice reuses it, so wide
    lists pay only the unavoidable per-chunk compare + MXU FLOPs, not a
    rebuilt factor per slice (the previous caller-side sub-pass splitting
    repaid the whole VPU prologue per slice).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    pixc = pixc_ref[...]                                   # [1, RB] i32
    w = w_ref[...]                                         # [1, RB] f32
    wl = wl_ref[...]                                       # [1, RB] i32

    # Per-row XYZ basis, transposed: [C, RB] = tblT [C, K] @ onehot [K, RB].
    ohwlT = (
        jax.lax.broadcasted_iota(jnp.int32, (k_pool, rb), 0) == wl
    ).astype(jnp.float32)
    valsT = jax.lax.dot_general(
        tbl_ref[...], ohwlT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                      # [C, RB]
    valsT = valsT * w

    hi = pixc // NLO                                       # [1, RB]
    lo = pixc - hi * NLO                                   # [1, RB]
    ohloT = (
        jax.lax.broadcasted_iota(jnp.int32, (NLO, rb), 0) == lo
    ).astype(jnp.float32)                                  # [NLO, RB]

    def bmat_of(vT):
        return jnp.concatenate(
            [
                (ohloT * vT[c : c + 1, :]).astype(jnp.bfloat16)
                for c in range(c_out)
            ],
            axis=0,
        )                                                  # [C*NLO, RB]

    bmats = []
    if precise:
        v_hi = valsT.astype(jnp.bfloat16).astype(jnp.float32)
        bmats = [bmat_of(v_hi), bmat_of(valsT - v_hi)]
    else:
        bmats = [bmat_of(valsT)]

    m_acc = None
    for k0 in range(0, nc, sub):
        ncb = min(sub, nc - k0)
        cl = chunks_ref[k0 : k0 + ncb, :]                  # [ncb, 1] i32
        cl = jnp.where(cl < 0, jnp.int32(-0x40000000), cl)
        eq = cl == hi                                      # [ncb, RB]
        ohT = eq.astype(jnp.bfloat16)
        m = jnp.max(eq.astype(jnp.int32), axis=0, keepdims=True)
        m_acc = m if m_acc is None else jnp.maximum(m_acc, m)
        acc = jax.lax.dot_general(
            ohT, bmats[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if precise:
            acc = acc + jax.lax.dot_general(
                ohT, bmats[1], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[k0 : k0 + ncb, :] += acc
    matched_ref[...] = m_acc


# Kernel operand layout: "lane" = every per-row operand [1, N] (rows in
# lanes; second matmul factor built transposed, A @ B^T). "sublane" = the
# round-2 formulation with [N, 1] operands, whose XLA relayout pads each
# row to a full 128-lane tile (~64 B/row/operand) — kept for A/B probing.
LAYOUT = "lane"


def prep_rows(pix, w, wl_idx, rb: int = DEFAULT_RB, layout: str = None):
    """Pad + relayout the per-row operands once for a SET of passes.

    A level whose chunk list splits into several <=256-chunk sub-passes
    must pay the pad/reshape once, not per sub-pass. Returns an opaque
    tuple for sandwich_pass_prepped."""
    layout = layout or LAYOUT
    n0 = pix.shape[0]
    pad = (-n0) % rb
    if pad:
        pix = jnp.concatenate([pix, jnp.full((pad,), -1, pix.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
        wl_idx = jnp.concatenate([wl_idx, jnp.zeros((pad,), wl_idx.dtype)])
    n = n0 + pad
    if layout == "lane":
        return (
            "lane",
            pix.reshape(1, n),
            w.reshape(1, n),
            wl_idx.astype(jnp.int32).reshape(1, n),
            n0,
            rb,
        )
    return (
        "sublane",
        pix.reshape(1, n),
        pix.reshape(n, 1),
        w.reshape(n, 1),
        wl_idx.astype(jnp.int32).reshape(n, 1),
        n0,
        rb,
    )


def sandwich_pass_prepped(tile, chunk_list, prepped, tbl, *, k_pool: int,
                          precise: bool = False):
    """sandwich_pass over operands already shaped by prep_rows."""
    nc, cw = tile.shape
    k = int(k_pool)
    c_out = cw // NLO
    assert cw == c_out * NLO, (cw, NLO)
    layout = prepped[0]
    if layout == "lane":
        _tag, pixc, w2, wl2, n0, rb = prepped
        n = pixc.shape[1]
        grid = (n // rb,)
        kern = functools.partial(
            _kernel_lane, nc=nc, rb=rb, k_pool=k, c_out=c_out,
            precise=precise, sub=SUB_CHUNKS,
        )
        out, matched = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nc, 1), lambda i: (0, 0)),
                pl.BlockSpec((1, rb), lambda i: (0, i)),
                pl.BlockSpec((1, rb), lambda i: (0, i)),
                pl.BlockSpec((1, rb), lambda i: (0, i)),
                pl.BlockSpec((k, c_out), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((nc, cw), lambda i: (0, 0)),
                pl.BlockSpec((1, rb), lambda i: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, cw), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.int32),
            ],
            interpret=INTERPRET,
        )(
            chunk_list.astype(jnp.int32).reshape(nc, 1),
            pixc, w2, wl2, tbl,
        )
        return tile + out, matched.reshape(n)[:n0]

    _tag, pixc, pixr, w2, wl2, n0, rb = prepped
    n = pixc.shape[1]
    grid = (n // rb,)
    kern = functools.partial(
        _kernel, nc=nc, rb=rb, k_pool=k, c_out=c_out, precise=precise
    )
    out, matched = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nc, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, rb), lambda i: (0, i)),
            pl.BlockSpec((rb, 1), lambda i: (i, 0)),
            pl.BlockSpec((rb, 1), lambda i: (i, 0)),
            pl.BlockSpec((rb, 1), lambda i: (i, 0)),
            pl.BlockSpec((k, c_out), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nc, cw), lambda i: (0, 0)),
            pl.BlockSpec((1, rb), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, cw), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=INTERPRET,
    )(
        chunk_list.astype(jnp.int32).reshape(nc, 1),
        pixc, pixr, w2, wl2, tbl,
    )
    return tile + out, matched.reshape(n)[:n0]


@functools.partial(
    jax.jit, static_argnames=("k_pool", "rb", "precise")
)
def sandwich_pass(tile, chunk_list, pix, w, wl_idx, tbl, *, k_pool: int,
                  rb: int = DEFAULT_RB, precise: bool = False):
    """Accumulate rows whose chunk (pix // 128) appears in `chunk_list`.

    tile:       [NC, C * 128] f32 — the running chunk-major accumulator.
    chunk_list: [NC] int32 — arbitrary chunk ids (one tile row each). Ids
                must be unique; a negative id matches nothing (padding).
    pix:        [N] int32 pixel ids; rows with pix outside [0, P) or whose
                chunk is not listed contribute nothing (and cost nothing).
    w:          [N] f32 weights (dead rows: 0).
    wl_idx:     [N] uint32/int32 wavelength-pool indices in [0, k_pool).
    tbl:        [k_pool, C] f32 per-pool-entry channel basis.

    Returns (tile + contributions, matched [N] i32) where matched[r] = 1
    iff row r's chunk appears in chunk_list (the cold-routing flag; padding
    rows report their chunk like any other). Exact in the one-hot factors;
    `vals` rounds to bf16 unless precise=True (two-term split, ~f32).

    Wide chunk lists are handled in-kernel: the one-hot compare + matmul
    loop over SUB_CHUNKS-sized slices of the (VMEM-resident) list and out
    tile, reusing the per-row transposed factor — so cost per row is
    ~(prologue + NC compares + 6*C*NC*NLO/256 FLOPs), not a rebuilt
    prologue per slice. The out tile [NC, C*128] f32 must fit VMEM
    (NC <= ~4096).
    """
    prepped = prep_rows(pix, w, wl_idx, rb)
    return sandwich_pass_prepped(
        tile, chunk_list, prepped, tbl, k_pool=k_pool, precise=precise
    )


def sandwich_oracle(tile, chunk_list, pix, w, wl_idx, tbl):
    """Pure-XLA exact oracle of sandwich_pass (tests; any backend).
    Returns (tile', matched) like the kernel."""
    nc, cw = tile.shape
    c_out = cw // NLO
    vals = tbl[wl_idx.astype(jnp.int32)] * w[:, None]       # [N, C]
    chunk = jnp.floor_divide(pix, NLO)
    lo = pix - chunk * NLO
    cl_eff = jnp.where(chunk_list < 0, jnp.int32(-0x40000000), chunk_list)
    ohT = (cl_eff[:, None] == chunk[None, :]).astype(jnp.float32)
    ohlo = (lo[:, None] == jnp.arange(NLO)[None, :]).astype(jnp.float32)
    parts = [ohT @ (ohlo * vals[:, c : c + 1]) for c in range(c_out)]
    matched = (jnp.max(ohT, axis=0) > 0).astype(jnp.int32)
    return tile + jnp.concatenate(parts, axis=1), matched


def assemble_image(tiles_and_lists, n_pixels: int, c_out: int):
    """Host-side: dense [P, C] image from (tile [NC, C*128], chunk_list [NC])
    pairs. Chunks listed in several tiles sum (they never are in the
    production two-pass split, but summing is the correct semantics)."""
    import numpy as np

    img = np.zeros((n_pixels, c_out), np.float64)
    for tile, cl in tiles_and_lists:
        t = np.asarray(tile, np.float64).reshape(-1, c_out, NLO)
        cl = np.asarray(cl)
        for k, chunk in enumerate(cl):
            if chunk < 0:
                continue
            base = int(chunk) * NLO
            img[base : base + NLO, :] += t[k].T
    return img
