"""Image accumulation strategies.

The hot sink of the renderer is scatter-adding per-exit XYZ contributions
into the image (the reference uses CPU stores / GPU atomics,
accum_shared.h:29-75). On TPU, XLA lowers arbitrary-index scatter to a
near-serial update loop (~12 M updates/s measured on v5e) — 30x slower
than everything else combined — while ``jax.lax.sort`` runs at hundreds of
millions of rows/s. ``sort_accumulate`` therefore reformulates scatter-add
with NO scatters or gathers at all:

  1. Sort the contributions TOGETHER with one marker row per pixel
     (key = pixel * 2 + is_marker, so a pixel's marker lands directly
     after all its contributions).
  2. Segmented inclusive scan over the sorted values (chunked two-level
     formulation: in-chunk cumsum/cummax + a tiny cross-chunk carry scan),
     so each marker row holds its pixel's total.
  3. A second stable sort by not-is-marker compacts the P marker rows to
     the front IN PIXEL ORDER — that prefix IS the dense image.

Requires vals >= 0 (radiance contributions are), because the in-chunk
"latest group start" is recovered with a running max over the monotone
cumsum. Accuracy matches direct scatter-add to ~1 ulp of per-pixel sums
(segment-local arithmetic; no grand-total cancellation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -3.0e38  # effectively -inf for f32 cummax


def scatter_accumulate(acc, pix, vals):
    """Baseline: XLA scatter-add. pix < 0 or >= P rows are dropped."""
    P = acc.shape[0]
    safe = jnp.where((pix >= 0) & (pix < P), pix, P)
    return acc.at[safe].add(vals, mode="drop")


def sort_accumulate(acc, pix, vals, chunk: int = 2048):
    """Scatter-free accumulate: acc + bincount-by-pixel of vals.

    acc: [P, C] float32. pix: [N] int32 (invalid rows: any value outside
    [0, P)). vals: [N, C] float32, vals >= 0.
    """
    P, C = acc.shape
    N = pix.shape[0]
    # Invalid rows get a key beyond every marker; their values must be
    # zeroed (they still participate in the sort, then fall off the end).
    valid = (pix >= 0) & (pix < P)
    key_contrib = jnp.where(valid, pix * 2, 2 * P)
    vals = jnp.where(valid[:, None], vals, 0.0)

    keys = jnp.concatenate([key_contrib, jnp.arange(P, dtype=pix.dtype) * 2 + 1])
    marker = jnp.concatenate(
        [jnp.zeros(N, jnp.float32), jnp.ones(P, jnp.float32)]
    )
    M = N + P
    # Pad to a chunk multiple with beyond-everything keys.
    G = -(-M // chunk)
    pad = G * chunk - M
    if pad:
        keys = jnp.concatenate([keys, jnp.full(pad, 2 * P + 2, keys.dtype)])
        marker = jnp.concatenate([marker, jnp.zeros(pad, jnp.float32)])
    chans = [
        jnp.concatenate([vals[:, c], jnp.zeros(P + pad)]) for c in range(C)
    ]

    s = jax.lax.sort(tuple([keys] + chans + [marker]), num_keys=1)
    sk, sv, sm = s[0], jnp.stack(s[1 : 1 + C], axis=-1), s[1 + C]

    # Group-start flags on the sorted sequence (pixel id change).
    first = jnp.concatenate(
        [jnp.ones(1, bool), (sk[1:] >> 1) != (sk[:-1] >> 1)]
    )

    # --- chunked segmented inclusive scan ---------------------------------
    svg = sv.reshape(G, chunk, C)
    fg = first.reshape(G, chunk)
    cs = jnp.cumsum(svg, axis=1)                              # [G, L, C]
    # cs value just BEFORE each row (exclusive prefix).
    cs_prev = cs - svg
    # Latest in-chunk group start's exclusive prefix: running max works
    # because cs is monotone (vals >= 0).
    base = jax.lax.cummax(
        jnp.where(fg[..., None], cs_prev, _NEG), axis=1
    )
    started_in_chunk = jnp.cumsum(fg, axis=1) > 0             # [G, L]
    wseg = jnp.where(started_in_chunk[..., None], cs - base, cs)

    # Cross-chunk carry: chain through chunks whose leading group spans.
    has_start = jnp.any(fg, axis=1)                           # [G]
    tail = wseg[:, -1, :]                                     # [G, C]

    def carry_step(carry_in, x):
        tail_g, has_g = x
        carry_out = tail_g + jnp.where(has_g, 0.0, carry_in)
        return carry_out, carry_in

    _, carry_in = jax.lax.scan(
        carry_step, jnp.zeros(C), (tail, has_start)
    )                                                          # [G, C]
    seg = wseg + jnp.where(
        started_in_chunk[..., None], 0.0, carry_in[:, None, :]
    )
    seg = seg.reshape(G * chunk, C)

    # --- extract marker rows in pixel order -------------------------------
    s2 = jax.lax.sort(
        tuple([1.0 - sm] + [seg[:, c] for c in range(C)]),
        num_keys=1,
        is_stable=True,
    )
    totals = jnp.stack(s2[1 : 1 + C], axis=-1)[:P]
    return acc + totals


def accumulate(acc, pix, vals, method: str = "auto"):
    """Dispatch: 'scatter' | 'sort' | 'auto' (sort on TPU, scatter else)."""
    if method == "auto":
        method = (
            "sort"
            if jax.default_backend() in ("tpu", "axon")
            else "scatter"
        )
    if method == "sort":
        return sort_accumulate(acc, pix, vals)
    return scatter_accumulate(acc, pix, vals)
