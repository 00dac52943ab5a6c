"""Hardware-dependent lowering choices.

One computation, two lowerings: XLA:CPU handles arbitrary-index gathers
well, while XLA:TPU lowers them near-serially (~45 M rows/s measured on
v5e) and wants dense one-hot masked reductions instead. The numerical
result is identical; only the op choice differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def prefer_onehot() -> bool:
    """True on backends where per-row gathers are pathological (TPU)."""
    return jax.default_backend() in ("tpu", "axon")


def take_rows(arr, idx, axis: int = -2):
    """arr[..., N, ...] indexed by per-row idx along `axis` — gather on CPU,
    one-hot masked sum on TPU. idx indexes a SMALL axis (<= a few hundred).

    Supports the two layouts used in the hot path:
      arr [B, N]    + idx [B] -> [B]        (axis=-1)
      arr [B, N, C] + idx [B] -> [B, C]     (axis=-2)
      arr [N]       + idx [B] -> [B]        (axis=0, shared table)
    """
    if not prefer_onehot():
        if arr.ndim == 1:
            return arr[idx]
        if axis == -2:
            return jnp.take_along_axis(arr, idx[..., None, None], axis=-2)[..., 0, :]
        return jnp.take_along_axis(arr, idx[..., None], axis=-1)[..., 0]
    if arr.ndim == 1:
        oh = jnp.arange(arr.shape[0], dtype=idx.dtype)[None, :] == idx[..., None]
        return jnp.sum(jnp.where(oh, arr[None, :], 0), axis=-1)
    n = arr.shape[axis]
    oh = jnp.arange(n, dtype=idx.dtype)[None, :] == idx[..., None]   # [B, N]
    if axis == -2:
        return jnp.sum(jnp.where(oh[..., None], arr, 0), axis=-2)
    return jnp.sum(jnp.where(oh, arr, 0), axis=-1)
