#!/usr/bin/env python
"""Minimal repro of the "pyramid blob" bug: a geometry feasibility test
computed via einsum silently runs at the TPU stack's DEFAULT matmul
precision (bfloat16 on current stacks), not f32.

History: round 4 diagnosed the blob (81% of image mass within 3 px of the
sun on pyramid scenes) as a miscompile of the LOOPED NF=20 trace and
worked around it by host-unrolling multi-batch dispatches. Round 5's
parity battery re-caught the blob through every compile path — kernel and
XLA, looped and unrolled, r4 and r5 code — on the current stack, and the
bisection landed in the geometry BUILDER, not the trace:

    slack = einsum("ncx,px->ncp", x, plane_n) + plane_d

lowers the 3-element contraction onto the MXU at default matmul
precision. Candidate vertex coordinates reach |x| ~ 1e4 while the
feasibility tolerance is 5e-5, so bf16 rounding (~2^-8 relative) wiped
out every slack test: all non-basal pyramid faces were marked absent and
rays sailed through two parallel basal slabs nearly undeviated — the
blob. (Prism faces survived because the prism builder was already
componentwise.) Whether the einsum folds to bf16 evidently depends on
surrounding compile context, which is why r4 saw loop-vs-unroll diverge.

The fix (core/pyramid.py): spell the contraction out componentwise —
elementwise VPU math is always f32. This script demonstrates the
divergence directly; scripts/tpu_smoke.py carries standing guards
(pyramid pool face presence + the engine-level ring structure).

PASS = einsum and componentwise slack agree to f32 tolerance on this
backend (fixed stack or safe default). FAIL = the precision trap exists:
any geometry-sized einsum here MUST be componentwise or precision-pinned.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rs = np.random.RandomState(7)
    # Candidate vertices at realistic magnitudes (far plane intersections).
    x = jnp.asarray(rs.uniform(-2e4, 2e4, size=(20, 171, 3)), jnp.float32)
    n = jnp.asarray(rs.normal(size=(20, 3)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    d = jnp.asarray(rs.uniform(-1, 1, size=(20,)), jnp.float32)

    @jax.jit
    def both(x, n, d):
        s_einsum = jnp.einsum("ncx,px->ncp", x, n) + d[None, None, :]
        s_comp = (
            x[..., 0, None] * n[None, None, :, 0]
            + x[..., 1, None] * n[None, None, :, 1]
            + x[..., 2, None] * n[None, None, :, 2]
            + d[None, None, :]
        )
        return s_einsum, s_comp

    a, b = both(x, n, d)
    diff = float(jnp.max(jnp.abs(a - b)))
    tol = 5e-5  # the geometry feasibility tolerance
    print(f"max |einsum - componentwise| slack: {diff:.6g} "
          f"(feasibility tol {tol:g})")
    if diff > tol:
        print("FAIL: default-precision einsum is NOT f32 on this backend — "
              "geometry contractions must stay componentwise")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
