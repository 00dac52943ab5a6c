"""Pallas scatter kernel parity vs the XLA formulation (interpreter on CPU).

The kernel's contract is bit-identical forward-overwrite block scatter
(accum._marker_extract step 3 / compact_rows); on TPU it replaces the
fori_loop of dynamic_update_slice. These tests run the Pallas interpreter,
so the same kernel code is exercised without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ice_halo_sim_tpu.core import accum, pallas_ops


@pytest.fixture()
def interpret():
    pallas_ops.INTERPRET = True
    yield
    pallas_ops.INTERPRET = False


def _np_scatter(vals, start, out_len, block):
    out = np.zeros(out_len + block + pallas_ops.ALIGN, np.float64)
    for g in range(vals.shape[0]):
        s = int(start[g])
        if s >= out_len:
            continue
        out[s : s + block] = np.asarray(vals[g], np.float64)
    return out[:out_len]


def test_scatter_blocks_matches_reference(interpret):
    rng = np.random.default_rng(3)
    G, block = 5, 2048
    out_len = 6 * 1024
    vals = rng.uniform(size=(G, block)).astype(np.float32)
    cnt = np.array([700, 0, 2048, 13, 900], np.int64)
    start = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int32)
    got = np.asarray(
        pallas_ops.scatter_blocks(jnp.asarray(vals), jnp.asarray(start),
                                  out_len, block)
    )
    want = _np_scatter(vals, start, out_len, block).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_scatter_blocks_int_dtype(interpret):
    rng = np.random.default_rng(4)
    G, block = 3, 1024
    out_len = 2048
    vals = rng.integers(0, 2**31, size=(G, block)).astype(np.uint32)
    start = np.array([0, 500, 1800], np.int32)
    got = np.asarray(
        pallas_ops.scatter_blocks(jnp.asarray(vals), jnp.asarray(start),
                                  out_len, block)
    )
    out = np.zeros(out_len + block + pallas_ops.ALIGN, np.uint32)
    for g in range(G):
        s = int(start[g])
        if s < out_len:
            out[s : s + block] = vals[g]
    np.testing.assert_array_equal(got, out[:out_len])


def test_sort_accumulate_pallas_path_matches_scatter(interpret):
    rng = np.random.default_rng(5)
    P, N = 1500, 4000
    pix = rng.integers(-5, P + 5, size=N).astype(np.int32)
    vals = rng.uniform(size=(N, 3)).astype(np.float32)
    acc = jnp.zeros((P, 3), jnp.float32)
    got = np.asarray(
        accum.sort_accumulate(acc, jnp.asarray(pix), jnp.asarray(vals),
                              chunk=256)
    )
    want = np.asarray(
        accum.scatter_accumulate(acc, jnp.asarray(pix), jnp.asarray(vals))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_compact_rows_pallas_path(interpret):
    rng = np.random.default_rng(6)
    N = 40000
    w = rng.uniform(size=N).astype(np.float32)
    w[rng.uniform(size=N) < 0.7] = 0.0
    pix = rng.integers(0, 999, size=N).astype(np.int32)
    valid = w > 0
    keep = 32768
    (c_pix, c_w), n_valid = accum.compact_rows(
        jnp.asarray(valid), [jnp.asarray(pix), jnp.asarray(w)], keep
    )
    n_valid = int(n_valid)
    assert n_valid == int(valid.sum())
    c_pix, c_w = np.asarray(c_pix), np.asarray(c_w)
    live = c_w > 0
    assert live.sum() == n_valid
    # Multiset of (pix, w) pairs preserved for the live rows.
    got = sorted(zip(c_pix[live].tolist(), c_w[live].tolist()))
    want = sorted(zip(pix[valid].tolist(), w[valid].tolist()))
    assert got == want


def _np_pack(key, cols, thresh, block):
    N = key.shape[0]
    pk = np.full(N, 0xFFFFFFFF, np.uint32)
    pcols = [np.zeros_like(c) for c in cols]
    counts = []
    for g in range(N // block):
        sl = slice(g * block, (g + 1) * block)
        kb = key[sl]
        sel = kb < thresh
        n = int(sel.sum())
        counts.append(n)
        pk[g * block : g * block + n] = kb[sel]
        for c, pc in zip(cols, pcols):
            pc[g * block : g * block + n] = c[sl][sel]
    return pk, pcols, np.asarray(counts, np.int32)


@pytest.mark.parametrize("block", [1024, 4096])
@pytest.mark.parametrize("density", [0.0, 0.07, 0.5, 0.93, 1.0])
def test_pack_valid_blocks_matches_oracle(interpret, block, density):
    rng = np.random.default_rng(int(block + density * 100))
    G = 3
    N = G * block
    key = rng.integers(0, 1 << 20, N).astype(np.uint32)
    dead = rng.random(N) >= density
    key[dead] = 0xFFFFFFFF
    w = rng.uniform(0.1, 1.0, N).astype(np.float32)
    m = rng.integers(0, 1 << 31, N).astype(np.uint32)
    pk, (pw, pm), counts = jax.jit(
        lambda k, a, b: pallas_ops.pack_valid_blocks(
            k, [a, b], 0xFFFFFFFF, block)
    )(key, w, m)
    ek, (ew, em), ecnt = _np_pack(key, [w, m], 0xFFFFFFFF, block)
    np.testing.assert_array_equal(np.asarray(counts), ecnt)
    np.testing.assert_array_equal(np.asarray(pk), ek)
    np.testing.assert_array_equal(np.asarray(pw), ew)
    np.testing.assert_array_equal(np.asarray(pm), em)


def test_pack_valid_blocks_threshold_semantics(interpret):
    # Extraction-style predicate: key2 < P marks markers; stability keeps
    # them in pixel order.
    block, P = 1024, 300
    rng = np.random.default_rng(9)
    key = rng.integers(0, 2 * P, 2 * block).astype(np.uint32)
    v = rng.uniform(size=2 * block).astype(np.float32)
    pk, (pv,), counts = jax.jit(
        lambda k, a: pallas_ops.pack_valid_blocks(k, [a], P, block)
    )(key, v)
    ek, (ev,), ecnt = _np_pack(key, [v], P, block)
    np.testing.assert_array_equal(np.asarray(counts), ecnt)
    np.testing.assert_array_equal(np.asarray(pk), ek)
    np.testing.assert_array_equal(np.asarray(pv), ev)


def test_pack_valid_blocks_pads_partial_supergroup(interpret):
    # G not a multiple of SUP exercises the pad path.
    block = 1024
    G = pallas_ops.SUP + 3
    rng = np.random.default_rng(11)
    key = rng.integers(0, 100, G * block).astype(np.uint32)
    key[rng.random(G * block) < 0.5] = 0xFFFFFFFF
    w = rng.uniform(size=G * block).astype(np.float32)
    pk, (pw,), counts = jax.jit(
        lambda k, a: pallas_ops.pack_valid_blocks(k, [a], 0xFFFFFFFF, block)
    )(key, w)
    ek, (ew,), ecnt = _np_pack(key, [w], 0xFFFFFFFF, block)
    np.testing.assert_array_equal(np.asarray(counts), ecnt)
    np.testing.assert_array_equal(np.asarray(pk), ek)
    np.testing.assert_array_equal(np.asarray(pw), ew)
