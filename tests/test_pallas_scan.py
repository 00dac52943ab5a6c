"""Fused segmented-scan kernel parity vs the XLA formulation (interpreter)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ice_halo_sim_tpu.core import accum, pallas_scan


@pytest.fixture()
def interpret():
    pallas_scan.INTERPRET = True
    yield
    pallas_scan.INTERPRET = False


def _reference(sk, sw, tbl, shift, K):
    basis = np.asarray(tbl)[(np.asarray(sk) >> 1) & (K - 1)]
    chans = [basis[:, c] * np.asarray(sw) for c in range(3)]
    pix = np.asarray(sk) >> shift
    out = []
    for ch in chans:
        seg = np.zeros_like(ch)
        run = 0.0
        for i in range(len(ch)):
            if i > 0 and pix[i] != pix[i - 1]:
                run = 0.0
            run += ch[i]
            seg[i] = run
        out.append(seg)
    return out


def test_fused_scan_matches_reference(interpret):
    rng = np.random.default_rng(2)
    K, k_pool = 8, 8
    shift = (2 * k_pool).bit_length() - 1
    M = 4 * 128 * 2 * 2  # G=2 blocks of R=4... use rows_per_block=4
    # sorted keys over a small pixel space with multi-row runs
    pix = np.sort(rng.integers(0, 37, size=M))
    wl = rng.integers(0, K, size=M)
    sk = ((pix.astype(np.uint32) << shift) | (wl.astype(np.uint32) << 1))
    sw = rng.uniform(0.1, 1.0, size=M).astype(np.float32)
    tbl = rng.uniform(0.0, 2.0, size=(K, 3)).astype(np.float32)

    got = pallas_scan.fused_scan_call(
        jnp.asarray(sk), jnp.asarray(sw), jnp.asarray(tbl), shift, k_pool,
        rows_per_block=4,
    )
    want = _reference(sk, sw, tbl, shift, K)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-5, atol=2e-5)


def test_fused_scan_single_long_run(interpret):
    K, k_pool = 4, 4
    shift = (2 * k_pool).bit_length() - 1
    M = 4 * 128 * 3
    sk = np.full(M, (7 << shift) | (2 << 1), np.uint32)
    sw = np.ones(M, np.float32)
    tbl = np.arange(K * 3, dtype=np.float32).reshape(K, 3) + 1
    got = pallas_scan.fused_scan_call(
        jnp.asarray(sk), jnp.asarray(sw), jnp.asarray(tbl), shift, k_pool,
        rows_per_block=4,
    )
    want = _reference(sk, sw, tbl, shift, K)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4)


def test_fused_scan_all_distinct_and_pad(interpret):
    rng = np.random.default_rng(5)
    K, k_pool = 8, 8
    shift = (2 * k_pool).bit_length() - 1
    M = 4 * 128 * 2 + 300  # forces internal padding
    pix = np.arange(M, dtype=np.uint32)
    wl = rng.integers(0, K, size=M).astype(np.uint32)
    sk = (pix << shift) | (wl << 1)
    sw = rng.uniform(0.1, 1.0, size=M).astype(np.float32)
    tbl = rng.uniform(0.0, 2.0, size=(K, 3)).astype(np.float32)
    got = pallas_scan.fused_scan_call(
        jnp.asarray(sk), jnp.asarray(sw), jnp.asarray(tbl), shift, k_pool,
        rows_per_block=4,
    )
    want = _reference(sk, sw, tbl, shift, K)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-5, atol=2e-5)


def test_fold_spectral_uses_fused_scan(interpret):
    """End-to-end fold parity with the fused kernel active (no lanes)."""
    from functools import partial
    rng = np.random.default_rng(6)
    P, N, k_pool = 700, 5000, 8
    pix = rng.integers(-3, P + 3, size=N).astype(np.int32)
    w = rng.uniform(0.0, 1.0, size=N).astype(np.float32)
    wl = rng.integers(0, k_pool, size=N).astype(np.uint32)
    tbl = rng.uniform(0.1, 1.5, size=(k_pool, 3)).astype(np.float32)

    def basis_fn(idx):
        return jnp.asarray(tbl)[idx]

    acc = jnp.zeros((P, 3), jnp.float32)
    got = np.asarray(accum.fold_spectral(
        acc, jnp.asarray(pix), jnp.asarray(w), jnp.asarray(wl), k_pool, basis_fn
    ))
    want = np.zeros((P, 3))
    valid = (pix >= 0) & (pix < P) & (w > 0)
    for i in np.where(valid)[0]:
        want[pix[i]] += tbl[wl[i]] * w[i]
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_premerged_fold_matches_legacy(interpret):
    """fold_spectral_keys_premerged over a marker-tail scatter output ==
    fold_spectral_keys over the raw live rows (the round-5b glue-free
    kernel-path fold: scatter emits markers, scan emits key2)."""
    from ice_halo_sim_tpu.core import pallas_ops

    pallas_ops.INTERPRET = True
    try:
        rng = np.random.default_rng(11)
        P, K = 16384, 16
        shift = (2 * K).bit_length() - 1
        kr, blk, G = 12288, 4096, 5
        counts = rng.integers(300, 2200, G).astype(np.int32)
        keys = np.zeros((G, blk), np.uint32)
        wv = np.zeros((G, blk), np.float32)
        for g in range(G):
            c = counts[g]
            pix = rng.integers(0, P, c).astype(np.uint32)
            wl = rng.integers(0, K, c).astype(np.uint32)
            keys[g, :c] = (pix << shift) | (wl << 1)
            wv[g, :c] = rng.random(c).astype(np.float32)
        start = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        assert int(counts.sum()) <= kr

        def basis_fn(idx):
            i = idx.astype(jnp.float32)
            return jnp.stack([jnp.sin(i) + 2, jnp.cos(i) + 2, i * 0.01 + 1], -1)

        out_total = -(-(kr + P) // accum.BLOCK) * accum.BLOCK
        assert pallas_ops.marker_tail_ok(2, out_total, blk, kr, P)
        ck, cw = pallas_ops.scatter_blocks_multi(
            [jnp.asarray(keys), jnp.asarray(wv)], jnp.asarray(start),
            out_total, blk, marker_tail=(kr, P, shift, 2 * K - 1),
        )
        exp_markers = (np.arange(P, dtype=np.uint32) << shift) | np.uint32(
            2 * K - 1
        )
        np.testing.assert_array_equal(np.asarray(ck)[kr:kr + P], exp_markers)
        assert np.all(np.asarray(cw)[kr:] == 0.0)

        acc0 = jnp.zeros((P, 3), jnp.float32)
        got = accum.fold_spectral_keys_premerged(acc0, ck, cw, K, basis_fn)
        vk = np.concatenate([keys[g, : counts[g]] for g in range(G)])
        vw = np.concatenate([wv[g, : counts[g]] for g in range(G)])
        ref = accum.fold_spectral_keys(
            acc0, jnp.asarray(vk), jnp.asarray(vw), K, basis_fn
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)
    finally:
        pallas_ops.INTERPRET = False
