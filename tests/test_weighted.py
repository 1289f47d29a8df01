"""Weighted SpMM (per-edge value plane) tests vs scipy with real values."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import (
    PlanConfig,
    csr_preprocess,
    csr_transpose,
    edge_slot_map,
)
from voltrix_spmm_tpu.ops import (
    spmm,
    spmm_pallas_weighted,
    spmm_weighted_ad,
    spmm_weighted_dvalues,
)


def make_weighted(rng, n=500, density=0.02):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = rng.standard_normal(a.nnz).astype(np.float32)
    return a


def test_weighted_matches_scipy(rng):
    a = make_weighted(rng)
    n, d = a.shape[0], 96
    feat = rng.standard_normal((n, d)).astype(np.float32)
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(128, 128), values=a.data
    )
    assert plan.values is not None
    out = np.asarray(spmm_pallas_weighted(plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, a @ feat, rtol=1e-4, atol=1e-3)


def test_weighted_auto_dispatch(rng):
    a = make_weighted(rng, n=300)
    n, d = a.shape[0], 64
    feat = rng.standard_normal((n, d)).astype(np.float32)
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(128, 128), values=a.data
    )
    out = np.asarray(spmm(plan, jnp.asarray(feat)))  # impl="auto"
    np.testing.assert_allclose(out, a @ feat, rtol=1e-4, atol=1e-3)


def test_weighted_duplicate_edges_sum(rng):
    # duplicate (row, col) entries sum their values (scipy convention)
    n, d = 64, 32
    rows = np.array([0, 0, 1, 5])
    cols = np.array([3, 3, 2, 5])
    vals = np.array([1.5, 2.5, -1.0, 4.0], np.float32)
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()  # sums dups
    coo_dup = sp.coo_matrix(
        (vals, (rows, cols)), shape=(n, n)
    )  # keep raw duplicates for our preprocessor
    order = np.lexsort((coo_dup.col, coo_dup.row))
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(coo_dup.row[order], minlength=n), out=indptr[1:])
    plan = csr_preprocess(
        indptr, coo_dup.col[order], n, PlanConfig(32, 128),
        values=coo_dup.data[order],
    )
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm(plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, a @ feat, rtol=1e-5, atol=1e-4)


def test_weighted_unroll_and_unaligned(rng):
    a = make_weighted(rng, n=700, density=0.03)
    n, d = a.shape[0], 100  # unaligned everything
    feat = rng.standard_normal((n, d)).astype(np.float32)
    plan = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(64, 128, block_unroll=2), values=a.data,
    )
    out = np.asarray(spmm(plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, a @ feat, rtol=1e-4, atol=1e-3)


def test_weighted_normalized_adjacency_gcn_use(rng):
    # the canonical GNN use: D^-1 A aggregation in one SpMM
    a = make_weighted(rng, n=256, density=0.05)
    a.data[:] = np.abs(a.data) + 0.1
    n, d = a.shape[0], 32
    deg = np.maximum(np.asarray(a.sum(1)).ravel(), 1e-6)
    norm = sp.diags(1.0 / deg) @ a
    norm = norm.tocsr()
    plan = csr_preprocess(
        norm.indptr, norm.indices, n, PlanConfig(128, 128), values=norm.data
    )
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm(plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, norm @ feat, rtol=1e-4, atol=1e-3)


def test_weighted_config_validation(rng):
    a = make_weighted(rng, n=128)
    with pytest.raises(AssertionError):
        csr_preprocess(
            a.indptr, a.indices, 128,
            PlanConfig(128, 128, gather_segment=8), values=a.data,
        )
    with pytest.raises(AssertionError):
        csr_preprocess(
            a.indptr, a.indices, 128,
            PlanConfig(128, 128, cluster_cols=True), values=a.data,
        )


def test_csr_transpose_matches_scipy(rng):
    a = make_weighted(rng, n=300, density=0.03)
    at = a.T.tocsr()
    at.sort_indices()
    ptr_t, idx_t, vals_t = csr_transpose(a.indptr, a.indices, 300, a.data)
    np.testing.assert_array_equal(ptr_t, at.indptr)
    np.testing.assert_array_equal(idx_t, at.indices)
    np.testing.assert_allclose(vals_t, at.data, rtol=1e-6)


def test_csr_transpose_rectangular(rng):
    a = sp.random(64, 200, density=0.05, format="csr", random_state=rng)
    a.data[:] = rng.standard_normal(a.nnz).astype(np.float32)
    ptr_t, idx_t, vals_t = csr_transpose(
        a.indptr, a.indices, 64, a.data, num_cols=200
    )
    at = a.T.tocsr()
    at.sort_indices()
    np.testing.assert_array_equal(ptr_t, at.indptr)
    np.testing.assert_array_equal(idx_t, at.indices)
    np.testing.assert_allclose(vals_t, at.data, rtol=1e-6)


def _weighted_plans(a, n, cfg=PlanConfig(128, 128)):
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, values=a.data)
    ptr_t, idx_t, vals_t = csr_transpose(a.indptr, a.indices, n, a.data)
    plan_t = csr_preprocess(ptr_t, idx_t, n, cfg, values=vals_t)
    return plan, plan_t


def test_weighted_grad_feat_matches_dense(rng):
    a = make_weighted(rng, n=260, density=0.04)
    n, d = 260, 64
    plan, plan_t = _weighted_plans(a, n)
    feat = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    dfeat = jax.grad(
        lambda x: jnp.sum(spmm_weighted_ad(plan, plan_t, x) * g)
    )(feat)
    want = a.T @ np.asarray(g)
    np.testing.assert_allclose(np.asarray(dfeat), want, rtol=1e-4, atol=1e-3)


def test_weighted_grad_values_matches_dense(rng):
    a = make_weighted(rng, n=260, density=0.04)
    n, d = 260, 64
    cfg = PlanConfig(128, 128)
    plan, plan_t = _weighted_plans(a, n, cfg)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    g = rng.standard_normal((n, d)).astype(np.float32)

    def loss(values):
        p = dataclasses.replace(plan, values=values)
        return jnp.sum(spmm_weighted_ad(p, plan_t, jnp.asarray(feat)) * g)

    dplane = np.asarray(jax.grad(loss)(jnp.asarray(plan.values)))

    # dense expectation: dV[b, r, l] = g[w*H + r] . feat[hind[b, l]]
    # where the bitmask has an edge, 0 elsewhere
    from voltrix_spmm_tpu.format import expand_bitmask_np

    H = cfg.block_h
    bits = expand_bitmask_np(np.asarray(plan.bitmask), H)
    hind = np.asarray(plan.hind)
    wob = np.asarray(plan.window_of_block)
    g_pad = np.zeros((plan.padded_nodes, d), np.float32)
    g_pad[:n] = g
    want = np.einsum(
        "brd,bld->brl",
        g_pad.reshape(plan.num_windows, H, d)[wob],
        feat[np.minimum(hind, n - 1)] * (hind < n)[..., None],
    ) * bits
    np.testing.assert_allclose(dplane, want, rtol=1e-4, atol=1e-3)
    # off-edge slots carry no gradient
    assert np.abs(dplane[bits == 0]).max() == 0.0


def test_edge_slot_map_roundtrip(rng):
    a = make_weighted(rng, n=500, density=0.02)
    plan = csr_preprocess(
        a.indptr, a.indices, 500, PlanConfig(128, 128), values=a.data
    )
    slots = edge_slot_map(plan, a.indptr, a.indices)
    cfg = plan.config
    plane = np.zeros(plan.total_blocks * cfg.block_h * cfg.block_w, np.float32)
    np.add.at(plane, slots, a.data.astype(np.float32))
    np.testing.assert_allclose(
        plane.reshape(np.asarray(plan.values).shape),
        np.asarray(plan.values),
        rtol=1e-6,
    )


def test_learned_edge_weights_end_to_end(rng):
    # per-edge parameters -> differentiable plane scatter -> weighted
    # SpMM; gradient wrt the edge parameters matches the dense formula
    # dL/dw_e = g[row_e] . feat[col_e]
    a = make_weighted(rng, n=200, density=0.03)
    n, d = 200, 32
    cfg = PlanConfig(64, 128)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, values=a.data)
    ptr_t, idx_t, vals_t = csr_transpose(a.indptr, a.indices, n, a.data)
    plan_t = csr_preprocess(ptr_t, idx_t, n, cfg, values=vals_t)
    slots = jnp.asarray(edge_slot_map(plan, a.indptr, a.indices))
    feat = rng.standard_normal((n, d)).astype(np.float32)
    g = rng.standard_normal((n, d)).astype(np.float32)
    plane_size = plan.total_blocks * cfg.block_h * cfg.block_w

    def loss(w):
        plane = (
            jnp.zeros(plane_size, jnp.float32)
            .at[slots]
            .add(w)
            .reshape(plan.total_blocks, cfg.block_h, cfg.block_w)
        )
        p = dataclasses.replace(plan, values=plane)
        return jnp.sum(spmm_weighted_ad(p, plan_t, jnp.asarray(feat)) * g)

    w0 = jnp.asarray(a.data.astype(np.float32))
    dw = np.asarray(jax.grad(loss)(w0))
    rows = np.repeat(np.arange(n), np.diff(a.indptr))
    want = np.sum(g[rows] * feat[a.indices], axis=1)
    np.testing.assert_allclose(dw, want, rtol=1e-4, atol=1e-3)
    # and the forward through the scatter equals the direct weighted path
    plane = (
        jnp.zeros(plane_size, jnp.float32)
        .at[slots]
        .add(w0)
        .reshape(plan.total_blocks, cfg.block_h, cfg.block_w)
    )
    out = spmm_pallas_weighted(
        dataclasses.replace(plan, values=plane), jnp.asarray(feat)
    )
    np.testing.assert_allclose(
        np.asarray(out), a @ feat, rtol=1e-4, atol=1e-3
    )


def test_dvalues_unroll(rng):
    # unrolled plans exercise the (unroll, H, K) out-tile accumulation
    a = make_weighted(rng, n=400, density=0.03)
    n, d = 400, 96
    cfg = PlanConfig(64, 128, block_unroll=2)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, values=a.data)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    g = rng.standard_normal((n, d)).astype(np.float32)
    dv = np.asarray(spmm_weighted_dvalues(plan, jnp.asarray(feat), jnp.asarray(g)))

    from voltrix_spmm_tpu.format import expand_bitmask_np

    H = cfg.block_h
    bits = expand_bitmask_np(np.asarray(plan.bitmask), H)
    hind = np.asarray(plan.hind)
    wob = np.asarray(plan.window_of_block)
    g_pad = np.zeros((plan.padded_nodes, d), np.float32)
    g_pad[:n] = g
    want = np.einsum(
        "brd,bld->brl",
        g_pad.reshape(plan.num_windows, H, d)[wob],
        feat[np.minimum(hind, n - 1)] * (hind < n)[..., None],
    ) * bits
    np.testing.assert_allclose(dv, want, rtol=1e-4, atol=1e-3)


def test_sddmm_matches_scipy(rng):
    from voltrix_spmm_tpu.ops import sddmm

    a = make_weighted(rng, n=300, density=0.04)
    n, d = 300, 48
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.standard_normal((n, d)).astype(np.float32)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(64, 128))
    slots = edge_slot_map(plan, a.indptr, a.indices)
    vals = np.asarray(
        sddmm(plan, jnp.asarray(x), jnp.asarray(y), per_edge=jnp.asarray(slots))
    )
    rows = np.repeat(np.arange(n), np.diff(a.indptr))
    want = np.sum(x[rows] * y[a.indices], axis=1)
    np.testing.assert_allclose(vals, want, rtol=1e-4, atol=1e-3)
    # plane form is zero off-edge and feeds straight back into SpMM
    plane = sddmm(plan, jnp.asarray(x), jnp.asarray(y))
    import dataclasses

    out = spmm(
        dataclasses.replace(plan, values=plane), jnp.asarray(y)
    )
    sc = sp.csr_matrix((want, a.indices, a.indptr), shape=(n, n))
    np.testing.assert_allclose(
        np.asarray(out), sc @ y, rtol=1e-3, atol=1e-2
    )


def test_weighted_empty(rng):
    n = 100
    plan = csr_preprocess(
        np.zeros(n + 1, np.int64), np.zeros(0, np.int64), n,
        PlanConfig(32, 128), values=np.zeros(0, np.float32),
    )
    out = spmm(plan, jnp.ones((n, 16), jnp.float32))
    assert float(jnp.abs(out).max()) == 0.0


def test_weighted_plan_rejected_by_binary_kernels(rng):
    """A weighted plan entering a binary entry point must raise, not
    silently return the binary result (round-2 verdict Weak #1)."""
    from voltrix_spmm_tpu.ops import (
        spmm_pallas,
        spmm_pallas_fused,
        spmm_pallas_int8,
        spmm_streamed,
    )

    a = make_weighted(rng, n=300)
    n = a.shape[0]
    feat = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(128, 128), values=a.data
    )
    for fn in (spmm_pallas, spmm_pallas_fused, spmm_pallas_int8):
        with pytest.raises(ValueError, match="value plane"):
            fn(plan, feat)
    with pytest.raises(ValueError, match="value plane"):
        spmm_streamed(plan, feat, num_chunks=2)
    with pytest.raises(ValueError, match="value plane"):
        spmm(plan, feat, impl="pregather")
    # pre-sliced streamed lists are rejected too (stream.py slices the
    # value plane into sub-plans the binary kernel would ignore)
    from voltrix_spmm_tpu.format.stream import slice_plan_windows

    subs = slice_plan_windows(plan, 2)
    with pytest.raises(ValueError, match="value plane"):
        spmm_streamed(subs, feat)


def test_weighted_block_h_validated_at_build(rng):
    a = make_weighted(rng, n=128)
    with pytest.raises(ValueError, match="block_h % 32"):
        csr_preprocess(
            a.indptr, a.indices, 128, PlanConfig(8, 128), values=a.data
        )
