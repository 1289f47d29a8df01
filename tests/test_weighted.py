"""Weighted SpMM (per-edge value plane) tests vs scipy with real values."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.ops import spmm, spmm_pallas_weighted


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


def test_weighted_empty(rng):
    n = 100
    plan = csr_preprocess(
        np.zeros(n + 1, np.int64), np.zeros(0, np.int64), n,
        PlanConfig(32, 128), values=np.zeros(0, np.float32),
    )
    out = spmm(plan, jnp.ones((n, 16), jnp.float32))
    assert float(jnp.abs(out).max()) == 0.0
