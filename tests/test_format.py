"""Format/preprocessing tests: plan construction vs scipy dense oracle.

Mirrors the verification role of the reference's preprocessing path
(bmat_kernels.cuh:264-320) — here checked exactly by dense
reconstruction, on CPU, no accelerator needed.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import (
    PlanConfig,
    csr_preprocess,
    plan_stats,
    plan_to_dense,
)


def random_csr(rng, n, density):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    return a


@pytest.mark.parametrize("n,density", [(64, 0.2), (500, 0.05), (1000, 0.01)])
@pytest.mark.parametrize(
    "block_h,block_w", [(128, 128), (32, 128), (64, 256), (16, 8)]
)
def test_plan_reconstructs_dense(rng, n, density, block_h, block_w):
    a = random_csr(rng, n, density)
    cfg = PlanConfig(block_h=block_h, block_w=block_w)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    dense = plan_to_dense(plan)
    np.testing.assert_array_equal(dense, (a.toarray() != 0).astype(np.uint8))


def test_block_ptr_consistency(rng):
    n = 300
    a = random_csr(rng, n, 0.03)
    cfg = PlanConfig(block_h=32, block_w=128)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    bp = np.asarray(plan.block_ptr)
    assert bp[0] == 0
    assert bp[-1] == plan.total_blocks
    assert (np.diff(bp) >= 0).all()
    # window_of_block matches the ragged expansion of block_ptr
    wob = np.asarray(plan.window_of_block)
    expect = np.repeat(np.arange(plan.num_windows), np.diff(bp))
    np.testing.assert_array_equal(wob, expect)


def test_dedup_and_compression(rng):
    # A window whose rows share neighbors: unique columns are compressed so
    # the per-window block count follows uniques, not nnz (the "balanced"
    # property, reference bmat_kernels.cuh:298-299).
    n = 64
    rows = np.repeat(np.arange(32), 4)
    cols = np.tile(np.array([1, 5, 9, 13]), 32)  # all rows hit same 4 cols
    a = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    cfg = PlanConfig(block_h=32, block_w=128)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    # 2 windows; window 0 has only 4 unique cols -> 1 block; window 1 is
    # empty and gets one zero-bit padding block (visited so its output
    # tile is zeroed in-kernel instead of by a full-output rewrite)
    assert plan.total_blocks == 2
    assert not plan.has_empty_windows
    assert np.asarray(plan.bitmask)[1].max() == 0
    np.testing.assert_array_equal(
        np.sort(np.asarray(plan.hind)[0, :4]), [1, 5, 9, 13]
    )
    dense = plan_to_dense(plan)
    np.testing.assert_array_equal(dense, (a.toarray() != 0).astype(np.uint8))


def test_empty_matrix():
    n = 100
    indptr = np.zeros(n + 1, dtype=np.int32)
    indices = np.zeros(0, dtype=np.int32)
    plan = csr_preprocess(indptr, indices, n, backend="numpy")
    assert plan.total_blocks == 0
    assert plan.num_edges == 0
    assert plan_to_dense(plan).sum() == 0


def test_duplicate_edges_are_binarized(rng):
    # CSR with duplicate (r, c) entries must still produce a 0/1 matrix
    indices = np.array([3, 3, 7, 7, 7], dtype=np.int32)
    indptr = np.array([0, 5, 5, 5, 5, 5, 5, 5, 5], dtype=np.int32)
    n = 8
    cfg = PlanConfig(block_h=32, block_w=128)
    plan = csr_preprocess(indptr, indices, n, cfg, backend="numpy")
    dense = plan_to_dense(plan)
    assert plan.num_edges == 2
    assert dense[0, 3] == 1 and dense[0, 7] == 1
    assert dense.sum() == 2


@pytest.mark.parametrize("seg", [4, 8, 16])
@pytest.mark.parametrize("n,density", [(500, 0.05), (333, 0.02)])
def test_coverage_plan_reconstructs_dense(rng, n, density, seg):
    a = random_csr(rng, n, density)
    cfg = PlanConfig(block_h=32, block_w=128, gather_segment=seg)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    dense = plan_to_dense(plan)
    np.testing.assert_array_equal(dense, (a.toarray() != 0).astype(np.uint8))
    # covered lanes form seg-aligned runs of consecutive source rows
    hind = np.asarray(plan.hind).reshape(plan.total_blocks, -1, seg)
    starts = hind[:, :, 0]
    assert (starts % seg == 0).all()
    expect = starts[:, :, None] + np.arange(seg)
    np.testing.assert_array_equal(hind, expect)


@pytest.mark.parametrize(
    "n,density,block_h,block_w,seg",
    [
        (500, 0.05, 128, 128, 1),
        (1000, 0.01, 32, 128, 1),
        (300, 0.08, 64, 256, 1),
        (500, 0.05, 128, 128, 8),
        (1000, 0.01, 32, 128, 16),
    ],
)
def test_native_matches_numpy(rng, n, density, block_h, block_w, seg):
    from voltrix_spmm_tpu.runtime import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    a = random_csr(rng, n, density)
    cfg = PlanConfig(block_h=block_h, block_w=block_w, gather_segment=seg)
    p_np = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    p_cc = csr_preprocess(a.indptr, a.indices, n, cfg, backend="native")
    np.testing.assert_array_equal(p_cc.bitmask, p_np.bitmask)
    np.testing.assert_array_equal(p_cc.hind, p_np.hind)
    np.testing.assert_array_equal(p_cc.block_ptr, p_np.block_ptr)
    np.testing.assert_array_equal(p_cc.window_of_block, p_np.window_of_block)
    assert p_cc.num_edges == p_np.num_edges
    assert p_cc.total_blocks == p_np.total_blocks


def test_native_duplicate_edges(rng):
    from voltrix_spmm_tpu.runtime import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    indices = np.array([3, 3, 7, 7, 7], dtype=np.int32)
    indptr = np.array([0, 5, 5, 5, 5, 5, 5, 5, 5], dtype=np.int32)
    cfg = PlanConfig(block_h=32, block_w=128)
    plan = csr_preprocess(indptr, indices, 8, cfg, backend="native")
    assert plan.num_edges == 2
    dense = plan_to_dense(plan)
    assert dense.sum() == 2 and dense[0, 3] == 1 and dense[0, 7] == 1


def test_stats(rng):
    n = 256
    a = random_csr(rng, n, 0.05)
    plan = csr_preprocess(a.indptr, a.indices, n, backend="numpy")
    s = plan_stats(plan)
    assert s["nnz"] == plan.num_edges
    assert 0 < s["fill_ratio"] <= 1.0
    assert s["gather_expansion"] >= plan.config.block_w / max(plan.num_edges, 1)


def test_native_spmm_oracle_matches_scipy(rng):
    from voltrix_spmm_tpu.runtime import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    from voltrix_spmm_tpu.ops import spmm_scipy
    from voltrix_spmm_tpu.runtime import native_spmm_oracle

    n, d = 800, 64
    a = random_csr(rng, n, 0.03)
    x = rng.standard_normal((n, d)).astype(np.float32)
    out = native_spmm_oracle(a.indptr, a.indices, n, x)
    ref = spmm_scipy(a.indptr, a.indices, n, x)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_plan_save_load_roundtrip(rng, tmp_path):
    import jax.numpy as jnp

    from voltrix_spmm_tpu.format import SpmmPlan
    from voltrix_spmm_tpu.ops import spmm

    n, d = 700, 48
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    a.data[:] = rng.standard_normal(a.nnz).astype(np.float32)
    cases = [
        (PlanConfig(128, 128, block_unroll=2, cluster_cols=True), {}),
        (PlanConfig(128, 128), {"values": a.data}),  # weighted plane too
    ]
    for cfg, kwargs in cases:
        plan = csr_preprocess(a.indptr, a.indices, n, cfg, **kwargs)
        path = plan.save(str(tmp_path / ("w" if kwargs else "b")))
        loaded = SpmmPlan.load(path)
        assert loaded.config == plan.config
        assert loaded.num_nodes == plan.num_nodes
        assert loaded.total_blocks == plan.total_blocks
        np.testing.assert_array_equal(
            np.asarray(loaded.bitmask), np.asarray(plan.bitmask)
        )
        np.testing.assert_array_equal(
            np.asarray(loaded.hind), np.asarray(plan.hind)
        )
        if plan.occ is not None:
            np.testing.assert_array_equal(
                np.asarray(loaded.occ), np.asarray(plan.occ)
            )
        if kwargs:
            np.testing.assert_array_equal(
                np.asarray(loaded.values), np.asarray(plan.values)
            )
        x = rng.standard_normal((n, d)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(spmm(loaded, jnp.asarray(x))),
            np.asarray(spmm(plan, jnp.asarray(x))),
            rtol=1e-6,
        )
