"""Two-level window (column clustering) tests: semantic invariance,
occupancy reduction, subtile-kernel correctness on clustered plans."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess, plan_to_dense
from voltrix_spmm_tpu.format.cluster import (
    block_occupancy,
    cluster_window_columns,
    subtile_stats,
)
from voltrix_spmm_tpu.ops import spmm_pallas, spmm_scipy


def clustered_graph(rng, n=1024, comm=128):
    """Community graph: neighbors of a row concentrate in one 128-row
    band, so signatures are low-popcount and clustering has bite."""
    src = rng.integers(0, n, size=n * 8)
    dst = (src // comm) * comm + rng.integers(0, comm, size=src.shape[0])
    extra_s = rng.integers(0, n, size=n)
    extra_d = rng.integers(0, n, size=n)
    a = sp.csr_matrix(
        (
            np.ones(src.shape[0] + n, np.float32),
            (np.concatenate([src, extra_s]), np.concatenate([dst, extra_d])),
        ),
        shape=(n, n),
    )
    a.sum_duplicates()
    a.data[:] = 1.0
    return a


def test_clustering_preserves_matrix(rng):
    a = clustered_graph(rng)
    n = a.shape[0]
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(256, 128))
    cplan = cluster_window_columns(plan)
    np.testing.assert_array_equal(plan_to_dense(cplan), plan_to_dense(plan))
    # same geometry, same gather volume — only lane order changed
    assert cplan.total_blocks == plan.total_blocks
    assert np.asarray(cplan.hind).shape == np.asarray(plan.hind).shape


def test_clustering_reduces_occupancy(rng):
    a = clustered_graph(rng, n=2048, comm=128)
    n = a.shape[0]
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(1024, 128, block_unroll=2)
    )
    before = subtile_stats(plan)
    after = subtile_stats(cluster_window_columns(plan))
    assert after["occupied_subtiles"] < before["occupied_subtiles"]
    assert after["total_subtiles"] == before["total_subtiles"]


def test_preprocess_cluster_cols_flag(rng):
    a = clustered_graph(rng)
    n = a.shape[0]
    cfg = PlanConfig(256, 128, cluster_cols=True, block_unroll=2)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    assert plan.occ is not None and np.asarray(plan.occ).shape == (
        plan.total_blocks,
    )
    np.testing.assert_array_equal(
        np.asarray(plan.occ), block_occupancy(np.asarray(plan.bitmask))
    )
    # the plan still represents A exactly
    oracle = np.zeros((n, n), np.uint8)
    oracle[a.nonzero()] = 1
    np.testing.assert_array_equal(plan_to_dense(plan), oracle)


@pytest.mark.parametrize("subtile", [False, True])
def test_spmm_on_clustered_plan(rng, subtile):
    a = clustered_graph(rng)
    n, d = a.shape[0], 96  # unaligned d exercises padding
    feat = rng.standard_normal((n, d)).astype(np.float32)
    cfg = PlanConfig(256, 128, cluster_cols=True, block_unroll=2)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    out = np.asarray(spmm_pallas(plan, jnp.asarray(feat), subtile=subtile))
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_cluster_config_validation():
    # seg > 1 + clustering is allowed (runs are clustered as units —
    # the packed-gather contract, see format/cluster.py); the one hard
    # constraint is the 128-row sub-window unit
    PlanConfig(256, 128, gather_segment=8, cluster_cols=True)
    with pytest.raises(AssertionError):
        PlanConfig(64, 128, cluster_cols=True)


def test_empty_matrix_cluster():
    n = 300
    indptr = np.zeros(n + 1, np.int64)
    plan = csr_preprocess(
        indptr, np.zeros(0, np.int64), n, PlanConfig(128, 128, cluster_cols=True)
    )
    assert plan.total_blocks == 0
    out = spmm_pallas(plan, jnp.ones((n, 32), jnp.float32))
    assert float(jnp.abs(out).max()) == 0.0


def test_native_cluster_matches_numpy(rng):
    """The C++/OpenMP clustering pass produces the same plan contract as
    the numpy path: identical dense reconstruction, identical occupancy
    SEMANTICS (bit s set iff sub-window s occupied), empty lanes last."""
    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.format.cluster import (
        block_occupancy,
        cluster_window_columns,
    )
    from voltrix_spmm_tpu.format.preprocess import plan_to_dense
    from voltrix_spmm_tpu.runtime import native_available, native_cluster

    if not native_available():
        pytest.skip("no native toolchain")
    n = 700
    a = sp.random(n, n, density=0.01, format="csr", random_state=rng)
    base = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(256, 128, block_unroll=2), backend="native",
    )
    import copy

    nat = native_cluster(copy.deepcopy(base))
    ref = cluster_window_columns(copy.deepcopy(base))
    ref.occ = block_occupancy(np.asarray(ref.bitmask))
    # same matrix reconstruction
    np.testing.assert_array_equal(plan_to_dense(nat), plan_to_dense(ref))
    # occupancy consistent with the (possibly differently tie-broken)
    # permuted bitmask itself
    np.testing.assert_array_equal(
        np.asarray(nat.occ), block_occupancy(np.asarray(nat.bitmask))
    )
    # both paths cluster equally well: same per-block occupancy *count*
    # distribution cost for the subtile kernel
    def popcnt(v):
        return np.array([bin(int(x) & 0xFFFFFFFF).count("1") for x in v])

    assert popcnt(np.asarray(nat.occ)).sum() == popcnt(
        np.asarray(ref.occ)
    ).sum()
    # end-to-end: the clustered native plan computes the right product
    import jax.numpy as jnp

    from voltrix_spmm_tpu.ops import spmm_pallas

    feat = rng.standard_normal((n, 32)).astype(np.float32)
    out = np.asarray(spmm_pallas(nat, jnp.asarray(feat), subtile=True))
    np.testing.assert_allclose(out, a.astype(bool) @ feat, rtol=1e-4,
                               atol=1e-3)


def test_csr_preprocess_cluster_uses_native(rng):
    """backend='native' + cluster_cols returns a plan with occ set and
    correct results (the csr_preprocess wiring)."""
    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.runtime import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    n = 500
    a = sp.random(n, n, density=0.02, format="csr", random_state=rng)
    plan = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(128, 128, cluster_cols=True), backend="native",
    )
    assert plan.occ is not None and plan.occ.shape[0] == plan.total_blocks
    import jax.numpy as jnp

    from voltrix_spmm_tpu.ops import spmm_pallas

    feat = rng.standard_normal((n, 24)).astype(np.float32)
    out = np.asarray(spmm_pallas(plan, jnp.asarray(feat), subtile=True))
    np.testing.assert_allclose(out, a.astype(bool) @ feat, rtol=1e-4,
                               atol=1e-3)


def test_packed_bitmask_roundtrip(rng):
    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.format.cluster import (
        pack_bitmask,
        packed_stats,
        unpack_bitmask_device,
        unpack_bitmask_np,
    )

    n = 800
    a = sp.random(n, n, density=0.004, format="csr", random_state=rng)
    plan = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(256, 128, block_unroll=2, cluster_cols=True),
    )
    bm = np.asarray(plan.bitmask)
    packed, ids, nsub = pack_bitmask(bm)
    assert nsub == 2
    np.testing.assert_array_equal(
        unpack_bitmask_np(packed, ids, plan.total_blocks, 8, 128), bm
    )
    dev = np.asarray(
        unpack_bitmask_device(packed, ids, plan.total_blocks, 8, 128)
    )
    np.testing.assert_array_equal(dev, bm)
    st = packed_stats(bm)
    assert st["packed_bytes"] < st["dense_bytes"]


def test_device_packed_and_packed_save(tmp_path, rng):
    import jax.numpy as jnp

    from voltrix_spmm_tpu.format import PlanConfig, SpmmPlan, csr_preprocess
    from voltrix_spmm_tpu.ops import spmm_pallas

    n = 700
    a = sp.random(n, n, density=0.005, format="csr", random_state=rng)
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(256, 128, cluster_cols=True)
    )
    feat = rng.standard_normal((n, 32)).astype(np.float32)
    want = a.astype(bool) @ feat
    dp = plan.device_packed()
    out = np.asarray(spmm_pallas(dp, jnp.asarray(feat), subtile=True))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3)
    # packed save is smaller on-disk and loads back byte-identical
    import os

    p1 = plan.save(str(tmp_path / "dense.npz"))
    p2 = plan.save(str(tmp_path / "packed.npz"), packed=True)
    assert os.path.getsize(p2) < os.path.getsize(p1)
    back = SpmmPlan.load(p2)
    np.testing.assert_array_equal(
        np.asarray(back.bitmask), np.asarray(plan.bitmask)
    )
    np.testing.assert_array_equal(np.asarray(back.hind), np.asarray(plan.hind))


def test_native_cluster_does_not_mutate_input(rng):
    """native_cluster must return fresh arrays (the C++ pass permutes
    lanes through its buffers; the caller's plan stays intact — same
    contract as cluster_window_columns)."""
    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.runtime import native_available, native_cluster

    if not native_available():
        pytest.skip("no native toolchain")
    n = 700
    a = sp.random(n, n, density=0.01, format="csr", random_state=rng)
    base = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(256, 128, block_unroll=2), backend="native",
    )
    bm0 = np.array(base.bitmask, copy=True)
    hind0 = np.array(base.hind, copy=True)
    out = native_cluster(base)
    np.testing.assert_array_equal(np.asarray(base.bitmask), bm0)
    np.testing.assert_array_equal(np.asarray(base.hind), hind0)
    assert out is not base
