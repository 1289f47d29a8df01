"""Streamed (window-chunked, bounded-memory) dispatch tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.format.stream import (
    estimate_gather_bytes,
    slice_plan_windows,
)
from voltrix_spmm_tpu.ops import spmm_pallas, spmm_scipy, spmm_streamed


@pytest.fixture
def problem(rng):
    n, d = 900, 64  # unaligned n: last chunk carries the true row tail
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)
    return a, feat, oracle


@pytest.mark.parametrize("num_chunks", [1, 3, 7, 64])
def test_streamed_matches_plain(problem, num_chunks):
    a, feat, oracle = problem
    plan = csr_preprocess(
        a.indptr, a.indices, a.shape[0], PlanConfig(64, 128, block_unroll=2)
    )
    out = np.asarray(spmm_streamed(plan, jnp.asarray(feat), num_chunks=num_chunks))
    assert out.shape == (a.shape[0], feat.shape[1])
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_streamed_subtile_clustered(problem):
    a, feat, oracle = problem
    cfg = PlanConfig(256, 128, block_unroll=2, cluster_cols=True)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], cfg)
    out = np.asarray(
        spmm_streamed(plan, jnp.asarray(feat), num_chunks=3, subtile=True)
    )
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_streamed_under_jit_with_presliced(problem):
    a, feat, oracle = problem
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], PlanConfig(64, 128))
    subs = slice_plan_windows(plan, 4)

    @jax.jit
    def run(subs, x):
        return spmm_streamed(subs, x)

    out = np.asarray(run(subs, jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_slice_plan_geometry(problem):
    a, _, _ = problem
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], PlanConfig(64, 128))
    subs = slice_plan_windows(plan, 4)
    assert sum(s.num_windows for s in subs) == plan.num_windows
    assert sum(s.total_blocks for s in subs) == plan.total_blocks
    assert sum(s.num_nodes for s in subs) == plan.num_nodes
    for s in subs:
        assert s.source_rows == plan.source_rows  # gather space unchanged


def test_streamed_preprocess_matches_sliced_full(problem):
    """csr_preprocess_streamed (per-chunk build + async upload, ROADMAP
    #9) must produce the same sub-plans as slicing the full-build plan."""
    from voltrix_spmm_tpu.format.stream import csr_preprocess_streamed

    a, feat, oracle = problem
    cfg = PlanConfig(64, 128, block_unroll=2)
    full = csr_preprocess(a.indptr, a.indices, a.shape[0], cfg)
    want = slice_plan_windows(full, 4)
    got = csr_preprocess_streamed(
        a.indptr, a.indices, a.shape[0], cfg, num_chunks=4, to_device=False
    )
    assert len(got) == len(want)
    for s_got, s_want in zip(got, want):
        assert s_got.num_windows == s_want.num_windows
        assert s_got.num_nodes == s_want.num_nodes
        assert s_got.source_rows == s_want.source_rows
        np.testing.assert_array_equal(
            np.asarray(s_got.bitmask), np.asarray(s_want.bitmask)
        )
        np.testing.assert_array_equal(
            np.asarray(s_got.hind), np.asarray(s_want.hind)
        )
        np.testing.assert_array_equal(
            np.asarray(s_got.block_ptr), np.asarray(s_want.block_ptr)
        )
    # and the streamed dispatch over them is correct end to end
    out = np.asarray(spmm_streamed(got, jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_tuner_streamed_variant(problem, tmp_path):
    from voltrix_spmm_tpu.tuner import SpmmTuner, Variant

    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=[Variant("pregather", block_h=64, stream_chunks=4)],
        iters=1,
    )
    out = np.asarray(tuned(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)
    assert "c4" in tuned.variant.key()


def test_huge_gate_uses_dedup_estimate_and_keeps_fused():
    from voltrix_spmm_tpu.tuner import default_space

    # raw nnz says huge, the deduped gather estimate says it fits ->
    # the full (non-streamed) space is used (measured: er-8k d1024)
    space = default_space(d=1024, nnz=10_000_000, gather_rows=500_000)
    assert not any(v.stream_chunks for v in space)
    # genuinely huge AND fused-eligible: streamed pregather + fused
    space = default_space(
        d=1024, nnz=100_000_000, gather_rows=50_000_000, coverage128=0.1
    )
    assert any(v.stream_chunks for v in space)
    assert any(v.impl == "fused" for v in space)
    # genuinely huge and scattered: streamed only
    space = default_space(
        d=1024, nnz=100_000_000, gather_rows=50_000_000, coverage128=1.7
    )
    assert not any(v.impl == "fused" for v in space)


def test_default_space_huge_gate():
    from voltrix_spmm_tpu.tuner import default_space

    small = default_space(d=256, nnz=1_000_000)
    assert not any(v.stream_chunks for v in small)
    huge = default_space(d=256, nnz=100_000_000)
    # every huge-regime variant must bound device memory: either it
    # streams X in chunks, or it is a clustered-subtile pregather whose
    # deduped gather may fit (validity filter drops it when it doesn't
    # — measured reddit-proxy d256 at 100.65 ms unstreamed)
    assert huge and all(v.stream_chunks or v.subtile for v in huge)
    assert any(v.subtile and not v.stream_chunks for v in huge)
    huge_acc = default_space(accurate=True, d=256, nnz=100_000_000)
    assert all(v.feat_dtype is None for v in huge_acc)


def test_estimate_gather_bytes(problem):
    a, _, _ = problem
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], PlanConfig(64, 128))
    assert estimate_gather_bytes(plan, 256) == plan.gather_rows * 256 * 4
    assert estimate_gather_bytes(10_000, 128, 2) == 10_000 * 128 * 2


def test_spmm_streamed_accepts_generator(problem):
    """The value-plane guard must not consume a one-shot iterable of
    sub-plans before the dispatch loop materializes it."""
    import jax.numpy as jnp

    from voltrix_spmm_tpu.ops import spmm_pallas, spmm_streamed

    a, feat, _ = problem
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], PlanConfig(64, 128))
    ref = np.asarray(spmm_pallas(plan, jnp.asarray(feat)))
    gen = (s for s in slice_plan_windows(plan, 4))
    out = np.asarray(spmm_streamed(gen, jnp.asarray(feat)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_default_space_memory_budget():
    from voltrix_spmm_tpu.tuner import default_space

    # ogbn-products-class (2.4M nodes / 124M nnz / no tall-window dedup):
    # bitmask-heavy geometries are gated out BEFORE their multi-GB host
    # build, chunks scale so one bf16 chunk gather stays <= ~1 GB, and
    # the O(nnz)-plan ELL kernel joins the race (measured failure mode:
    # the round-3 fixed-chunk space rejected every candidate on device)
    sp = default_space(
        d=256, nnz=124_000_000, coverage128=1.7,
        gather_rows=110_000_000, num_nodes=2_450_000,
        gather_rows_2048=105_000_000, device_mem_bytes=12 * 2**30,
    )
    assert sp, "products-class space must not be empty"
    assert all(v.stream_chunks for v in sp)
    assert all(v.block_h == 128 for v in sp)
    assert any(v.impl == "ell" for v in sp)
    for v in sp:
        rows = 124e6 * (1.05 if v.impl == "ell" else 1.0)
        assert rows * 256 * 2 / v.stream_chunks <= 2**30 * 1.01
    # reddit-class (10x dedup at h2048) keeps the measured unstreamed
    # clustered-subtile winner next to the streamed fallbacks
    sp = default_space(
        d=256, nnz=100_000_000, coverage128=0.265,
        gather_rows=20_000_000, num_nodes=233_000,
        gather_rows_2048=10_200_000, device_mem_bytes=12 * 2**30,
    )
    assert any(v.subtile and not v.stream_chunks for v in sp)
    assert any(v.impl == "fused" for v in sp)


def test_public_spmm_accepts_chunk_lists(rng):
    """ops.spmm on a window-chunk list == unstreamed result (the public
    face of the streamed-training path)."""
    import scipy.sparse as sp

    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.format.stream import slice_plan_windows
    from voltrix_spmm_tpu.ops import spmm

    n, d = 600, 64
    a = sp.random(n, n, density=0.02, format="csr", random_state=rng)
    a.data[:] = 1.0
    x = rng.standard_normal((n, d)).astype(np.float32)
    plan = csr_preprocess(a.indptr, a.indices, n,
                          PlanConfig(128, 128, block_unroll=2),
                          backend="numpy")
    import jax.numpy as jnp

    full = np.asarray(spmm(plan, jnp.asarray(x)))
    subs = slice_plan_windows(plan, 3)
    chunked = np.asarray(spmm(subs, jnp.asarray(x)))
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)
