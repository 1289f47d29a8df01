"""End-to-end SpMM accuracy tests vs the scipy oracle.

Config parity with the reference integration test (tests/test_spmm.py:
seeded `sp.random` CSR, random normal features, `calc_diff` "difference
rate" metric vs the cuSPARSE oracle — scipy here), scaled to
CPU/interpret-mode runtime.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu import calc_diff, csr_preprocess, spmm
from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.ops import spmm_pallas, spmm_reference, spmm_scipy


def make_problem(rng, n, density, d):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat).astype(np.float32)
    return a, feat, oracle


@pytest.mark.parametrize("n,density,d", [(512, 0.05, 64), (1000, 0.01, 100)])
def test_spmm_reference_matches_scipy(rng, n, density, d):
    a, feat, oracle = make_problem(rng, n, density, d)
    plan = csr_preprocess(a.indptr, a.indices, n)
    out = np.asarray(spmm_reference(plan, jnp.asarray(feat)))
    assert calc_diff(out, oracle) < 1e-6
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize(
    "n,density,d,cfg",
    [
        (512, 0.05, 64, PlanConfig(128, 128)),
        (300, 0.02, 130, PlanConfig(32, 128)),  # unaligned N and D
        (1000, 0.01, 256, PlanConfig(128, 256)),
        (512, 0.05, 64, PlanConfig(32, 128, block_unroll=4)),
        (400, 0.03, 96, PlanConfig(32, 128, gather_segment=8, block_unroll=2)),
    ],
)
def test_spmm_pallas_matches_scipy(rng, n, density, d, cfg):
    a, feat, oracle = make_problem(rng, n, density, d)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    out = np.asarray(spmm_pallas(plan, jnp.asarray(feat)))
    assert out.shape == oracle.shape
    assert calc_diff(out, oracle) < 1e-6
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_spmm_pallas_bf16_close(rng):
    n, d = 512, 128
    a, feat, oracle = make_problem(rng, n, 0.05, d)
    plan = csr_preprocess(a.indptr, a.indices, n)
    out = np.asarray(
        spmm_pallas(plan, jnp.asarray(feat), compute_dtype=jnp.bfloat16)
    )
    # bf16 MXU path target: relative error <= 1e-2 (BASELINE.md)
    rel = np.linalg.norm(out - oracle) / np.linalg.norm(oracle)
    assert rel < 1e-2


def test_spmm_public_api_impls_agree(rng):
    n, d = 256, 64
    a, feat, oracle = make_problem(rng, n, 0.05, d)
    plan = csr_preprocess(a.indptr, a.indices, n)
    out_p = np.asarray(spmm(plan, jnp.asarray(feat), impl="pallas"))
    out_r = np.asarray(spmm(plan, jnp.asarray(feat), impl="reference"))
    np.testing.assert_allclose(out_p, out_r, rtol=1e-5, atol=1e-4)


def test_spmm_empty(rng):
    n, d = 64, 32
    indptr = np.zeros(n + 1, dtype=np.int32)
    plan = csr_preprocess(indptr, np.zeros(0, np.int32), n)
    feat = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out = spmm(plan, feat)
    assert out.shape == (n, d)
    assert np.asarray(out).sum() == 0

@pytest.mark.parametrize(
    "n,density,d,cfg",
    [
        (512, 0.05, 64, PlanConfig(128, 128, gather_segment=8)),
        (300, 0.02, 130, PlanConfig(32, 128, gather_segment=16)),
        (700, 0.01, 256, PlanConfig(64, 256, gather_segment=32)),
    ],
)
def test_spmm_fused_matches_scipy(rng, n, density, d, cfg):
    from voltrix_spmm_tpu.ops import spmm_pallas_fused

    a, feat, oracle = make_problem(rng, n, density, d)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    out = np.asarray(spmm_pallas_fused(plan, jnp.asarray(feat)))
    assert out.shape == oracle.shape
    assert calc_diff(out, oracle) < 1e-6
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_spmm_fused_multichunk(rng):
    from voltrix_spmm_tpu.ops import spmm_pallas_fused

    n, d = 256, 512
    a, feat, oracle = make_problem(rng, n, 0.03, d)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128, 8))
    out = np.asarray(spmm_pallas_fused(plan, jnp.asarray(feat), block_d=128))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_spmm_auto_impl_uses_fused(rng):
    n, d = 256, 64
    a, feat, oracle = make_problem(rng, n, 0.05, d)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128, 16))
    out = np.asarray(spmm(plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("impl", ["pregather", "fused"])
def test_spmm_empty_windows(rng, impl):
    # rows 96..127 populated only -> windows 0..2 (of block_h=32) empty;
    # empty-window output tiles must be zero, not uninitialized memory
    n, d = 128, 64
    rows = np.repeat(np.arange(96, 128), 3)
    cols = rng.integers(0, n, size=rows.shape[0])
    a = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    a.sum_duplicates()
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat).astype(np.float32)
    seg = 8 if impl == "fused" else 1
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(32, 128, gather_segment=seg)
    )
    # few empty windows -> padded with zero-bit blocks, zeroed in-kernel
    assert not plan.has_empty_windows
    assert (np.diff(np.asarray(plan.block_ptr)) > 0).all()
    out = np.asarray(spmm(plan, jnp.asarray(feat), impl=impl))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)
    assert np.abs(out[:96]).max() == 0.0


def test_spmm_empty_windows_dominated(rng):
    # when empty windows dominate (rectangular/transpose-shard shapes),
    # padding is skipped and the post-kernel mask zeroes them instead
    n, d = 8192, 32
    rows = np.repeat(np.arange(n - 32, n), 2)
    cols = rng.integers(0, n, size=rows.shape[0])
    a = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    a.sum_duplicates()
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat).astype(np.float32)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    assert plan.has_empty_windows
    out = np.asarray(spmm(plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)
    assert np.abs(out[: n - 32]).max() == 0.0


@pytest.mark.parametrize("unroll", [1, 2])
def test_spmm_subtiled_matches_scipy(rng, unroll):
    n, d = 700, 96
    a, feat, oracle = make_problem(rng, n, 0.02, d)
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(256, 128, block_unroll=unroll)
    )
    out = np.asarray(spmm_pallas(plan, jnp.asarray(feat), subtile=True))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_spmm_hybrid_matches_scipy(rng):
    from voltrix_spmm_tpu.format import csr_preprocess_hybrid, hybrid_stats

    n, d = 600, 96
    # mixture: a clustered band (dense runs) + a random tail (scattered)
    band = sp.diags(
        [np.ones(n - k) for k in range(1, 6)], offsets=list(range(1, 6)),
        shape=(n, n),
    )
    tail = sp.random(n, n, density=0.005, format="csr", random_state=rng)
    a = ((band + tail) != 0).astype(np.float32).tocsr()
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat).astype(np.float32)

    plan = csr_preprocess_hybrid(
        a.indptr, a.indices, n,
        dense_config=PlanConfig(32, 128, 8),
        sparse_config=PlanConfig(32, 128, 1),
    )
    stats = hybrid_stats(plan)
    assert 0 < stats["dense_frac"] < 1  # genuinely split
    assert plan.dense.num_edges + plan.sparse.num_edges == plan.num_edges
    out = np.asarray(spmm(plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_spmm_hybrid_all_one_side(rng):
    from voltrix_spmm_tpu.format import csr_preprocess_hybrid

    n, d = 128, 32
    # pure random tail at low density -> everything lands in sparse part
    a = sp.random(n, n, density=0.004, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat).astype(np.float32)
    plan = csr_preprocess_hybrid(
        a.indptr, a.indices, n,
        dense_config=PlanConfig(32, 128, 16),
        sparse_config=PlanConfig(32, 128, 1),
        threshold=16,
    )
    out = np.asarray(spmm(plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_spmm_multichunk_feature_dim(rng):
    # feature dim larger than one chunk exercises the (chunk, block) grid
    n, d = 256, 512
    a, feat, oracle = make_problem(rng, n, 0.03, d)
    plan = csr_preprocess(a.indptr, a.indices, n)
    out = np.asarray(spmm_pallas(plan, jnp.asarray(feat), block_d=128))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("impl", ["pregather", "fused", "ell", "hybrid"])
def test_spmm_out_dtype_skips_bf16_roundtrip(rng, impl):
    # bf16-storage tuner variants pass the original feature dtype as
    # out_dtype so the kernels' f32 accumulators reach the caller
    # untruncated (measured on the rmat-17 headline: diff rate
    # 2.8e-6 -> 1.4e-6). The f32 result from bf16 inputs must be at
    # least as accurate as the explicitly bf16-truncated one.
    n, d = 512, 128
    a, feat, oracle = make_problem(rng, n, 0.05, d)
    if impl == "ell":
        from voltrix_spmm_tpu.format.ell import csr_preprocess_ell
        from voltrix_spmm_tpu.ops import spmm_ell as fn

        plan = csr_preprocess_ell(a.indptr, a.indices, n, PlanConfig(32, 128))
    elif impl == "hybrid":
        from voltrix_spmm_tpu.format import csr_preprocess_hybrid
        from voltrix_spmm_tpu.ops import spmm_pallas_hybrid as fn

        plan = csr_preprocess_hybrid(
            a.indptr, a.indices, n,
            dense_config=PlanConfig(32, 128, 16),
            sparse_config=PlanConfig(32, 128, 1),
            threshold=8,
        )
    else:
        from voltrix_spmm_tpu.ops import spmm_pallas_fused

        fn = spmm_pallas if impl == "pregather" else spmm_pallas_fused
        cfg = PlanConfig(32, 128) if impl == "pregather" else PlanConfig(
            128, 128, 8
        )
        plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    x16 = jnp.asarray(feat).astype(jnp.bfloat16)
    out = np.asarray(fn(plan, x16, out_dtype=jnp.float32))
    assert out.dtype == np.float32
    truncated = np.asarray(fn(plan, x16)).astype(np.float32)
    assert truncated.dtype == np.float32
    err_direct = float(np.abs(out - oracle).max())
    err_trunc = float(np.abs(truncated - oracle).max())
    assert err_direct <= err_trunc + 1e-6, (err_direct, err_trunc)
    # bf16-input accuracy class (reference tf32 analogue)
    assert calc_diff(out, oracle) < 1e-2


def test_run_variant_returns_original_dtype(rng):
    # the tuner's dispatch restores the caller dtype for every impl,
    # including bf16-storage variants
    from voltrix_spmm_tpu.tuner.tuner import Variant, _run_variant

    n, d = 512, 128
    a, feat, oracle = make_problem(rng, n, 0.05, d)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    v = Variant("pregather", block_h=32, feat_dtype="bfloat16")
    out = np.asarray(_run_variant(v, plan, jnp.asarray(feat)))
    assert out.dtype == np.float32
    assert calc_diff(out, oracle) < 1e-2


def test_spmm_batched_features(rng):
    """(B, N, D) features fold into the feature axis: one launch, same
    result as per-batch calls (SpMM is linear over columns)."""
    import scipy.sparse as sp

    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.ops import spmm

    n, d, b = 500, 16, 3
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    x = rng.standard_normal((b, n, d)).astype(np.float32)
    out = np.asarray(spmm(plan, jnp.asarray(x)))
    assert out.shape == (b, n, d)
    for i in range(b):
        want = np.asarray(spmm(plan, jnp.asarray(x[i])))
        np.testing.assert_allclose(out[i], want, rtol=1e-5, atol=1e-5)
