"""On-device smoke tier: every kernel variant once, on the REAL TPU.

Run with:  VOLTRIX_TPU_DEVICE_TESTS=1 python -m pytest tests/ -m tpu -q

The CPU suite runs the same kernels in Pallas interpret mode, which
cannot catch Mosaic-only regressions (lane-alignment of DMA slices,
SMEM budget, unsupported casts). This subset compiles and checks each
variant against the host oracle on the chip; it skips silently when no
TPU is attached so the default CPU run stays green.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.ops import spmm_scipy
from voltrix_spmm_tpu.utils import calc_diff, relative_error

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs a real TPU backend"
    ),
]


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    n, d = 3000, 300  # unaligned n/d exercise padding + lane tails
    a = sp.random(n, n, density=0.02, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)
    return a, feat, oracle


def _check(out, oracle, tol=1e-4):
    assert calc_diff(np.asarray(out), oracle) < tol


def test_pregather_device(problem):
    from voltrix_spmm_tpu.ops import spmm_pallas

    a, feat, oracle = problem
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], PlanConfig(512, 128)).device()
    _check(spmm_pallas(plan, jnp.asarray(feat)), oracle)


def test_subtile_clustered_device(problem):
    from voltrix_spmm_tpu.ops import spmm_pallas

    a, feat, oracle = problem
    cfg = PlanConfig(1024, 128, block_unroll=4, cluster_cols=True)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], cfg).device()
    _check(spmm_pallas(plan, jnp.asarray(feat), subtile=True), oracle)


def test_bf16_feat_device(problem):
    from voltrix_spmm_tpu.ops import spmm_pallas

    a, feat, oracle = problem
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], PlanConfig(512, 128)).device()
    out = spmm_pallas(plan, jnp.asarray(feat).astype(jnp.bfloat16))
    assert relative_error(oracle, np.asarray(out, np.float32)) <= 1e-2


def test_fused_device(problem):
    from voltrix_spmm_tpu.ops import spmm_pallas_fused

    a, feat, oracle = problem
    cfg = PlanConfig(128, 128, gather_segment=8)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], cfg).device()
    _check(spmm_pallas_fused(plan, jnp.asarray(feat)), oracle)


def test_hybrid_device(problem):
    from voltrix_spmm_tpu.format.hybrid import csr_preprocess_hybrid
    from voltrix_spmm_tpu.ops import spmm_pallas_hybrid

    a, feat, oracle = problem
    hp = csr_preprocess_hybrid(a.indptr, a.indices, a.shape[0])
    _check(spmm_pallas_hybrid(hp, jnp.asarray(feat)), oracle)


def test_int8_device(problem):
    from voltrix_spmm_tpu.ops import spmm_pallas_int8

    a, feat, oracle = problem
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], PlanConfig(512, 128)).device()
    out = spmm_pallas_int8(plan, jnp.asarray(feat))
    # int8 row-quantized accuracy class
    assert relative_error(oracle, np.asarray(out, np.float32)) <= 5e-2


def test_weighted_device(problem):
    from voltrix_spmm_tpu.ops import spmm_pallas_weighted

    a, feat, _ = problem
    n = a.shape[0]
    aw = a.copy()
    rng = np.random.default_rng(3)
    aw.data = rng.standard_normal(aw.nnz).astype(np.float32)
    plan = csr_preprocess(
        aw.indptr, aw.indices, n, PlanConfig(128, 128), values=aw.data
    ).device()
    out = spmm_pallas_weighted(plan, jnp.asarray(feat))
    _check(out, aw @ feat, tol=1e-3)


def test_fused_bulk_dma_device(problem):
    # the seg=128 winner config (one 128-row bulk DMA per block)
    from voltrix_spmm_tpu.ops import spmm_pallas_fused

    a, feat, oracle = problem
    # the production config: group unroll 4 (one desc/bitmask DMA per group)
    cfg = PlanConfig(2048, 128, gather_segment=128, block_unroll=4)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], cfg).device()
    _check(spmm_pallas_fused(plan, jnp.asarray(feat)), oracle)
    out = spmm_pallas_fused(
        plan, jnp.asarray(feat), compute_dtype=jnp.bfloat16
    )
    assert relative_error(oracle, np.asarray(out, np.float32)) <= 1e-2


def test_weighted_backward_device(problem):
    from voltrix_spmm_tpu.format import csr_transpose, edge_slot_map
    from voltrix_spmm_tpu.ops import spmm_weighted_ad

    a, feat, _ = problem
    n = a.shape[0]
    rng = np.random.default_rng(5)
    aw = a.copy()
    aw.data = rng.standard_normal(aw.nnz).astype(np.float32)
    cfg = PlanConfig(128, 128)
    plan = csr_preprocess(
        aw.indptr, aw.indices, n, cfg, values=aw.data
    ).device()
    ptr_t, idx_t, vals_t = csr_transpose(aw.indptr, aw.indices, n, aw.data)
    plan_t = csr_preprocess(ptr_t, idx_t, n, cfg, values=vals_t).device()
    g = rng.standard_normal(feat.shape).astype(np.float32)

    dfeat = jax.grad(
        lambda x: jnp.sum(spmm_weighted_ad(plan, plan_t, x) * g)
    )(jnp.asarray(feat))
    _check(np.asarray(dfeat), aw.T @ g, tol=1e-3)

    import dataclasses

    dvals = jax.grad(
        lambda v: jnp.sum(
            spmm_weighted_ad(
                dataclasses.replace(plan, values=v), plan_t, jnp.asarray(feat)
            )
            * g
        )
    )(plan.values)
    slots = edge_slot_map(plan, aw.indptr, aw.indices)
    rows = np.repeat(np.arange(n), np.diff(aw.indptr))
    want = np.sum(g[rows] * feat[aw.indices], axis=1)
    _check(np.asarray(dvals).reshape(-1)[slots], want, tol=1e-3)


def test_gat_device(problem):
    from voltrix_spmm_tpu.models import (
        build_gat_graph,
        gat_attention_aggregate,
    )

    a, feat, _ = problem
    n = a.shape[0]
    al = ((a + sp.eye(n, format="csr")) != 0).astype(np.float32).tocsr()
    g = build_gat_graph(al.indptr, al.indices, n, PlanConfig(64, 128))
    rng = np.random.default_rng(9)
    f = feat.shape[1]
    a_src = rng.standard_normal(f).astype(np.float32)
    a_dst = rng.standard_normal(f).astype(np.float32)
    out = np.asarray(
        gat_attention_aggregate(
            g, jnp.asarray(feat), jnp.asarray(a_src), jnp.asarray(a_dst)
        )
    )
    # dense oracle
    s, t = feat @ a_src, feat @ a_dst
    e = s[:, None] + t[None, :]
    e = np.where(e > 0, e, 0.2 * e)
    mask = al.toarray() != 0
    e = np.where(mask, e, -np.inf)
    alpha = np.exp(e - e.max(axis=1, keepdims=True)) * mask
    alpha /= np.maximum(alpha.sum(axis=1, keepdims=True), 1e-9)
    _check(out, alpha @ feat, tol=1e-3)


def test_empty_windows_device():
    from voltrix_spmm_tpu.ops import spmm_pallas

    rng = np.random.default_rng(1)
    n, d = 1000, 64
    rows = np.repeat(np.arange(800, 1000), 3)
    cols = rng.integers(0, n, size=rows.shape[0])
    a = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    a.sum_duplicates()
    feat = rng.standard_normal((n, d)).astype(np.float32)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(128, 128)).device()
    out = np.asarray(spmm_pallas(plan, jnp.asarray(feat)))
    _check(out, spmm_scipy(a.indptr, a.indices, n, feat))
    assert np.abs(out[:768]).max() == 0.0


def test_autodiff_device(problem):
    from voltrix_spmm_tpu.ops.autodiff import spmm_ad

    a, feat, _ = problem
    n = a.shape[0]
    at = a.T.tocsr()
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(512, 128)).device()
    plan_t = csr_preprocess(at.indptr, at.indices, n, PlanConfig(512, 128)).device()
    x = jnp.asarray(feat)

    def loss(x):
        return jnp.sum(spmm_ad(plan, plan_t, x) ** 2)

    g = jax.grad(loss)(x)
    # finite + matches the dense formulation on a slice (plans are
    # binary: nonzero pattern, not the csr values)
    dense = (a.toarray() != 0).astype(np.float32)
    g_ref = 2.0 * dense.T @ (dense @ feat)
    # two chained default-precision MXU matmuls (bf16-rounded inputs)
    assert relative_error(g_ref[:200], np.asarray(g)[:200]) < 5e-3


def test_ell_forward_and_sddmm_device(problem):
    """ELL lowering on real Mosaic: the (1, u, K) int32 blocks, the
    broadcast-compare value tile, and the (1, 8, uK) lane-gradient
    output tile (interpret mode cannot catch tiling violations)."""
    from voltrix_spmm_tpu.format.ell import csr_preprocess_ell, edge_values
    from voltrix_spmm_tpu.ops import sddmm_ell, spmm_ell

    a, feat, oracle = problem
    n = a.shape[0]
    vals = np.random.default_rng(3).standard_normal(a.nnz).astype(np.float32)
    plan = csr_preprocess_ell(
        a.indptr, a.indices, n, PlanConfig(128, 128, block_unroll=4),
        values=vals,
    ).device()
    aw = sp.csr_matrix((vals, a.indices, a.indptr), shape=a.shape)
    _check(spmm_ell(plan, jnp.asarray(feat)), aw @ feat)
    # SDDMM per-edge scores vs einsum oracle
    y = np.random.default_rng(4).standard_normal(feat.shape).astype(
        np.float32
    )
    got = np.asarray(
        sddmm_ell(plan, jnp.asarray(feat), jnp.asarray(y), per_edge=True)
    )
    rows = np.repeat(np.arange(n), np.diff(a.indptr))
    want = np.einsum("ed,ed->e", feat[rows], y[a.indices])
    assert calc_diff(got, want) < 1e-4
    del edge_values


def test_gat_dot_train_device(problem):
    """Dot-product-attention GAT trains one step on the chip (SDDMM ->
    segment softmax -> lane-mapped weighted aggregation, full VJP)."""
    import optax

    from voltrix_spmm_tpu.models import (
        build_ell_graph,
        gat_dot_loss,
        init_gat_dot,
    )

    a, feat, _ = problem
    n = a.shape[0]
    g = build_ell_graph(a.indptr, a.indices, n, PlanConfig(128, 128))
    x = jnp.asarray(feat[:, :32])
    labels = jnp.asarray(np.random.default_rng(5).integers(0, 4, n))
    params = init_gat_dot(jax.random.PRNGKey(0), 32, 16, 4, num_heads=2)
    loss, grads = jax.value_and_grad(gat_dot_loss)(params, g, x, labels)
    assert np.isfinite(float(loss))
    assert all(
        bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(grads)
    )


def test_fused_slots3_device(problem):
    """3-slot fused pipeline + packed seg-start descriptors on Mosaic."""
    from voltrix_spmm_tpu.format.preprocess import fused_auto_config
    from voltrix_spmm_tpu.ops import spmm_pallas_fused

    a, feat, oracle = problem
    cfg = fused_auto_config(a.indptr, a.indices, a.shape[0])
    if cfg is None:
        cfg = PlanConfig(512, 128, gather_segment=128, block_unroll=4)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0], cfg).device()
    _check(spmm_pallas_fused(plan, jnp.asarray(feat), slots=3), oracle)


def test_device_packed_transfer_device(problem):
    """device_packed(): host pack -> device scatter -> dense bitmask."""
    a, feat, oracle = problem
    plan = csr_preprocess(
        a.indptr, a.indices, a.shape[0],
        PlanConfig(512, 128, cluster_cols=True),
    ).device_packed()
    from voltrix_spmm_tpu.ops import spmm_pallas

    _check(spmm_pallas(plan, jnp.asarray(feat), subtile=True), oracle)


def test_packed_gather_subtile_device(problem):
    """Packed gather (seg=q super-rows) through the clustered-subtile
    kernel on real Mosaic — lane-run alignment and the packed reshape
    are exactly the kind of layout contract interpret mode cannot
    check."""
    from voltrix_spmm_tpu.ops import spmm_pallas

    a, feat, oracle = problem
    for q in (2, 4):
        cfg = PlanConfig(
            512, 128, gather_segment=q, block_unroll=4, cluster_cols=True
        )
        plan = csr_preprocess(
            a.indptr, a.indices, a.shape[0], cfg
        ).device()
        _check(spmm_pallas(plan, jnp.asarray(feat), subtile=True), oracle)


def test_export_servable_pallas_device(problem):
    """The real Mosaic kernel serializes through jax.export and the
    deserialized artifact reproduces the oracle — the deployment path
    (serve.export_servable) for the actual serving program, which the
    CPU tier cannot cover (interpret mode is not a serializable
    program)."""
    from voltrix_spmm_tpu.ops import spmm_pallas
    from voltrix_spmm_tpu.serve import export_servable, load_servable

    a, feat, oracle = problem
    plan = csr_preprocess(
        a.indptr, a.indices, a.shape[0], PlanConfig(512, 128)
    ).device()
    blob = export_servable(lambda x: spmm_pallas(plan, x), jnp.asarray(feat))
    served = load_servable(blob)
    _check(served(jnp.asarray(feat)), oracle)


def test_flash_attention_device(problem):
    """Fused flash-attention SpMM on real Mosaic: fwd vs a dense oracle
    (online-softmax revisiting + combined (k||v) gather) and grads
    finite through the recompute backward."""
    from voltrix_spmm_tpu.ops import spmm_attention, spmm_attention_ad

    a, feat, _ = problem
    n = a.shape[0]
    rng = np.random.default_rng(11)
    dk, dv = 48, 80
    q = jnp.asarray(rng.standard_normal((n, dk)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, dk)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, dv)).astype(np.float32))
    plan = csr_preprocess(
        a.indptr, a.indices, n, PlanConfig(128, 128, block_unroll=2)
    ).device()
    scale, slope = 1.0 / dk**0.5, 0.2
    got = np.asarray(
        spmm_attention(plan, q, k, v, scale=scale, negative_slope=slope)
    )
    # dense oracle
    mask = a.toarray() != 0
    e = (np.asarray(q) @ np.asarray(k).T) * scale
    e = np.where(e > 0, e, slope * e)
    e = np.where(mask, e, -np.inf)
    m = np.where(mask.any(1, keepdims=True), e.max(1, keepdims=True), 0.0)
    al = np.where(mask, np.exp(e - m), 0.0)
    den = np.maximum(al.sum(1, keepdims=True), 1e-30)
    want = (al / den) @ np.asarray(v)
    assert calc_diff(got, want) < 1e-4

    w = jnp.asarray(rng.standard_normal((n, dv)).astype(np.float32))
    grads = jax.grad(
        lambda q_, k_, v_: jnp.sum(
            spmm_attention_ad(
                plan, q_, k_, v_, scale=scale, negative_slope=slope
            )
            * w
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    assert all(bool(jnp.isfinite(g).all()) for g in grads)


def test_ipack_interleaved_device(problem):
    # round-5 interleaved packed layout: wide gather consumed directly
    # (Mosaic-only risks: wide xg tiles, per-j block concats)
    from voltrix_spmm_tpu.ops import spmm_pallas

    a, feat, oracle = problem
    plan = csr_preprocess(
        a.indptr, a.indices, a.shape[0],
        PlanConfig(
            512, 128, gather_segment=4, block_unroll=4,
            cluster_cols=True, seg_interleaved=True,
        ),
    ).device()
    _check(spmm_pallas(plan, jnp.asarray(feat), subtile=True), oracle)


def test_incidence_packed_device(problem):
    # round-5 incidence ordering: src_perm feature permute + packed gather
    from voltrix_spmm_tpu.ops import spmm

    a, feat, oracle = problem
    plan = csr_preprocess(
        a.indptr, a.indices, a.shape[0],
        PlanConfig(
            512, 128, gather_segment=2, block_unroll=2,
            pack_order="incidence",
        ),
    ).device()
    _check(spmm(plan, jnp.asarray(feat)), oracle)


def test_split_hybrid_pregather_device(problem):
    # round-5 density split: interleaved dense side + exact tail via the
    # public dispatcher (auto dense_impl + inferred subtile)
    from voltrix_spmm_tpu.format.hybrid import csr_preprocess_hybrid
    from voltrix_spmm_tpu.ops import spmm

    a, feat, oracle = problem
    hp = csr_preprocess_hybrid(
        a.indptr, a.indices, a.shape[0],
        dense_config=PlanConfig(
            512, 128, gather_segment=8, block_unroll=8,
            cluster_cols=True, seg_interleaved=True,
        ),
    )
    hp.dense = hp.dense.device()
    hp.sparse = hp.sparse.device()
    _check(spmm(hp, jnp.asarray(feat)), oracle)


def test_attention_subtile_device(problem):
    # subtile attention must be bit-compatible with the full walk on
    # the REAL Mosaic path (sliced scratch writes, strided word slices)
    from voltrix_spmm_tpu.ops import spmm_attention_mh

    a, feat, _ = problem
    n = a.shape[0]
    rng = np.random.default_rng(11)
    H, dk, dv = 2, 32, 32
    q = jnp.asarray(rng.standard_normal((H, n, dk)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((H, n, dk)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((H, n, dv)).astype(np.float32))
    plan = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(512, 128, block_unroll=4, cluster_cols=True),
    ).device()
    full = np.asarray(spmm_attention_mh(plan, q, k, v, negative_slope=0.2))
    sub = np.asarray(
        spmm_attention_mh(plan, q, k, v, negative_slope=0.2, subtile=True)
    )
    np.testing.assert_array_equal(sub, full)
