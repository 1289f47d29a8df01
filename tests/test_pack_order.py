"""Round-5 gather-frontier features: build-time incidence packing
(pack_order='incidence', format.preprocess.incidence_order) and the
density-split hybrid (>= q/2-full runs packed, exact tail;
ops/hybrid.py dense_impl='pregather').

Both exist because the v5e gather law is per-ROW bound (docs/RESULTS.md
floor analyses): the only lever at fixed workload is fewer, wider
fetches (reference role: spmm_kernels.cuh:1563-1570 TMA bulk copies).
Parity is checked exactly against the scipy dense oracle on CPU
(interpret-mode Pallas).
"""

import dataclasses
import os

import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess, plan_to_dense
from voltrix_spmm_tpu.format.hybrid import csr_preprocess_hybrid, hybrid_stats
from voltrix_spmm_tpu.format.preprocess import (
    density_split_stats,
    incidence_order,
    incidence_pack_ratios,
    pack_ratios,
)


def random_csr(rng, n, density):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    return a


def community_csr(rng, n, comm=64, in_deg=8, out_deg=2):
    """Clustered graph — the regime where runs pack well."""
    src = rng.integers(0, n, size=n * in_deg)
    dst = (
        (src // comm) * comm + rng.integers(0, comm, size=src.shape[0])
    ) % n
    src2 = rng.integers(0, n, size=n * out_deg)
    dst2 = rng.integers(0, n, size=src2.shape[0])
    rows = np.concatenate([src, src2])
    cols = np.concatenate([dst, dst2])
    a = sp.csr_matrix(
        (np.ones(rows.shape[0], np.float32), (rows, cols)), shape=(n, n)
    )
    a.sum_duplicates()
    a.data[:] = 1.0
    return a


def spmm_oracle(a, feat):
    return np.asarray(a @ feat, dtype=np.float32)


# ---------------------------------------------------------------- order


def test_incidence_order_is_permutation(rng):
    a = random_csr(rng, 500, 0.03)
    order = incidence_order(a.indptr, a.indices, 500, block_h=64)
    assert order.shape == (500,)
    assert np.array_equal(np.sort(order), np.arange(500))


def test_incidence_order_groups_identical_incidence(rng):
    # columns referenced by exactly the same windows must be adjacent
    a = community_csr(rng, 512, comm=32)
    order = incidence_order(a.indptr, a.indices, 512, block_h=128)
    rank = np.empty(512, np.int64)
    rank[order] = np.arange(512)
    rows = np.repeat(np.arange(512), np.diff(a.indptr))
    uniq = np.unique((rows // 128) * 512 + a.indices.astype(np.int64))
    win, col = uniq // 512, uniq % 512
    masks = {}
    for w, c in zip(win, col):
        masks.setdefault(c, []).append(w)
    sigs = {c: tuple(ws) for c, ws in masks.items()}
    # sort columns by rank; identical signatures must form contiguous runs
    cols_by_rank = sorted(sigs, key=lambda c: rank[c])
    seen = set()
    prev = None
    for c in cols_by_rank:
        s = sigs[c]
        if s != prev:
            assert s not in seen, "identical incidence split apart"
            seen.add(s)
            prev = s


def test_incidence_pack_ratio_improves_on_clustered(rng):
    a = community_csr(rng, 1024, comm=64)
    _, nat = pack_ratios(a.indptr, a.indices, 1024, 256, qs=(4,))
    inc = incidence_pack_ratios(a.indptr, a.indices, 1024, 256, qs=(4,))
    assert inc[4] <= nat[4] + 0.05  # at worst about equal


def test_density_split_stats_bounds(rng):
    a = random_csr(rng, 600, 0.05)
    rows_frac, slots = density_split_stats(a.indptr, a.indices, 600, 128, 8)
    assert 0 < rows_frac <= 1.0
    assert 1.0 <= slots <= 2.0  # waste bounded by q/thresh = 2


# ---------------------------------------------------------- plan parity


def test_incidence_requires_seg():
    with pytest.raises(AssertionError):
        PlanConfig(128, 128, gather_segment=1, pack_order="incidence")


@pytest.mark.parametrize("seg", [2, 4])
@pytest.mark.parametrize("cluster", [False, True])
def test_incidence_plan_reconstructs_dense(rng, seg, cluster):
    n = 520
    a = community_csr(rng, n, comm=40)
    cfg = PlanConfig(
        128, 128, gather_segment=seg, block_unroll=2,
        cluster_cols=cluster, pack_order="incidence",
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    assert plan.src_perm is not None
    dense = plan_to_dense(plan)
    np.testing.assert_array_equal(
        dense[:, :n], (a.toarray() != 0).astype(np.uint8)
    )


@pytest.mark.parametrize("seg,subtile", [(2, False), (4, True)])
def test_incidence_spmm_matches_oracle(rng, seg, subtile):
    from voltrix_spmm_tpu.ops import spmm_pallas

    n, d = 400, 64
    a = community_csr(rng, n, comm=32)
    cfg = PlanConfig(
        128, 128, gather_segment=seg, block_unroll=2,
        cluster_cols=subtile, pack_order="incidence",
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm_pallas(plan, feat, subtile=subtile))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_incidence_spmm_reference_matches_oracle(rng):
    from voltrix_spmm_tpu.ops.reference import spmm_reference

    n, d = 300, 32
    a = community_csr(rng, n, comm=30)
    cfg = PlanConfig(128, 128, gather_segment=4, pack_order="incidence")
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm_reference(plan, feat))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_incidence_streamed_matches_oracle(rng):
    from voltrix_spmm_tpu.ops import spmm_streamed

    n, d = 640, 48
    a = community_csr(rng, n, comm=64)
    cfg = PlanConfig(128, 128, gather_segment=4, pack_order="incidence")
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm_streamed(plan, feat, num_chunks=3))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_incidence_save_load_roundtrip(rng, tmp_path):
    from voltrix_spmm_tpu.format.plan import SpmmPlan

    n = 260
    a = random_csr(rng, n, 0.05)
    cfg = PlanConfig(128, 128, gather_segment=2, pack_order="incidence")
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    path = plan.save(os.path.join(tmp_path, "p.npz"))
    plan2 = SpmmPlan.load(path)
    assert plan2.src_perm is not None
    np.testing.assert_array_equal(
        np.asarray(plan.src_perm), np.asarray(plan2.src_perm)
    )
    np.testing.assert_array_equal(plan_to_dense(plan), plan_to_dense(plan2))


def test_incidence_plan_is_jit_arg(rng):
    import jax
    import jax.numpy as jnp

    from voltrix_spmm_tpu.ops import spmm_pallas

    n, d = 280, 32
    a = random_csr(rng, n, 0.04)
    cfg = PlanConfig(128, 128, gather_segment=2, pack_order="incidence")
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy").device()
    feat = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out = jax.jit(lambda p, x: spmm_pallas(p, x))(plan, feat)
    np.testing.assert_allclose(
        np.asarray(out), spmm_oracle(a, np.asarray(feat)),
        rtol=2e-5, atol=2e-5,
    )


def test_fused_and_int8_refuse_incidence_plans(rng):
    from voltrix_spmm_tpu.ops import spmm_pallas_fused, spmm_pallas_int8

    n = 256
    a = random_csr(rng, n, 0.05)
    cfg = PlanConfig(128, 128, gather_segment=2, pack_order="incidence")
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    feat = np.zeros((n, 32), np.float32)
    with pytest.raises(ValueError, match="incidence"):
        spmm_pallas_fused(plan, feat)
    with pytest.raises(ValueError, match="incidence"):
        spmm_pallas_int8(plan, feat)


# ------------------------------------------------- density-split hybrid


@pytest.mark.parametrize("subtile", [False, True])
def test_hybrid_pregather_matches_oracle(rng, subtile):
    from voltrix_spmm_tpu.ops import spmm_pallas_hybrid

    n, d = 512, 64
    a = community_csr(rng, n, comm=64)
    cfg = PlanConfig(
        128, 128, gather_segment=8, block_unroll=2, cluster_cols=subtile
    )
    hp = csr_preprocess_hybrid(
        a.indptr, a.indices, n, dense_config=cfg, backend="numpy"
    )
    stats = hybrid_stats(hp)
    assert stats["dense"]["nnz"] + stats["sparse"]["nnz"] == stats["num_edges"]
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(
        spmm_pallas_hybrid(
            hp, feat, dense_impl="pregather", subtile=subtile
        )
    )
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_hybrid_pregather_via_tuner_run_variant(rng):
    from voltrix_spmm_tpu.tuner import Variant
    from voltrix_spmm_tpu.tuner.tuner import _run_variant, build_variant_plan

    n, d = 384, 32
    a = community_csr(rng, n, comm=32)
    v = Variant(
        "hybrid", block_h=128, gather_segment=8, block_unroll=2,
        subtile=True, hybrid_dense="pregather",
    )
    plan = build_variant_plan(
        v, a.indptr, a.indices, n, None, backend="numpy"
    )
    feat = rng.standard_normal((n, d)).astype(np.float32)
    import jax.numpy as jnp

    out = np.asarray(_run_variant(v, plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_variant_keys_distinguish_new_knobs():
    from voltrix_spmm_tpu.tuner import Variant

    base = Variant("pregather", block_h=256, gather_segment=4)
    inc = dataclasses.replace(base, pack_order="incidence")
    assert base.key() != inc.key()
    hy = Variant("hybrid", block_h=256, gather_segment=8)
    hyp = dataclasses.replace(hy, hybrid_dense="pregather")
    assert hy.key() != hyp.key()
    assert inc.plan_config.pack_order == "incidence"


def test_default_space_offers_split_hybrid():
    from voltrix_spmm_tpu.tuner import default_space

    # width gate: q=8 super-rows must stay under 512 B -> d <= 32 bf16
    space = default_space(
        d=32, nnz=1_000_000, coverage128=2.0, gather_rows=600_000,
        num_nodes=100_000, pack_ratio2=1.6, pack_ratio4=2.0,
        split_rows8=0.45, split_slots8=1.2,
    )
    hybs = [
        v for v in space
        if v.impl == "hybrid" and v.hybrid_dense == "pregather"
    ]
    assert len(hybs) == 1 and hybs[0].subtile
    # gate closed -> candidate absent
    space2 = default_space(
        d=32, nnz=1_000_000, coverage128=2.0, gather_rows=600_000,
        num_nodes=100_000, split_rows8=0.9, split_slots8=1.2,
    )
    # and the width gate alone closes it at d=256
    space3 = default_space(
        d=256, nnz=1_000_000, coverage128=2.0, gather_rows=600_000,
        num_nodes=100_000, pack_ratio2=1.6, pack_ratio4=2.0,
        split_rows8=0.45, split_slots8=1.2,
    )
    assert not any(
        v.impl == "hybrid" and v.hybrid_dense == "pregather" for v in space3
    )
    assert not any(
        v.impl == "hybrid" and v.hybrid_dense == "pregather" for v in space2
    )


# ---------------------------------------------- interleaved packed (ipack)


def test_ipack_requires_unroll_multiple():
    with pytest.raises(AssertionError):
        PlanConfig(128, 128, gather_segment=4, block_unroll=2,
                   seg_interleaved=True)
    with pytest.raises(AssertionError):
        PlanConfig(128, 128, gather_segment=1, seg_interleaved=True)


@pytest.mark.parametrize(
    "seg,unroll", [(2, 2), (2, 4), (4, 4), (8, 8)],
    ids=["q2u2", "q2u4", "q4u4", "q8u8"],
)
@pytest.mark.parametrize("cluster", [False, True], ids=["plain", "cluster"])
def test_ipack_plan_reconstructs_dense(rng, seg, unroll, cluster):
    n = 530
    a = community_csr(rng, n, comm=48)
    cfg = PlanConfig(
        128, 128, gather_segment=seg, block_unroll=unroll,
        cluster_cols=cluster, seg_interleaved=True,
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    dense = plan_to_dense(plan)
    np.testing.assert_array_equal(
        dense[:, :n], (a.toarray() != 0).astype(np.uint8)
    )


@pytest.mark.parametrize(
    "seg,unroll,subtile",
    [(2, 2, False), (2, 4, True), (4, 4, True), (8, 8, True)],
    ids=["q2u2", "q2u4st", "q4u4st", "q8u8st"],
)
def test_ipack_spmm_matches_oracle(rng, seg, unroll, subtile):
    from voltrix_spmm_tpu.ops import spmm_pallas

    n, d = 440, 64
    a = community_csr(rng, n, comm=40)
    cfg = PlanConfig(
        128, 128, gather_segment=seg, block_unroll=unroll,
        cluster_cols=subtile, seg_interleaved=True,
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm_pallas(plan, feat, subtile=subtile))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_ipack_feature_chunking_matches_oracle(rng):
    # block_d < d exercises the chunk-major wide-row prep
    from voltrix_spmm_tpu.ops import spmm_pallas

    n, d = 300, 256
    a = community_csr(rng, n, comm=32)
    cfg = PlanConfig(
        128, 128, gather_segment=4, block_unroll=4, seg_interleaved=True
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm_pallas(plan, feat, block_d=128))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_ipack_incidence_compose_matches_oracle(rng):
    from voltrix_spmm_tpu.ops import spmm_pallas

    n, d = 400, 48
    a = community_csr(rng, n, comm=32)
    cfg = PlanConfig(
        128, 128, gather_segment=4, block_unroll=4, cluster_cols=True,
        pack_order="incidence", seg_interleaved=True,
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    assert plan.src_perm is not None
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm_pallas(plan, feat, subtile=True))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_ipack_streamed_matches_oracle(rng):
    from voltrix_spmm_tpu.ops import spmm_streamed

    n, d = 640, 32
    a = community_csr(rng, n, comm=64)
    cfg = PlanConfig(
        128, 128, gather_segment=2, block_unroll=2, seg_interleaved=True
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    feat = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(spmm_streamed(plan, feat, num_chunks=3))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_ipack_hybrid_via_run_variant(rng):
    from voltrix_spmm_tpu.tuner import Variant
    from voltrix_spmm_tpu.tuner.tuner import _run_variant, build_variant_plan

    n, d = 384, 32
    a = community_csr(rng, n, comm=32)
    v = Variant(
        "hybrid", block_h=128, gather_segment=8, block_unroll=8,
        subtile=True, hybrid_dense="pregather", ipack=True,
    )
    plan = build_variant_plan(v, a.indptr, a.indices, n, None, backend="numpy")
    feat = rng.standard_normal((n, d)).astype(np.float32)
    import jax.numpy as jnp

    out = np.asarray(_run_variant(v, plan, jnp.asarray(feat)))
    np.testing.assert_allclose(out, spmm_oracle(a, feat), rtol=2e-5, atol=2e-5)


def test_ipack_fused_refuses(rng):
    from voltrix_spmm_tpu.ops import spmm_pallas_fused

    n = 256
    a = random_csr(rng, n, 0.05)
    cfg = PlanConfig(
        128, 128, gather_segment=2, block_unroll=2, seg_interleaved=True
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    with pytest.raises(ValueError, match="interleaved"):
        spmm_pallas_fused(plan, np.zeros((n, 32), np.float32))


def test_ipack_variant_key_and_config():
    from voltrix_spmm_tpu.tuner import Variant

    v = Variant(
        "pregather", block_h=256, gather_segment=4, block_unroll=4,
        ipack=True,
    )
    assert "ik" in v.key()
    assert v.plan_config.seg_interleaved


def test_public_spmm_dispatch_round5_layouts(rng):
    # ops.spmm auto-dispatch must route interleaved / incidence plans
    # to pregather (seg>=8 used to mean fused) and subtiled hybrids to
    # the subtile kernels
    from voltrix_spmm_tpu.ops import spmm

    n, d = 384, 32
    a = community_csr(rng, n, comm=32)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    want = spmm_oracle(a, feat)

    cfg = PlanConfig(
        128, 128, gather_segment=8, block_unroll=8, cluster_cols=True,
        seg_interleaved=True,
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    out = np.asarray(spmm(plan, feat))
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)

    inc = PlanConfig(128, 128, gather_segment=4, pack_order="incidence")
    plan2 = csr_preprocess(a.indptr, a.indices, n, inc, backend="numpy")
    out2 = np.asarray(spmm(plan2, feat))
    np.testing.assert_allclose(out2, want, rtol=2e-5, atol=2e-5)

    hp = csr_preprocess_hybrid(
        a.indptr, a.indices, n,
        dense_config=PlanConfig(
            128, 128, gather_segment=8, block_unroll=8,
            cluster_cols=True, seg_interleaved=True,
        ),
        backend="numpy",
    )
    out3 = np.asarray(spmm(hp, feat))
    np.testing.assert_allclose(out3, want, rtol=2e-5, atol=2e-5)
