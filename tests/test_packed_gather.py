"""Packed-gather (gather_segment=q pregather) tests.

The v5e gather law is per-ROW up to ~1-2 KB row widths (measured:
~constant Mrows/s from 256 B to 1 KB), so the pregather path can fetch
one (q*d)-wide super-row per q-aligned lane run instead of q thin rows
(`ops/pallas_spmm._gather_rows`). These tests pin:
- numeric parity of packed plans through every pregather entry point
  (plain / subtile+clustered / streamed),
- the run-preserving seg-aware clustering (numpy and native twins),
- the `pack_ratios` host probe and its tuner gates.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess, plan_to_dense
from voltrix_spmm_tpu.format.cluster import block_occupancy, cluster_window_columns
from voltrix_spmm_tpu.format.preprocess import PACK_RATIO_THRESHOLD, pack_ratios
from voltrix_spmm_tpu.ops import spmm_pallas, spmm_scipy, spmm_streamed
from voltrix_spmm_tpu.utils import calc_diff


def graph(rng, n=900, density=0.015):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    return a


@pytest.mark.parametrize("q", [2, 4])
@pytest.mark.parametrize("subtile", [False, True])
def test_packed_pregather_matches_scipy(rng, q, subtile):
    a = graph(rng)
    n, d = a.shape[0], 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    cfg = PlanConfig(
        256, 128, gather_segment=q, block_unroll=2, cluster_cols=subtile
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    out = np.asarray(spmm_pallas(plan, x, subtile=subtile, interpret=True))
    oracle = spmm_scipy(a.indptr, a.indices, n, x)
    assert calc_diff(out, oracle) < 1e-6


@pytest.mark.parametrize("q", [2, 4])
def test_packed_streamed_matches_scipy(rng, q):
    a = graph(rng)
    n, d = a.shape[0], 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    cfg = PlanConfig(256, 128, gather_segment=q, block_unroll=2)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    out = np.asarray(spmm_streamed(plan, x, num_chunks=3, interpret=True))
    oracle = spmm_scipy(a.indptr, a.indices, n, x)
    assert calc_diff(out, oracle) < 1e-6


def test_packed_gather_rows_lane_order(rng):
    """xg rows from the packed reshape must equal feat[hind] lane by
    lane — the aligned-run invariant the whole scheme rests on."""
    import jax.numpy as jnp

    from voltrix_spmm_tpu.ops.pallas_spmm import _gather_rows

    a = graph(rng)
    n, d = a.shape[0], 128  # d already lane-aligned: d_pad == d
    x = rng.standard_normal((n, d)).astype(np.float32)
    for q in (2, 4):
        plan = csr_preprocess(
            a.indptr, a.indices, n,
            PlanConfig(256, 128, gather_segment=q), backend="numpy",
        )
        xg = np.asarray(_gather_rows(plan, jnp.asarray(x), d))
        assert xg.shape == (plan.gather_rows, d)
        n_pad = -(-n // q) * q
        xp = np.zeros((n_pad, d), np.float32)
        xp[:n] = x
        ref = xp[np.asarray(plan.hind).reshape(-1)]
        np.testing.assert_allclose(xg, ref)


@pytest.mark.parametrize("q", [2, 4])
def test_seg_cluster_preserves_matrix_and_runs(rng, q):
    a = graph(rng)
    n = a.shape[0]
    plan = csr_preprocess(
        a.indptr, a.indices, n,
        PlanConfig(256, 128, gather_segment=q), backend="numpy",
    )
    cl = cluster_window_columns(plan)
    # matrix unchanged
    assert np.array_equal(plan_to_dense(cl), plan_to_dense(plan))
    # every lane run still q-aligned: hind[g*q + t] == hind[g*q] + t
    hind = np.asarray(cl.hind).reshape(-1, q)
    assert (hind % q == np.arange(q)[None, :]).all()
    assert (hind == hind[:, :1] + np.arange(q)[None, :]).all()


@pytest.mark.parametrize("q", [2, 4])
def test_native_cluster_seg_matches_numpy(rng, q):
    from voltrix_spmm_tpu.runtime import native_available, native_cluster

    if not native_available():
        pytest.skip("no native toolchain")
    a = graph(rng, n=1200)
    n = a.shape[0]
    cfg = PlanConfig(256, 128, gather_segment=q, block_unroll=2)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg, backend="numpy")
    cn = cluster_window_columns(plan)
    occ_n = block_occupancy(np.asarray(cn.bitmask))
    cv = native_cluster(plan)
    assert np.array_equal(np.asarray(cn.hind), np.asarray(cv.hind))
    assert np.array_equal(np.asarray(cn.bitmask), np.asarray(cv.bitmask))
    assert np.array_equal(occ_n.view(np.int32), np.asarray(cv.occ))


def test_pack_ratios_hand_example():
    # window 0 (rows 0..3, block_h=4) has neighbor cols {0, 1, 5}:
    # q=2 runs {0-1, 4-5} -> 4 slots / 3 lanes; q=4 runs {0-3, 4-7} -> 8/3
    indptr = np.array([0, 2, 3, 3, 3], np.int64)
    indices = np.array([0, 5, 1], np.int64)
    u, r = pack_ratios(indptr, indices, 4, 4, qs=(2, 4))
    assert u == 3
    assert r[2] == pytest.approx(4 / 3)
    assert r[4] == pytest.approx(8 / 3)


def test_default_space_packed_gates():
    from voltrix_spmm_tpu.tuner import default_space

    def packed(space):
        return sorted(
            v.gather_segment
            for v in space
            if v.impl == "pregather" and v.gather_segment > 1
        )

    ok = PACK_RATIO_THRESHOLD - 0.1
    bad = PACK_RATIO_THRESHOLD + 0.1
    # round-5 width gate: the fetch rate collapses past ~512 B rows
    # (exp_frontier_rmat-17.txt), so packed candidates only join while
    # q*d*esz <= 512 — i.e. small d. Each eligible q comes as a
    # (flatten, interleaved) twin pair.
    space = default_space(d=64, pack_ratio2=ok, pack_ratio4=ok)
    assert packed(space) == [2, 2, 4, 4]
    for q in (2, 4):
        assert {
            v.ipack
            for v in space
            if v.impl == "pregather" and v.gather_segment == q
        } == {False, True}
    # d=128 bf16: q2 super-row = 512 B (boundary, in); q4 = 1 KB (out)
    assert packed(default_space(d=128, pack_ratio2=ok, pack_ratio4=ok)) == [2, 2]
    assert packed(default_space(d=64, pack_ratio2=ok, pack_ratio4=bad)) == [2, 2]
    assert packed(default_space(d=64, pack_ratio2=bad, pack_ratio4=bad)) == []
    # d=256 bf16: every super-row exceeds the fast-fetch width
    assert packed(default_space(d=256, pack_ratio2=ok, pack_ratio4=ok)) == []
    # huge regime: packed geometry appears when the h2048 dedup fits
    huge = default_space(
        d=128, nnz=100_000_000, gather_rows=60_000_000,
        num_nodes=250_000, gather_rows_2048=10_000_000,
        device_mem_bytes=12 * 2**30, pack_ratio2=ok, pack_ratio4=bad,
    )
    segs = {
        v.gather_segment for v in huge
        if v.impl == "pregather" and v.subtile
    }
    assert 2 in segs


def test_packed_variant_through_tuner_dispatch(rng):
    """_run_variant on a packed Variant produces the oracle result."""
    from voltrix_spmm_tpu.tuner import Variant
    from voltrix_spmm_tpu.tuner.tuner import _run_variant

    import jax.numpy as jnp

    a = graph(rng)
    n, d = a.shape[0], 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    v = Variant(
        "pregather", block_h=256, block_unroll=2,
        gather_segment=2, subtile=True,
    )
    plan = csr_preprocess(a.indptr, a.indices, n, v.plan_config,
                          backend="numpy")
    out = np.asarray(_run_variant(v, plan, jnp.asarray(x)))
    oracle = spmm_scipy(a.indptr, a.indices, n, x)
    assert calc_diff(out, oracle) < 1e-6
