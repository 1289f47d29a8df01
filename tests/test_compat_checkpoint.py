"""Tuple-compat API + checkpoint tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.ops import spmm_scipy
from voltrix_spmm_tpu.compat import csr_preprocess_tuple, spmm_tuple


def test_tuple_api_matches_reference_shapes(rng):
    n, d = 300, 64
    a = sp.random(n, n, density=0.03, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    cfg = PlanConfig(32, 128)
    blk_offsets, hspa_packed, hind = csr_preprocess_tuple(
        a.indptr, a.indices, n, cfg
    )
    # payload shape protocol parity (reference voltrix/spmm/spmm.py:44-66)
    total_blocks = int(blk_offsets[-1])
    assert hspa_packed.shape == (total_blocks, cfg.words_per_col, cfg.block_w)
    assert hind.shape == (total_blocks, cfg.block_w)
    out = np.asarray(
        spmm_tuple(blk_offsets, hspa_packed, hind, n, a.nnz, jnp.asarray(feat))
    )
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_tuple_api_foreign_arrays(rng):
    # arrays that didn't come from csr_preprocess_tuple (e.g. loaded from
    # disk) still work via plan reconstruction
    n, d = 200, 32
    a = sp.random(n, n, density=0.04, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    blk_offsets, hspa_packed, hind = csr_preprocess_tuple(
        a.indptr, a.indices, n, PlanConfig(32, 128)
    )
    blk2 = blk_offsets.copy()  # different identity -> reconstruction path
    out = np.asarray(
        spmm_tuple(blk2, hspa_packed.copy(), hind.copy(), n, a.nnz, jnp.asarray(feat))
    )
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_tuple_api_no_registry_leak_or_crosstalk(rng):
    """The plan rides the returned blk_offsets array itself: releasing
    the tuple releases the plan (no unbounded registry), and a fresh
    tuple can never pick up a *stale* plan through id() reuse (r1
    advisor finding against the old id-keyed dict)."""
    import gc
    import weakref

    from voltrix_spmm_tpu import compat

    assert not hasattr(compat, "_PLANS")  # registry is gone

    n, d = 160, 16
    a1 = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    blk1, _, _ = csr_preprocess_tuple(a1.indptr, a1.indices, n, PlanConfig(32, 128))
    plan_ref = weakref.ref(blk1._voltrix_plan)
    del blk1
    gc.collect()
    assert plan_ref() is None, "plan must die with its blk_offsets array"

    # a second, different matrix gets its own plan and correct results
    a2 = sp.random(n, n, density=0.08, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    blk2, hspa2, hind2 = csr_preprocess_tuple(
        a2.indptr, a2.indices, n, PlanConfig(32, 128)
    )
    out = np.asarray(spmm_tuple(blk2, hspa2, hind2, n, a2.nnz, jnp.asarray(feat)))
    np.testing.assert_allclose(
        out, spmm_scipy(a2.indptr, a2.indices, n, feat), rtol=1e-5, atol=1e-4
    )


def test_checkpoint_roundtrip(tmp_path):
    from voltrix_spmm_tpu.models import init_gcn
    from voltrix_spmm_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    params = init_gcn(jax.random.PRNGKey(0), 16, 32, 4)
    path = save_checkpoint(str(tmp_path / "ckpt"), params)
    restored = load_checkpoint(path, like=params)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(params[k]), np.asarray(restored[k])
        )
