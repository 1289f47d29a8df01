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
