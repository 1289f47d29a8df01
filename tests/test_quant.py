"""Quantized SpMM tests (int8 gathered stream + per-row scales)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.ops import (
    dequantize_rows,
    quantize_rows,
    spmm_pallas_int8,
    spmm_scipy,
)


def test_quantize_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)) * 10
    q, scale = quantize_rows(x)
    assert q.dtype == jnp.int8 and scale.shape == (64, 1)
    xr = dequantize_rows(q, scale)
    rel = np.linalg.norm(np.asarray(xr - x)) / np.linalg.norm(np.asarray(x))
    assert rel < 1e-2


def test_quantize_zero_row():
    x = jnp.zeros((4, 8), jnp.float32)
    q, scale = quantize_rows(x)
    assert np.asarray(q).sum() == 0
    assert np.isfinite(np.asarray(scale)).all()


@pytest.mark.parametrize("n,density,d", [(512, 0.05, 64), (300, 0.02, 130)])
def test_spmm_int8_close_to_oracle(rng, n, density, d):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    out = np.asarray(spmm_pallas_int8(plan, jnp.asarray(feat)))
    rel = np.linalg.norm(out - oracle) / np.linalg.norm(oracle)
    assert rel < 2e-2, rel


def test_int8_with_outliers(rng):
    # per-row scaling must survive heavy-outlier rows (the reference's
    # quant-test data profile, voltrix/utils.py outlier gen)
    from voltrix_spmm_tpu.utils import gen_outlier_normal

    n, d = 400, 64
    a = sp.random(n, n, density=0.04, format="csr", random_state=rng)
    feat = gen_outlier_normal((n, d), outlier_frac=0.02, seed=1)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat)
    plan = csr_preprocess(a.indptr, a.indices, n, PlanConfig(32, 128))
    out = np.asarray(spmm_pallas_int8(plan, jnp.asarray(feat)))
    rel = np.linalg.norm(out - oracle) / np.linalg.norm(oracle)
    assert rel < 3e-2, rel
