"""Property-style fuzz: random (graph, geometry, impl) configs vs oracle.

One sweep asserting every implementation agrees with scipy on randomly
drawn problems — the broad-coverage net under the targeted tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.format.diagnostics import validate_plan
from voltrix_spmm_tpu.ops import spmm, spmm_scipy


@pytest.mark.parametrize("trial", range(8))
def test_random_configs_match_oracle(trial):
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(64, 1200))
    d = int(rng.integers(8, 200))
    density = float(rng.uniform(0.002, 0.08))
    block_h = int(rng.choice([32, 64, 128, 256]))
    block_w = int(rng.choice([128, 256]))
    seg = int(rng.choice([1, 8, 16]))
    unroll = int(rng.choice([1, 2, 4]))
    impl = "fused" if seg >= 8 and rng.random() < 0.5 else "pregather"
    subtile = bool(impl == "pregather" and block_h % 128 == 0 and rng.random() < 0.5)

    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat).astype(np.float32)

    cfg = PlanConfig(block_h, block_w, seg, unroll)
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    validate_plan(plan)
    kwargs = {"subtile": True} if subtile else {}
    out = np.asarray(spmm(plan, jnp.asarray(feat), impl=impl, **kwargs))
    np.testing.assert_allclose(
        out,
        oracle,
        rtol=1e-5,
        atol=1e-4,
        err_msg=f"n={n} d={d} dens={density:.3f} cfg={cfg} impl={impl} "
        f"subtile={subtile}",
    )


@pytest.mark.parametrize("trial", range(4))
def test_random_weighted_and_sddmm_match_oracle(trial):
    """Weighted SpMM, per-edge d/dvalues, and SDDMM on random draws."""
    import jax

    from voltrix_spmm_tpu.format import csr_transpose, edge_slot_map
    from voltrix_spmm_tpu.ops import sddmm, spmm_weighted_ad

    rng = np.random.default_rng(5000 + trial)
    n = int(rng.integers(100, 900))
    d = int(rng.integers(8, 150))
    density = float(rng.uniform(0.005, 0.05))
    block_h = int(rng.choice([32, 64, 128]))
    unroll = int(rng.choice([1, 2]))

    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = rng.standard_normal(a.nnz).astype(np.float32)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    g = rng.standard_normal((n, d)).astype(np.float32)
    cfg = PlanConfig(block_h, 128, 1, unroll)

    plan = csr_preprocess(a.indptr, a.indices, n, cfg, values=a.data)
    ptr_t, idx_t, vals_t = csr_transpose(a.indptr, a.indices, n, a.data)
    plan_t = csr_preprocess(ptr_t, idx_t, n, cfg, values=vals_t)
    msg = f"n={n} d={d} dens={density:.3f} cfg={cfg}"

    out = np.asarray(spmm_weighted_ad(plan, plan_t, jnp.asarray(feat)))
    np.testing.assert_allclose(out, a @ feat, rtol=1e-4, atol=1e-3, err_msg=msg)

    dfeat = jax.grad(
        lambda x: jnp.sum(spmm_weighted_ad(plan, plan_t, x) * g)
    )(jnp.asarray(feat))
    np.testing.assert_allclose(
        np.asarray(dfeat), a.T @ g, rtol=1e-4, atol=1e-3, err_msg=msg
    )

    slots = edge_slot_map(plan, a.indptr, a.indices)
    vals = np.asarray(
        sddmm(plan, jnp.asarray(g), jnp.asarray(feat),
              per_edge=jnp.asarray(slots))
    )
    rows = np.repeat(np.arange(n), np.diff(a.indptr))
    want = np.sum(g[rows] * feat[a.indices], axis=1)
    np.testing.assert_allclose(vals, want, rtol=1e-4, atol=1e-3, err_msg=msg)
