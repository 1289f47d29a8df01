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
