"""Plan validator + block-diagonal batching tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.data.batching import block_diagonal, split_nodes
from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
from voltrix_spmm_tpu.format.diagnostics import PlanInvariantError, validate_plan


@pytest.mark.parametrize(
    "cfg",
    [
        PlanConfig(32, 128),
        PlanConfig(128, 128, gather_segment=8),
        PlanConfig(32, 128, block_unroll=4),
        PlanConfig(64, 256, gather_segment=16, block_unroll=2),
    ],
)
@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_valid_plans_pass(rng, cfg, backend):
    if backend == "native":
        from voltrix_spmm_tpu.runtime import native_available

        if not native_available():
            pytest.skip("no toolchain")
    a = sp.random(500, 500, density=0.03, format="csr", random_state=rng)
    plan = csr_preprocess(a.indptr, a.indices, 500, cfg, backend=backend)
    validate_plan(plan)  # must not raise


def test_corrupt_plan_detected(rng):
    import dataclasses

    a = sp.random(300, 300, density=0.03, format="csr", random_state=rng)
    plan = csr_preprocess(a.indptr, a.indices, 300, PlanConfig(32, 128))
    bad = np.asarray(plan.hind).copy()
    bad[0, 0] = 10**6  # out-of-range gather index
    with pytest.raises(PlanInvariantError, match="hind within"):
        validate_plan(dataclasses.replace(plan, hind=bad))

    wob = np.asarray(plan.window_of_block).copy()
    if wob.shape[0] > 1:
        wob[0] = wob[-1]  # break monotone window assignment
        with pytest.raises(PlanInvariantError, match="window_of_block"):
            validate_plan(dataclasses.replace(plan, window_of_block=wob))


def test_block_diagonal_batching(rng):
    import jax.numpy as jnp

    from voltrix_spmm_tpu.ops import spmm_pallas, spmm_scipy

    graphs = [
        sp.random(n, n, density=0.1, format="csr", random_state=rng)
        for n in (60, 100, 40)
    ]
    big, offs = block_diagonal(graphs)
    assert big.shape == (200, 200)
    np.testing.assert_array_equal(offs, [0, 60, 160, 200])

    feat = rng.standard_normal((200, 32)).astype(np.float32)
    plan = csr_preprocess(big.indptr, big.indices, 200, PlanConfig(32, 128))
    out = np.asarray(spmm_pallas(plan, jnp.asarray(feat)))
    # batched result equals each graph processed alone
    parts = split_nodes(out, offs)
    feats = split_nodes(feat, offs)
    for g, o, f in zip(graphs, parts, feats):
        expect = spmm_scipy(g.indptr, g.indices, g.shape[0], f)
        np.testing.assert_allclose(o, expect, rtol=1e-5, atol=1e-4)
