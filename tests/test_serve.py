"""Serving layer: AOT compile, StableHLO export round trips, bundles.

CPU tests export pure-XLA formulations (spmm_reference, dense layers);
the Pallas-kernel export itself is exercised in the on-device tier
(test_tpu_device.py) because interpret-mode pallas is not a serializable
program.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from voltrix_spmm_tpu import csr_preprocess
from voltrix_spmm_tpu.ops import spmm_reference, spmm_scipy
from voltrix_spmm_tpu.serve import (
    aot_compile,
    compiled_stats,
    export_servable,
    load_bundle,
    load_servable,
    save_bundle,
)


def _problem(rng, n=512, density=0.02, d=64):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat).astype(np.float32)
    return a, feat, oracle


def test_export_roundtrip_spmm(rng):
    a, feat, oracle = _problem(rng)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0])

    def fwd(x):
        return spmm_reference(plan, x)

    blob = export_servable(fwd, feat)
    assert isinstance(blob, bytes) and len(blob) > 0
    served = load_servable(blob)
    out = np.asarray(served(feat))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-5)


def test_export_polymorphic_batch():
    w = jnp.asarray(np.random.default_rng(1).standard_normal((16, 8)), jnp.float32)

    def fwd(x):
        return jax.nn.relu(x @ w)

    x4 = jnp.ones((4, 16), jnp.float32)
    blob = export_servable(fwd, x4, polymorphic_shapes=("b, _",))
    served = load_servable(blob)
    # one artifact serves multiple batch sizes
    assert served(jnp.ones((4, 16), jnp.float32)).shape == (4, 8)
    assert served(jnp.ones((32, 16), jnp.float32)).shape == (32, 8)


def test_aot_compile_runs_and_reports(rng):
    a, feat, oracle = _problem(rng)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0])

    def fwd(x):
        return spmm_reference(plan, x)

    compiled = aot_compile(fwd, feat)
    out = np.asarray(compiled(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-5)
    stats = compiled_stats(compiled)
    assert isinstance(stats, dict)


def test_aot_compile_pallas_interpret(rng):
    # the full library path (gather + pallas kernel, interpret on CPU)
    # AOT-compiles and serves
    from voltrix_spmm_tpu.ops import spmm_pallas

    a, feat, oracle = _problem(rng)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0])
    compiled = aot_compile(lambda x: spmm_pallas(plan, x), feat)
    out = np.asarray(compiled(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-4)


def test_bundle_roundtrip(tmp_path, rng):
    a, feat, oracle = _problem(rng)
    plan = csr_preprocess(a.indptr, a.indices, a.shape[0])

    def fwd(x):
        return spmm_reference(plan, x)

    blob = export_servable(fwd, feat)
    path = str(tmp_path / "svc")
    save_bundle(path, blob, plan=plan, meta={"graph": "er-512", "d": 64})
    bundle = load_bundle(path)
    out = np.asarray(bundle(feat))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-5)
    assert bundle.meta["graph"] == "er-512"
    assert "jax_version" in bundle.meta
    # the plan rides alongside and reloads with identical geometry
    assert bundle.plan is not None
    assert bundle.plan.total_blocks == plan.total_blocks
    np.testing.assert_array_equal(
        np.asarray(bundle.plan.bitmask), np.asarray(plan.bitmask)
    )


def test_bundle_without_plan(tmp_path):
    def fwd(x):
        return x * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    blob = export_servable(fwd, x)
    path = str(tmp_path / "svc2")
    save_bundle(path, blob)
    bundle = load_bundle(path)
    assert bundle.plan is None
    np.testing.assert_allclose(np.asarray(bundle(x)), 2.0)
