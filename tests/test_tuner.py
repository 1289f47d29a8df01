"""Autotuner tests: correctness of the tuned kernel, cache semantics.

Mirrors the reference tuner behaviors: per-(matrix, shape) caching
(tuner.py:60-65), validity filtering (tuner.py:108-116), hash_tag
override (jit_kernels/spmm.py:17-36)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from voltrix_spmm_tpu.ops import spmm_scipy
from voltrix_spmm_tpu.tuner import SpmmTuner, Variant, default_space


def tiny_space():
    return [
        Variant("pregather", block_h=32),
        Variant("fused", block_h=32, gather_segment=8),
    ]


@pytest.fixture
def problem(rng):
    n, d = 256, 64
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    feat = rng.standard_normal((n, d)).astype(np.float32)
    oracle = spmm_scipy(a.indptr, a.indices, n, feat).astype(np.float32)
    return a, feat, oracle


def test_tuned_result_correct(problem, tmp_path):
    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space(), iters=1
    )
    out = np.asarray(tuned(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)
    assert tuned.time_ms > 0
    assert len(tuned.candidates) == 2


def test_memory_and_disk_cache(problem, tmp_path):
    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    t1 = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space(), iters=1
    )
    # memory hit returns the same object
    t2 = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space(), iters=1
    )
    assert t1 is t2
    # a fresh tuner (new process stand-in) hits the disk entry
    entries = [f for f in os.listdir(tmp_path) if f.startswith("tune.")]
    assert len(entries) == 1
    fresh = SpmmTuner(cache_dir=str(tmp_path))
    t3 = fresh.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space(), iters=1
    )
    assert t3 is not t1
    assert t3.variant == t1.variant
    out = np.asarray(t3(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_invalid_candidate_skipped(problem, tmp_path):
    a, feat, _ = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    space = [
        Variant("pregather", block_h=32),
        # invalid: fused requires gather_segment >= 8
        Variant("fused", block_h=32, gather_segment=1),
    ]
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=space, iters=1
    )
    assert tuned.variant.impl == "pregather"
    assert (
        tuned.candidates["identity|fused/h32w128s1u1/dNone/float32/None/tNone"]
        == float("inf")
    )


def test_hash_tag_controls_signature(problem, tmp_path):
    a, feat, _ = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space(),
        hash_tag="mygraph", iters=1,
    )
    entries = [f for f in os.listdir(tmp_path) if f.startswith("tune.mygraph")]
    assert len(entries) == 1
    payload = json.load(open(os.path.join(tmp_path, entries[0])))
    assert "variant" in payload and "candidates" in payload


def test_reordering_selection(problem, tmp_path):
    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=tiny_space()[:1], iters=1,
        reorderings=("identity", "rcm", "degree"),
    )
    # 3 orderings x 1 variant raced
    assert len(tuned.candidates) == 3
    assert tuned.ordering in ("identity", "rcm", "degree")
    import jax.numpy as jnp

    out = np.asarray(tuned(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)
    # disk reload preserves the ordering and still computes correctly
    fresh = SpmmTuner(cache_dir=str(tmp_path))
    t2 = fresh.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=tiny_space()[:1], iters=1,
        reorderings=("identity", "rcm", "degree"),
    )
    assert t2.ordering == tuned.ordering
    out2 = np.asarray(t2(jnp.asarray(feat)))
    np.testing.assert_allclose(out2, oracle, rtol=1e-5, atol=1e-4)


def test_default_space_shapes():
    assert all(isinstance(v, Variant) for v in default_space())
    accurate = default_space(accurate=True)
    assert all(v.compute_dtype == "float32" for v in accurate)
