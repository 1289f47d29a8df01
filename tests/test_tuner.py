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


def test_default_space_d_pruning():
    # int8 measured a loss at EVERY d (r2: 3x at d256, 1.3-1.6x at
    # d1024) — never in the default space; explicit variants still work
    assert not any(v.impl == "int8" for v in default_space(d=256))
    assert not any(v.impl == "int8" for v in default_space(d=1024))
    assert not any(v.impl == "int8" for v in default_space())


def test_default_space_coverage_gate():
    # fused bulk-DMA candidates only where coverage waste is low: on
    # scattered graphs the seg=128 plan is GBs and 3-4x slower (measured
    # r2: rmat-17 coverage 1.75 rows/nnz)
    dense = default_space(d=256, coverage128=0.1)
    assert any(
        v.impl == "fused" and v.gather_segment == 128 for v in dense
    )
    scattered = default_space(d=256, coverage128=1.75, coverage32=1.2)
    assert not any(v.impl == "fused" for v in scattered)
    unknown = default_space(d=256)  # no coverage info: keep the candidate
    assert any(v.impl == "fused" for v in unknown)
    # mid-locality: s128 too wasteful, s32 covers cheaply -> s32 joins
    mid = default_space(d=256, coverage128=0.9, coverage32=0.3)
    assert any(
        v.impl == "fused" and v.gather_segment == 32 for v in mid
    )
    assert not any(v.gather_segment == 128 for v in mid)


def test_coverage_expansion_values():
    from voltrix_spmm_tpu.format.preprocess import coverage_expansion

    n = 16384
    # worst case: one row, every neighbor in its own 128-aligned segment
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = 128
    scattered = np.arange(128, dtype=np.int64) * 128
    assert coverage_expansion(indptr, scattered, n, 2048, 128) == 128.0
    # best case: one row with a dense 16384-neighbor run -> expansion 1.0
    indptr2 = np.zeros(n + 1, np.int64)
    indptr2[1:] = n
    assert (
        coverage_expansion(indptr2, np.arange(n, dtype=np.int64), n, 2048, 128)
        == 1.0
    )
    # empty graph
    assert (
        coverage_expansion(np.zeros(n + 1, np.int64), np.zeros(0, np.int64), n, 2048, 128)
        == 0.0
    )


def test_hash_tag_skips_content_hash(problem, tmp_path, monkeypatch):
    """With an explicit hash_tag the tuner must never touch the matrix
    content hash (the reference's tag-beats-hash protocol,
    jit_kernels/spmm.py:17-36) — not even on cold calls."""
    from voltrix_spmm_tpu.tuner import tuner as tuner_mod

    a, feat, _ = problem

    def boom(*_a, **_k):
        raise AssertionError("_matrix_hash called despite hash_tag")

    monkeypatch.setattr(tuner_mod, "_matrix_hash", boom)
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    t1 = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space()[:1],
        hash_tag="tagged", iters=1,
    )
    # memory hit: also hash-free
    t2 = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space()[:1],
        hash_tag="tagged", iters=1,
    )
    assert t1 is t2


def test_budget_early_stop(problem, tmp_path):
    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    # zero budget: first candidate still times (a best is required), the
    # rest are skipped
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space(), iters=1,
        budget_s=0.0,
    )
    assert len(tuned.candidates) == 1
    out = np.asarray(tuned(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_feat_dtype_variant_accuracy(problem, tmp_path):
    """bf16 storage variants return the input dtype and stay inside the
    bf16 accuracy class (rel err <= 1e-2, the BASELINE target)."""
    from voltrix_spmm_tpu.utils import relative_error

    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=[Variant("pregather", block_h=32, feat_dtype="bfloat16")],
        iters=1,
    )
    out = tuned(jnp.asarray(feat))
    assert out.dtype == jnp.float32  # output restored to the input dtype
    assert relative_error(oracle, np.asarray(out)) <= 1e-2


def test_serial_compile_path(problem, tmp_path):
    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=tiny_space(), iters=1,
        parallel_compile=False,
    )
    out = np.asarray(tuned(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_weighted_tuning_correct(problem, tmp_path):
    """values= routes to the weighted space; the winner computes the
    weighted product (round-2 verdict: tuner had zero weighted variants)."""
    a, feat, _ = problem
    vals = np.random.default_rng(5).standard_normal(a.nnz).astype(np.float32)
    aw = sp.csr_matrix((vals, a.indices, a.indptr), shape=a.shape)
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    space = [
        Variant("ell", block_h=64, block_unroll=2),
        Variant("ell", block_h=128),
        Variant("weighted", block_h=64),
    ]
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=space, iters=1, values=vals,
    )
    out = np.asarray(tuned(jnp.asarray(feat)))
    np.testing.assert_allclose(out, aw @ feat, rtol=1e-4, atol=1e-3)
    assert tuned.variant.impl in ("ell", "weighted")


def test_weighted_tuning_rejects_binary_variants(problem, tmp_path):
    a, feat, _ = problem
    vals = np.ones(a.nnz, np.float32)
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    with pytest.raises(AssertionError, match="no valid tuning candidate"):
        # every candidate is binary -> all invalid -> no winner
        tuner.compile_and_tune(
            a.indptr, a.indices, a.shape[0], feat,
            space=[Variant("pregather", block_h=32)], iters=1, values=vals,
        )


def test_weighted_signature_distinct(problem, tmp_path):
    """Weighted and binary tunes of the same matrix get different cache
    entries (a shared entry would replay a binary winner for weighted)."""
    a, feat, _ = problem
    vals = np.ones(a.nnz, np.float32)
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=[Variant("pregather", block_h=32)], iters=1, hash_tag="g",
    )
    tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=[Variant("ell", block_h=64, block_unroll=2)], iters=1,
        hash_tag="g", values=vals,
    )
    entries = [f for f in os.listdir(tmp_path) if f.startswith("tune.g")]
    assert len(entries) == 2, entries


def test_weighted_tuning_with_reordering(problem, tmp_path):
    """Per-edge values ride through row reorderings correctly."""
    a, feat, _ = problem
    vals = np.random.default_rng(9).standard_normal(a.nnz).astype(np.float32)
    aw = sp.csr_matrix((vals, a.indices, a.indptr), shape=a.shape)
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=[Variant("ell", block_h=64, block_unroll=2)], iters=1,
        values=vals, reorderings=("identity", "degree"),
    )
    out = np.asarray(tuned(jnp.asarray(feat)))
    np.testing.assert_allclose(out, aw @ feat, rtol=1e-4, atol=1e-3)


def test_weighted_default_space_shapes():
    from voltrix_spmm_tpu.tuner import weighted_default_space

    small = weighted_default_space(d=256, nnz=100_000,
                                   dense_slots_per_nnz=4.0)
    assert any(v.impl == "weighted" for v in small)
    assert any(v.impl == "ell" for v in small)
    sparse = weighted_default_space(d=256, nnz=100_000,
                                    dense_slots_per_nnz=100.0)
    assert not any(v.impl == "weighted" for v in sparse)
    huge = weighted_default_space(d=1024, nnz=40_000_000)
    assert all(v.stream_chunks for v in huge)


def test_weighted_memory_cache_fresh_values(problem, tmp_path):
    """Same-structure tunes with DIFFERENT values must not share a
    memory entry: the cached TunedSpmm embeds its value plane, so a
    stale hit silently computes (A o V1)@x for a V2 call."""
    a, feat, _ = problem
    rng = np.random.default_rng(11)
    v1 = rng.standard_normal(a.nnz).astype(np.float32)
    v2 = rng.standard_normal(a.nnz).astype(np.float32)
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    space = [Variant("ell", block_h=64, block_unroll=2)]
    t1 = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=space, iters=1, hash_tag="vals", values=v1,
    )
    out1 = np.asarray(t1(jnp.asarray(feat)))
    t2 = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=space, iters=1, hash_tag="vals", values=v2,
    )
    out2 = np.asarray(t2(jnp.asarray(feat)))
    aw1 = sp.csr_matrix((v1, a.indices, a.indptr), shape=a.shape)
    aw2 = sp.csr_matrix((v2, a.indices, a.indptr), shape=a.shape)
    np.testing.assert_allclose(out1, aw1 @ feat, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out2, aw2 @ feat, rtol=1e-4, atol=1e-3)
    # and identical values DO hit the memory cache
    t3 = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=space, iters=1, hash_tag="vals", values=v2,
    )
    assert t3 is t2


def test_explicit_space_is_part_of_cache_identity(problem, tmp_path):
    """Adding candidates to an explicit `space=` must re-race, not
    return the previous winner from disk (observed: bench.py's new
    candidates never ran because the key ignored the space)."""
    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    space_a = [Variant("pregather", block_h=128, block_unroll=2)]
    t1 = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=space_a, iters=1
    )
    assert len(t1.candidates) == 1
    # a fresh tuner sharing the disk cache, now with a LARGER space:
    # the new candidate must be raced (2 entries), not short-circuited
    space_b = space_a + [Variant("pregather", block_h=256, block_unroll=2)]
    fresh = SpmmTuner(cache_dir=str(tmp_path))
    t2 = fresh.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=space_b, iters=1
    )
    assert len(t2.candidates) == 2
    # same space again -> disk hit (no re-race)
    again = SpmmTuner(cache_dir=str(tmp_path))
    t3 = again.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=space_b, iters=1
    )
    assert set(t3.candidates) == set(t2.candidates)
    out = np.asarray(t2(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_isolated_probe_tuning(problem, tmp_path):
    """isolate=True times every candidate in its own subprocess (the
    huge-graph session-poisoning defense; tuner/probe.py) and returns
    a correct winner."""
    a, feat, oracle = problem
    tuner = SpmmTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat,
        space=tiny_space(), iters=1, isolate=True,
        # probes are pinned to the parent's CPU backend (tuner.py env
        # scrub) so each costs ~2 s of interpreter startup, not a
        # 73 s relay dial; the bound keeps a 1-core box honest
        probe_timeout_s=120.0,
    )
    assert len(tuned.candidates) == 2
    assert all(np.isfinite(v) for v in tuned.candidates.values()), (
        tuned.candidates
    )
    out = np.asarray(tuned(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


def test_partial_race_resume(problem, tmp_path):
    """A race killed mid-way (relay drop / attempt timeout) leaves a
    `.partial` sidecar of per-candidate times; the next race with the
    same signature must prefill those instead of re-timing them, and
    must rebuild the winner's plan (partials never carry plans)."""
    a, feat, oracle = problem
    space = tiny_space()
    t1 = SpmmTuner(cache_dir=str(tmp_path)).compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=space, iters=1
    )
    # a COMPLETED race must not leave a resume sidecar behind
    assert not any(f.endswith(".partial") for f in os.listdir(tmp_path))
    (disk,) = [f for f in os.listdir(tmp_path) if f.startswith("tune.")]
    # simulate the mid-race kill: drop the final entry, plant a partial
    # with an absurdly fast time for ONE candidate
    fake_key = sorted(t1.candidates)[0]
    with open(os.path.join(tmp_path, disk + ".partial"), "w") as f:
        json.dump({"results": {fake_key: 1e-6}}, f)
    os.unlink(os.path.join(tmp_path, disk))
    t2 = SpmmTuner(cache_dir=str(tmp_path)).compile_and_tune(
        a.indptr, a.indices, a.shape[0], feat, space=space, iters=1
    )
    # the planted time was trusted (not re-timed) and wins the race...
    assert t2.time_ms == 1e-6
    assert f"identity|{t2.variant.key()}" == fake_key
    # ...the other candidate was timed fresh, the winner's plan was
    # rebuilt, and the finished race cleaned up its sidecar
    assert len(t2.candidates) == 2
    assert all(np.isfinite(v) for v in t2.candidates.values())
    assert not any(f.endswith(".partial") for f in os.listdir(tmp_path))
    out = np.asarray(t2(jnp.asarray(feat)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-4)


# ---- attention tuner ----


def attn_tiny_space():
    from voltrix_spmm_tpu.tuner import AttnVariant

    return [
        AttnVariant(block_h=32, block_unroll=1),
        AttnVariant(block_h=64, block_unroll=1),
        AttnVariant(block_h=32, block_unroll=1, plane_dtype="bfloat16"),
    ]


@pytest.fixture
def attn_problem(rng):
    n = 192
    a = sp.random(n, n, density=0.06, format="csr", random_state=rng)
    at = a.T.tocsr()
    return a, at


def test_attention_tuned_correct(attn_problem, tmp_path, rng):
    """The tuned callable matches the untuned mh op head-for-head, the
    race keeps per-candidate times, and the winner is a real variant."""
    from voltrix_spmm_tpu.ops.attention_mh import spmm_attention_mh_ad
    from voltrix_spmm_tpu.tuner import AttentionTuner

    a, at = attn_problem
    n = a.shape[0]
    tuner = AttentionTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, n,
        at_indptr=at.indptr, at_indices=at.indices,
        heads=2, dk=8, dv=12, mode="fwd", space=attn_tiny_space(),
        iters=1,
    )
    assert tuned.time_ms > 0
    assert len(tuned.candidates) == 3
    q = jnp.asarray(rng.standard_normal((2, n, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, n, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, n, 12)).astype(np.float32))
    got = np.asarray(tuned(q, k, v))
    want = np.asarray(
        spmm_attention_mh_ad(
            tuned.plan, q, k, v, plan_t=tuned.plan_t, negative_slope=0.2,
        )
    )
    # same op modulo the winner's plane dtype
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_attention_tuner_cache(attn_problem, tmp_path):
    """Memory hit returns the same object; a fresh tuner materializes
    the winner from disk without re-racing (candidate dict preserved)."""
    from voltrix_spmm_tpu.tuner import AttentionTuner

    a, at = attn_problem
    n = a.shape[0]
    t0 = AttentionTuner(cache_dir=str(tmp_path))
    kw = dict(
        at_indptr=at.indptr, at_indices=at.indices,
        heads=2, dk=8, dv=12, mode="fwd", space=attn_tiny_space(), iters=1,
    )
    t1 = t0.compile_and_tune(a.indptr, a.indices, n, **kw)
    assert t0.compile_and_tune(a.indptr, a.indices, n, **kw) is t1
    entries = [f for f in os.listdir(tmp_path) if f.startswith("tune_attn.")]
    assert len(entries) == 1
    fresh = AttentionTuner(cache_dir=str(tmp_path))
    t2 = fresh.compile_and_tune(a.indptr, a.indices, n, **kw)
    assert t2.variant == t1.variant
    assert set(t2.candidates) == set(t1.candidates)


def test_attention_train_mode(attn_problem, tmp_path):
    """mode='train' races value_and_grad through the op (fwd + dQ +
    dK/dV kernels) and returns a usable winner."""
    from voltrix_spmm_tpu.tuner import AttentionTuner, AttnVariant

    a, at = attn_problem
    n = a.shape[0]
    tuner = AttentionTuner(cache_dir=str(tmp_path))
    tuned = tuner.compile_and_tune(
        a.indptr, a.indices, n,
        at_indptr=at.indptr, at_indices=at.indices,
        heads=2, dk=8, dv=8, mode="train",
        space=[AttnVariant(block_h=32, block_unroll=1)], iters=1,
    )
    assert tuned.time_ms > 0 and np.isfinite(tuned.time_ms)
