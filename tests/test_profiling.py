"""Profiling helper tests (CPU backend)."""

import os

import jax.numpy as jnp

from voltrix_spmm_tpu import profiling


def test_annotate_context():
    with profiling.annotate("test-range"):
        _ = jnp.ones((8, 8)) + 1


def test_compiled_stats_reports_flops():
    stats = profiling.compiled_stats(
        lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64))
    )
    assert stats.get("flops", 0) > 0


def test_trace_writes_artifacts(tmp_path):
    with profiling.trace(str(tmp_path)):
        _ = (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
    assert os.listdir(tmp_path)
