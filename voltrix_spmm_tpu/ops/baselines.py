"""Baseline SpMM implementations for the benchmark suite.

TPU stand-ins for the reference's comparison set (bench/bench_all.py:
11-19 — cuSPARSE, Sputnik, GE-SpMM, RoDe, TC-GNN, DTC-SpMM and the
standalone bench/scripts/*.cu kernels):

- `make_bcoo_spmm`: `jax.experimental.sparse` BCOO matmul — the vendor
  sparse library baseline (cuSPARSE role).
- `make_gather_segment_spmm`: plain-XLA edge-parallel gather +
  segment-sum over CSR — the hand-written CSR-kernel baseline
  (GE-SpMM role).
- `make_dense_spmm`: densified matmul — the MXU roofline reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_bcoo_spmm(a_csr):
    from jax.experimental import sparse as jsparse

    coo = a_csr.tocoo()
    n = a_csr.shape[0]
    mat = jsparse.BCOO(
        (
            jnp.ones(coo.nnz, jnp.float32),
            jnp.asarray(np.stack([coo.row, coo.col], 1).astype(np.int32)),
        ),
        shape=(n, n),
        indices_sorted=True,
        unique_indices=True,
    )

    def run(feat, mat=mat):
        return mat @ feat

    return run


def make_gather_segment_spmm(a_csr):
    n = a_csr.shape[0]
    rows = jnp.asarray(
        np.repeat(np.arange(n, dtype=np.int32), np.diff(a_csr.indptr))
    )
    cols = jnp.asarray(a_csr.indices.astype(np.int32))

    def run(feat, rows=rows, cols=cols, n=n):
        vals = jnp.take(feat, cols, axis=0, mode="clip")
        return jax.ops.segment_sum(
            vals, rows, num_segments=n, indices_are_sorted=True
        )

    return run


def make_dense_spmm(a_csr):
    """Returns (run, dense): pass `dense` to run as an ARGUMENT — at
    8k+ nodes the densified A is hundreds of MB and closing it over jit
    embeds it in the compile request (HTTP 413 through a remote-compile
    relay)."""
    dense = jnp.asarray(a_csr.toarray().astype(np.float32))

    def run(feat, dense):
        return dense @ feat

    return run, dense
