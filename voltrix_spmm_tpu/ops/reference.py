"""Reference-math SpMM oracles.

`spmm_reference` executes the *plan semantics* (gather + masked matmul +
window scatter) in plain JAX — the correctness oracle for the Pallas
kernels, playing the role cuSPARSE plays for the reference
(tests/test_spmm.py:75-85 computes `torch.sparse_csr_tensor @ feat`).
`spmm_scipy` is the host-side oracle straight from CSR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..format.plan import SpmmPlan
from .bitmask import expand_bitmask_batched


def spmm_reference(plan: SpmmPlan, feat: jax.Array) -> jax.Array:
    """out = A @ feat via the plan, in plain (non-Pallas) JAX.

    O(total_blocks * block_h * block_w) memory for the expanded masks —
    use on small/medium problems only.
    """
    n, d = feat.shape
    assert n == plan.source_rows, (n, plan.source_rows)
    out_dtype = feat.dtype
    if plan.total_blocks == 0:
        return jnp.zeros((plan.num_nodes, d), out_dtype)
    cfg = plan.config
    hind_flat = jnp.asarray(plan.hind).reshape(-1)
    if getattr(plan, "src_perm", None) is not None:
        # incidence-packed plans: hind indexes the packed source — this
        # oracle composes the permutation instead (perf-irrelevant here)
        perm = jnp.asarray(plan.src_perm)
        hind_flat = jnp.take(
            perm, jnp.clip(hind_flat, 0, perm.shape[0] - 1)
        )
    xg = jnp.take(feat, hind_flat, axis=0, mode="clip").reshape(
        plan.total_blocks, cfg.block_w, d
    )
    masks = expand_bitmask_batched(
        jnp.asarray(plan.bitmask), cfg.block_h, feat.dtype
    )  # (B, H, K)
    contrib = jnp.einsum(
        "bhk,bkd->bhd", masks, xg, preferred_element_type=jnp.float32
    )
    out = jax.ops.segment_sum(
        contrib,
        jnp.asarray(plan.window_of_block),
        num_segments=plan.num_windows,
    )
    return out.reshape(plan.padded_nodes, d)[: plan.num_nodes].astype(out_dtype)


def spmm_scipy(indptr, indices, num_nodes: int, feat: np.ndarray) -> np.ndarray:
    """Host oracle: binary CSR @ feat via scipy (values are all-ones, as in
    the reference where A stores only presence, bmat_kernels.cuh:102-103)."""
    import scipy.sparse as sp

    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    a = sp.csr_matrix(
        (np.ones(indices.shape[0], dtype=np.float64), indices, indptr),
        shape=(num_nodes, num_nodes),
    )
    # duplicate entries in malformed CSR would sum; canonicalize to binary
    a.sum_duplicates()
    a.data[:] = 1.0
    return np.asarray(a @ np.asarray(feat, dtype=np.float64))
