"""Hybrid SpMM: fused kernel on the dense-run part + pregather on the
scattered tail (see format/hybrid.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..format.hybrid import HybridPlan
from .pallas_spmm import spmm_pallas
from .pallas_spmm_fused import spmm_pallas_fused


def spmm_pallas_hybrid(
    plan: HybridPlan,
    feat: jax.Array,
    *,
    block_d: int | None = None,
    compute_dtype=jnp.float32,
    precision=None,
    interpret: bool | None = None,
    out_dtype=None,
) -> jax.Array:
    kwargs = dict(
        block_d=block_d,
        compute_dtype=compute_dtype,
        precision=precision,
        interpret=interpret,
        out_dtype=out_dtype,
    )
    out = None
    if plan.dense.total_blocks > 0:
        out = spmm_pallas_fused(plan.dense, feat, **kwargs)
    if plan.sparse.total_blocks > 0:
        sp = spmm_pallas(plan.sparse, feat, **kwargs)
        out = sp if out is None else out + sp
    if out is None:
        return jnp.zeros_like(
            feat, dtype=out_dtype if out_dtype is not None else feat.dtype
        )
    return out
