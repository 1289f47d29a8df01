"""Differentiable SpMM.

The reference is inference-only (forward SpMM, GCN/GraphSAGE
aggregation, bmat_kernels.cuh:16-20). To support training the model
layer on TPU we add a custom VJP: since A is binary,
``d/dX (A @ X) = A^T @ g`` — another SpMM with the transpose plan. For
symmetric adjacency (undirected graphs, the common GNN case) the same
plan serves both directions.
"""

from __future__ import annotations

import jax
import numpy as np

from ..format.plan import SpmmPlan
from .pallas_spmm import spmm_pallas


def _dispatch(plan, feat):
    """Coverage plans (gather_segment >= 8) run the fused bulk-DMA
    kernel, column-clustered plans the subtile kernel, and HybridPlans
    the dense/sparse split — the measured winners on their regimes — so
    GCN training gets the right kernel in both directions from the plan
    alone. `plan` and `plan_t` are independent: either side may be any
    plan type as long as it encodes the right matrix.

    A LIST/TUPLE of sub-plans (window chunks from
    `format.stream.slice_plan_windows`) dispatches each chunk and
    concatenates along rows: the streamed-training path for graphs
    whose single materialized gather exceeds HBM (products-class).
    The VJP stays correct because the transpose side is streamed the
    same way — row chunks of A^T partition the d/dfeat rows."""
    from ..format.hybrid import HybridPlan

    if isinstance(plan, (list, tuple)):
        import jax.numpy as jnp

        outs = [_dispatch(s, feat) for s in plan]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if isinstance(plan, HybridPlan):
        from .hybrid import spmm_pallas_hybrid

        return spmm_pallas_hybrid(plan, feat)
    if plan.config.gather_segment >= 8:
        from .pallas_spmm_fused import spmm_pallas_fused

        return spmm_pallas_fused(plan, feat)
    return spmm_pallas(plan, feat, subtile=plan.config.cluster_cols)


def _zero_cotangent(leaf):
    aval = jax.typeof(leaf)
    if np.issubdtype(aval.dtype, np.inexact):
        import jax.numpy as jnp

        return jnp.zeros(aval.shape, aval.dtype)
    return np.zeros(aval.shape, jax.dtypes.float0)


@jax.custom_vjp
def spmm_ad(plan: SpmmPlan, plan_t: SpmmPlan, feat):
    """SpMM with gradient support. `plan_t` must encode A^T (pass the
    same plan for symmetric adjacency)."""
    return _dispatch(plan, feat)


def _spmm_fwd(plan, plan_t, feat):
    return _dispatch(plan, feat), (plan, plan_t)


def _spmm_bwd(res, g):
    plan, plan_t = res
    dfeat = _dispatch(plan_t, g)
    plan_zeros = jax.tree.map(_zero_cotangent, plan)
    plan_t_zeros = jax.tree.map(_zero_cotangent, plan_t)
    return (plan_zeros, plan_t_zeros, dfeat)


spmm_ad.defvjp(_spmm_fwd, _spmm_bwd)
