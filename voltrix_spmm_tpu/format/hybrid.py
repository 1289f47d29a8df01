"""Hybrid split plan: dense-coverage part + scattered-exact part.

The coverage format (gather_segment > 1) gives the fused kernel one DMA
per seg-aligned run, but blows up gather volume when edges are
scattered (a run fetched for a single neighbor). Real graphs are a
mixture: community-local edges cover runs densely, a random tail does
not. The hybrid plan splits A by *run occupancy*:

    A = A_dense + A_sparse

- (window, segment) pairs whose run would carry >= `threshold` distinct
  neighbors go to `A_dense` -> coverage plan, fused DMA kernel
  (bounded waste: seg/threshold);
- the rest go to `A_sparse` -> exact plan, pregather kernel (XLA
  row gather, no coverage waste).

`out = fused(A_dense, X) + pregather(A_sparse, X)`: SpMM is additive
over an edge partition. This is this framework's equivalent of the
reference's balanced-packing idea taken one step further — balance not
just rows per window (bmat_kernels.cuh:264-320) but DMA efficiency per
gather run.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from .plan import PlanConfig, SpmmPlan
from .preprocess import csr_preprocess


@jax.tree_util.register_pytree_node_class
@dataclass
class HybridPlan:
    dense: SpmmPlan  # coverage plan (gather_segment > 1), fused kernel
    sparse: SpmmPlan  # exact plan (gather_segment == 1), pregather kernel
    num_nodes: int
    num_edges: int

    def tree_flatten(self):
        return (self.dense, self.sparse), (self.num_nodes, self.num_edges)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _edges_to_csr(rows, cols, num_nodes):
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=num_nodes), out=indptr[1:])
    return indptr, cols


def csr_preprocess_hybrid(
    indptr,
    indices,
    num_nodes: int,
    dense_config: PlanConfig = PlanConfig(128, 128, 8),
    sparse_config: PlanConfig | None = None,
    threshold: int | None = None,
    backend: str = "auto",
) -> HybridPlan:
    """Split edges by run occupancy and build both plans.

    threshold: minimum distinct neighbors a (window, seg-run) must carry
    to be fetched as a dense run (default: seg // 2, i.e. at most 2x
    coverage waste in the dense part).
    """
    seg = dense_config.gather_segment
    assert seg >= 2, "hybrid needs a coverage dense_config (gather_segment>1)"
    if sparse_config is None:
        # inherit the clustering choice: a subtile-skipping dense side
        # (dense_impl="pregather", ops/hybrid.py) wants the scattered
        # tail clustered too, or its kernel walks every sub-window
        sparse_config = PlanConfig(
            max(dense_config.block_h, 512),
            dense_config.block_w,
            1,
            block_unroll=max(dense_config.block_unroll, 4),
            cluster_cols=dense_config.cluster_cols,
        )
    assert sparse_config.gather_segment == 1
    if threshold is None:
        threshold = max(seg // 2, 2)

    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    deg = np.diff(indptr)
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), deg)
    cols = indices
    # dedup
    key = rows * num_nodes + cols
    key = np.unique(key)
    rows, cols = key // num_nodes, key % num_nodes
    nnz = rows.shape[0]

    if nnz == 0:
        empty_ptr = np.zeros(num_nodes + 1, np.int64)
        none = np.zeros(0, np.int64)
        return HybridPlan(
            dense=csr_preprocess(empty_ptr, none, num_nodes, dense_config, backend),
            sparse=csr_preprocess(empty_ptr, none, num_nodes, sparse_config, backend),
            num_nodes=num_nodes,
            num_edges=0,
        )

    # run occupancy = DISTINCT neighbor columns per (window, segment).
    # Dedup (window, col) pairs first: a hub column referenced by many
    # window rows is still ONE fetched column, so counting edges would
    # misroute scattered hubs into the dense path and void the
    # seg/threshold coverage-waste bound (r1 advisor finding).
    nseg = -(-num_nodes // seg)
    w = rows // dense_config.block_h
    wcol = np.unique(w * num_nodes + cols)
    run_of_wcol = (wcol // num_nodes) * nseg + (wcol % num_nodes) // seg
    uniq_runs, distinct_cols = np.unique(run_of_wcol, return_counts=True)
    run_key = w * nseg + cols // seg
    dense_edge = distinct_cols[np.searchsorted(uniq_runs, run_key)] >= threshold

    dptr, dcols = _edges_to_csr(rows[dense_edge], cols[dense_edge], num_nodes)
    sptr, scols = _edges_to_csr(rows[~dense_edge], cols[~dense_edge], num_nodes)

    return HybridPlan(
        dense=csr_preprocess(dptr, dcols, num_nodes, dense_config, backend),
        sparse=csr_preprocess(sptr, scols, num_nodes, sparse_config, backend),
        num_nodes=num_nodes,
        num_edges=int(nnz),
    )


def hybrid_stats(plan: HybridPlan) -> dict:
    from .preprocess import plan_stats

    d, s = plan_stats(plan.dense), plan_stats(plan.sparse)
    return {
        "num_edges": plan.num_edges,
        "dense_frac": d["nnz"] / max(plan.num_edges, 1),
        "dense": d,
        "sparse": s,
        "total_gather_rows": d["gather_rows"] + s["gather_rows"],
    }
