"""DropEdge (Rong et al., ICLR 2020): per-edge dropout for GNN
regularization, built on the weighted value plane.

The reference format is binary-only; dropping edges there would mean
re-preprocessing the graph every step. Here a Bernoulli keep-mask over
edges scatters through `format.edge_slot_map` into the value plane
(one O(nnz) scatter per step, no plan rebuild), and the aggregation is
a weighted SpMM with values in {0, 1/keep_prob} — unbiased in
expectation. Gradients flow through `spmm_weighted_ad`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..format.plan import PlanConfig, SpmmPlan
from ..format.preprocess import csr_preprocess, csr_transpose, edge_slot_map
from ..ops.weighted import spmm_weighted_ad


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DropEdgeGraph:
    plan: SpmmPlan  # binary; value plane scattered per step
    plan_t: SpmmPlan
    slots: object  # int32 (nnz,) edge -> plan.values flat slot
    slots_t: object  # int32 (nnz,) edge -> plan_t.values flat slot
    num_edges: int
    # duplicate (row, col) CSR edges share a slot: the scatter-add path
    # sums them (coefficient = multiplicity) while the binary bitmask
    # counts them once — the eval fast path is only equivalent when no
    # duplicates exist
    has_duplicate_edges: bool = False

    def tree_flatten(self):
        return (
            (self.plan, self.plan_t, self.slots, self.slots_t),
            (self.num_edges, self.has_duplicate_edges),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_dropedge_graph(
    indptr,
    indices,
    num_nodes: int,
    config: PlanConfig = PlanConfig(64, 128),
    backend: str = "auto",
) -> DropEdgeGraph:
    assert config.gather_segment == 1 and not config.cluster_cols
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    plan = csr_preprocess(indptr, indices, num_nodes, config, backend=backend)
    ptr_t, idx_t, _ = csr_transpose(indptr, indices, num_nodes)
    plan_t = csr_preprocess(ptr_t, idx_t, num_nodes, config, backend=backend)
    slots = edge_slot_map(plan, indptr, indices)
    order = np.argsort(indices, kind="stable")
    slots_t = np.empty_like(slots)
    slots_t[order] = edge_slot_map(plan_t, ptr_t, idx_t)
    return DropEdgeGraph(
        plan=plan.device(),
        plan_t=plan_t.device(),
        slots=jnp.asarray(slots, jnp.int32),
        slots_t=jnp.asarray(slots_t, jnp.int32),
        num_edges=int(indices.shape[0]),
        has_duplicate_edges=bool(np.unique(slots).size != slots.size),
    )


def dropedge_aggregate(
    g: DropEdgeGraph,
    x: jax.Array,
    key,
    keep_prob: float = 0.8,
    deterministic: bool = False,
) -> jax.Array:
    """sum-aggregate over a per-call random edge subset; scaled by
    1/keep_prob so the expectation matches the full graph. Pass
    deterministic=True (or keep_prob=1.0) at eval time."""
    if deterministic or keep_prob >= 1.0:
        if not g.has_duplicate_edges:
            # all-ones weights == binary aggregation: skip the
            # value-plane scatter + weighted kernel entirely at eval
            from ..ops.autodiff import spmm_ad

            return spmm_ad(g.plan, g.plan_t, x)
        # duplicate edges must keep their multiplicity (the training
        # path's scatter-add sums them; the binary bitmask would not)
        w = jnp.ones((g.num_edges,), x.dtype)
    else:
        keep = jax.random.bernoulli(key, keep_prob, (g.num_edges,))
        w = keep.astype(x.dtype) / keep_prob

    def plane(plan, slots):
        cfg = plan.config
        size = plan.total_blocks * cfg.block_h * cfg.block_w
        return (
            jnp.zeros(size, x.dtype)
            .at[slots]
            .add(w)
            .reshape(plan.total_blocks, cfg.block_h, cfg.block_w)
        )

    return spmm_weighted_ad(
        dataclasses.replace(g.plan, values=plane(g.plan, g.slots)),
        dataclasses.replace(g.plan_t, values=plane(g.plan_t, g.slots_t)),
        x,
    )
