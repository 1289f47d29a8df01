"""Graph Attention Network (GAT) on the weighted SpMM value plane.

Model-family extension beyond the reference (its kernels serve binary
GCN/SAGE aggregation only, bmat_kernels.cuh:16-20). GAT needs per-edge
*data-dependent* weights — exactly what the weighted plane + the
differentiable edge-slot scatter provide:

1. attention logits are edge-parallel O(nnz) work (no feature dim):
   e_uv = LeakyReLU(a_src . h_u + a_dst . h_v), softmax over each row's
   neighbors via segment max/sum — cheap VPU traffic;
2. the (nnz,) attention vector scatters into the (total_blocks, H, K)
   value planes of A and A^T through `format.edge_slot_map` (a static
   permutation, so gradients flow through natively);
3. the heavy O(nnz * d) aggregation runs `spmm_weighted_ad` — the MXU
   value-plane kernel with full backward (d/dfeat through the transpose
   plane, d/dvalues back through the scatter to the attention logits).

Memory note: the dense value plane costs expanded-slot bytes
(total_blocks * H * K * 4) per concurrent layer/head, so GAT graphs
want short windows (H = 32..128) where expansion stays low; this is the
inherent price of MXU-dense tiles for data-dependent weights.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..format.plan import PlanConfig, SpmmPlan
from ..format.preprocess import csr_preprocess, csr_transpose, edge_slot_map
from ..ops.weighted import spmm_weighted_ad


@jax.tree_util.register_pytree_node_class
@dataclass
class GatGraph:
    """Plans for A and A^T plus the static edge->slot scatter maps."""

    plan: SpmmPlan  # binary; the value plane is scattered in per forward
    plan_t: SpmmPlan
    slots: object  # int32 (nnz,) flat index into plan.values
    slots_t: object  # int32 (nnz,) flat index into plan_t.values
    rows: object  # int32 (nnz,) edge destination (the aggregating node)
    cols: object  # int32 (nnz,) edge source (the neighbor)
    num_nodes: int

    def tree_flatten(self):
        return (
            (self.plan, self.plan_t, self.slots, self.slots_t, self.rows,
             self.cols),
            (self.num_nodes,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_gat_graph(
    indptr,
    indices,
    num_nodes: int,
    config: PlanConfig = PlanConfig(64, 128),
    backend: str = "auto",
) -> GatGraph:
    assert config.gather_segment == 1 and not config.cluster_cols, (
        "GAT needs exact-lane plans (the value plane rides the bitmask)"
    )
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    # binary plans: the value planes are rebuilt from the attention
    # vector at every forward (scatter_plane uses only static geometry),
    # so materializing zero planes here would waste 2 x expanded-slot
    # bytes of HBM for arrays that are never read
    plan = csr_preprocess(indptr, indices, num_nodes, config, backend=backend)
    ptr_t, idx_t, _ = csr_transpose(indptr, indices, num_nodes)
    plan_t = csr_preprocess(ptr_t, idx_t, num_nodes, config, backend=backend)
    for p in (plan, plan_t):
        size = p.total_blocks * config.block_h * config.block_w
        if size > np.iinfo(np.int32).max:
            raise ValueError(
                f"GAT value plane has {size} slots — beyond int32 scatter "
                "indices (JAX default). Use a shorter window height or "
                "partition the graph (parallel.row_sharded)."
            )
    slots = edge_slot_map(plan, indptr, indices)
    # the transpose edge (v, u) carries the SAME attention value as
    # (u, v): enumerate transpose edges in their own CSR order and map
    # back to the original edge order
    order = np.argsort(indices, kind="stable")  # original edge of each
    # transpose-CSR position
    slots_t = np.empty_like(slots)
    slots_t[order] = edge_slot_map(plan_t, ptr_t, idx_t)
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    return GatGraph(
        plan=plan.device(),
        plan_t=plan_t.device(),
        slots=jnp.asarray(slots, jnp.int32),
        slots_t=jnp.asarray(slots_t, jnp.int32),
        rows=jnp.asarray(rows, jnp.int32),
        cols=jnp.asarray(indices, jnp.int32),
        num_nodes=num_nodes,
    )


def init_gat(
    key,
    in_dim: int,
    hidden: int,
    num_classes: int,
    num_heads: int = 4,
    dtype=jnp.float32,
):
    """2-layer GAT (Velickovic et al. 2018): layer 1 = num_heads heads
    concatenated, layer 2 = one head producing class logits."""
    ks = jax.random.split(key, 2 * num_heads + 2)
    scale1 = (2.0 / in_dim) ** 0.5
    params = {
        "w1": (
            jax.random.normal(ks[0], (num_heads, in_dim, hidden)) * scale1
        ).astype(dtype),
        "a1_src": (
            jax.random.normal(ks[1], (num_heads, hidden)) * (1.0 / hidden**0.5)
        ).astype(dtype),
        "a1_dst": (
            jax.random.normal(ks[2], (num_heads, hidden)) * (1.0 / hidden**0.5)
        ).astype(dtype),
        "w2": (
            jax.random.normal(ks[3], (num_heads * hidden, num_classes))
            * (2.0 / (num_heads * hidden)) ** 0.5
        ).astype(dtype),
        "a2_src": (
            jax.random.normal(ks[4], (num_classes,)) * (1.0 / num_classes**0.5)
        ).astype(dtype),
        "a2_dst": (
            jax.random.normal(ks[5], (num_classes,)) * (1.0 / num_classes**0.5)
        ).astype(dtype),
    }
    return params


def edge_softmax(g: GatGraph, e: jax.Array) -> jax.Array:
    """Row-wise softmax over each node's incoming edges, (nnz,) -> (nnz,)."""
    m = jax.ops.segment_max(e, g.rows, num_segments=g.num_nodes)
    alpha = jnp.exp(e - m[g.rows])
    denom = jax.ops.segment_sum(alpha, g.rows, num_segments=g.num_nodes)
    return alpha / jnp.maximum(denom[g.rows], 1e-9)


def gat_attention_aggregate(
    g: GatGraph, h: jax.Array, a_src: jax.Array, a_dst: jax.Array
) -> jax.Array:
    """One attention head: out_u = sum_v alpha_uv h_v over u's neighbors."""
    s = h @ a_src  # (N,) destination-side logits
    t = h @ a_dst  # (N,) source-side logits
    e = jax.nn.leaky_relu(s[g.rows] + t[g.cols], negative_slope=0.2)
    alpha = edge_softmax(g, e)

    def scatter_plane(plan, slots):
        # plane shape comes from static plan metadata (values itself may
        # be a tracer when the graph travels through jit)
        cfg = plan.config
        shape = (plan.total_blocks, cfg.block_h, cfg.block_w)
        return (
            jnp.zeros(shape[0] * shape[1] * shape[2], h.dtype)
            .at[slots]
            .add(alpha)
            .reshape(shape)
        )

    plane = scatter_plane(g.plan, g.slots)
    plane_t = scatter_plane(g.plan_t, g.slots_t)
    return spmm_weighted_ad(
        dataclasses.replace(g.plan, values=plane),
        dataclasses.replace(g.plan_t, values=plane_t),
        h,
    )


def gat_forward(params, g: GatGraph, x: jax.Array) -> jax.Array:
    """logits = head2(elu(concat_h head1_h(x)))."""
    heads = [
        gat_attention_aggregate(
            g,
            x @ params["w1"][k],
            params["a1_src"][k],
            params["a1_dst"][k],
        )
        for k in range(params["w1"].shape[0])
    ]
    h = jax.nn.elu(jnp.concatenate(heads, axis=1))
    return gat_attention_aggregate(
        g, h @ params["w2"], params["a2_src"], params["a2_dst"]
    )


def gat_loss(params, g: GatGraph, x, labels):
    import optax

    logits = gat_forward(params, g, x)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()
