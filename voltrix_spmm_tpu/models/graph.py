"""Graph container + neighbor aggregation on top of the SpMM kernels.

The reference's kernels implement exactly this: GNN neighbor
aggregation for GCN/GraphSAGE forward (bmat_kernels.cuh:16-20). Here it
is packaged as a differentiable `aggregate` (sum or mean over neighbors)
usable inside training loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..format.plan import PlanConfig, SpmmPlan
from ..format.preprocess import csr_preprocess
from ..ops.autodiff import spmm_ad


@jax.tree_util.register_pytree_node_class
@dataclass
class GraphData:
    plan: SpmmPlan  # A
    plan_t: SpmmPlan  # A^T (same object for symmetric graphs)
    inv_deg: object  # float32 (N, 1): 1/max(in-degree, 1)
    inv_sqrt_deg: object = None  # float32 (N, 1): deg^-1/2 (sym norm)
    # storage dtype the aggregation streams (None = keep x's dtype).
    # build_graph("auto") sets bfloat16 on large scattered graphs — the
    # tuner's measured winner halves the gather volume (accumulation
    # stays f32; bf16-storage accuracy class, rel err <= 1e-2)
    agg_dtype: object = None

    def tree_flatten(self):
        return (
            (self.plan, self.plan_t, self.inv_deg, self.inv_sqrt_deg),
            (self.agg_dtype,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_nodes(self):
        # streamed graphs hold window-chunk lists (see build_graph
        # stream_chunks); chunks partition the output rows
        if isinstance(self.plan, (list, tuple)):
            return sum(p.num_nodes for p in self.plan)
        return self.plan.num_nodes


# dense h2048 bitmask bytes past this budget crowd out features/output
# on one v5e (measured: ogbn-products-class 2.45M-node graphs build a
# 6.25 GB h2048 bitmask -> device OOM, while h512 clustered-subtile at
# 1.9 GB runs AND wins the tuned race at 409.9 ms vs h128's 549.0)
AUTO_BITMASK_BUDGET_BYTES = 2 * 2**30


def auto_plan_config(
    indptr,
    indices,
    num_nodes: int,
    bitmask_budget_bytes: int = AUTO_BITMASK_BUDGET_BYTES,
) -> PlanConfig:
    """Heuristic kernel-regime pick from the graph alone (no timing).

    Coverage gate shared with the tuner/bench (`fused_auto_config`);
    scattered graphs get tall clustered-subtile windows — h2048, the
    tuner's measured power-law winner geometry (h1024 measured 13x
    slower than the tuned variant on reordered rmat-17 d256) — unless
    the estimated h2048 dense bitmask exceeds `bitmask_budget_bytes`,
    in which case the geometry steps down to h512 clustered-subtile
    (the measured products-scale winner)."""
    from ..format.preprocess import coverage_expansion, fused_auto_config

    cfg = fused_auto_config(indptr, indices, num_nodes)
    if cfg is not None:
        return cfg
    if num_nodes >= 4096:
        nnz = int(np.asarray(indices).shape[0])
        rows2048 = coverage_expansion(indptr, indices, num_nodes, 2048, 1) * nnz
        if rows2048 * 2048 // 8 > bitmask_budget_bytes:
            return PlanConfig(512, 128, block_unroll=4, cluster_cols=True)
        return PlanConfig(2048, 128, block_unroll=4, cluster_cols=True)
    return PlanConfig()


def build_graph(
    indptr,
    indices,
    num_nodes: int,
    config: PlanConfig | str = PlanConfig(),
    symmetric: bool | None = None,
    backend: str = "auto",
    stream_chunks: int | None = None,
) -> GraphData:
    """Preprocess adjacency into a GraphData (plans for A and A^T plus
    mean-aggregation degree normalization).

    config="auto" picks the kernel regime from the graph itself: when an
    h2048/seg128 coverage plan wastes <= 0.5 gather rows per nnz the
    fused bulk-DMA kernel wins (measured 1.3-4.5x on uniform/dense
    graphs; `spmm_ad` dispatches coverage plans to it in both training
    directions). Scattered graphs get tall clustered-subtile windows
    (the measured power-law winner class: dedup scales with window
    height and the subtile kernel skips the empty 128-row sub-products)
    instead of the short-window default. Mirrors the tuner's
    `coverage_expansion` gate without timing anything."""
    import scipy.sparse as sp

    auto = config == "auto"
    if isinstance(config, str) and not auto:
        raise ValueError(
            f"unknown config {config!r}: pass a PlanConfig or 'auto'"
        )

    def pick_config(ptr, idx):
        return auto_plan_config(ptr, idx, num_nodes)

    if auto:
        config = pick_config(indptr, indices)
    plan = csr_preprocess(indptr, indices, num_nodes, config, backend=backend)
    if stream_chunks is None and auto:
        # products-class graphs: one materialized gather exceeds HBM
        # next to activations; window-chunked streaming bounds peak
        # memory to one chunk (nominal 512 B/row = bf16 d256 — callers
        # that know their d should pass stream_chunks explicitly)
        if plan.gather_rows * 512 > 4 * 2**30:
            stream_chunks = int(-(-plan.gather_rows * 512 // 2**30))
    if stream_chunks and stream_chunks > 1:
        from ..format.stream import slice_plan_windows

        plan = slice_plan_windows(plan, stream_chunks)
    a = sp.csr_matrix(
        (
            np.ones(np.asarray(indices).shape[0], dtype=np.float32),
            np.asarray(indices),
            np.asarray(indptr),
        ),
        shape=(num_nodes, num_nodes),
    )
    at = a.T.tocsr()
    if symmetric is None:
        symmetric = (a != at).nnz == 0
    if symmetric:
        plan_t = plan
    else:
        # asymmetric graphs gate A^T on ITS OWN coverage: a matrix with
        # local rows but scattered columns must not get a seg-128
        # coverage plan for its transpose (GB-scale on big graphs);
        # spmm_ad dispatches per-plan, so mixed configs are fine
        config_t = (
            pick_config(at.indptr, at.indices) if auto else config
        )
        plan_t = csr_preprocess(
            at.indptr, at.indices, num_nodes, config_t, backend=backend
        )
        if stream_chunks and stream_chunks > 1:
            from ..format.stream import slice_plan_windows

            plan_t = slice_plan_windows(plan_t, stream_chunks)
    deg = np.asarray(a.sum(axis=1)).reshape(num_nodes, 1)
    inv_deg = (1.0 / np.maximum(deg, 1.0)).astype(np.float32)
    inv_sqrt_deg = (1.0 / np.sqrt(np.maximum(deg, 1.0))).astype(np.float32)
    # Commit plan arrays to the device ONCE. csr_preprocess returns
    # host (numpy) arrays by design (serializable build artifact), but
    # GraphData's documented usage is as a TRACED jit argument — with
    # numpy leaves every dispatch re-uploads the whole plan (measured:
    # ~4 s of fixed per-dispatch transfer at rmat-17 scale through the
    # relay, 200x the 17 ms train step it was feeding, and the likely
    # trigger of the historical rmat-17 bench worker crashes).
    if plan_t is plan:
        plan = plan_t = jax.device_put(plan)
    else:
        plan = jax.device_put(plan)
        plan_t = jax.device_put(plan_t)
    # large scattered graphs stream gathers in bf16 (the tuner's
    # measured winner: 2.2-3.9x faster gather on v5e, f32 accumulation)
    agg_dtype = (
        jnp.bfloat16
        if auto and config.gather_segment == 1 and num_nodes >= 65536
        else None
    )
    return GraphData(
        plan=plan,
        plan_t=plan_t,
        inv_deg=jnp.asarray(inv_deg),
        inv_sqrt_deg=jnp.asarray(inv_sqrt_deg),
        agg_dtype=agg_dtype,
    )


def aggregate(g: GraphData, x: jax.Array, mode: str = "mean") -> jax.Array:
    """Neighbor aggregation: sum_j A[i,j] x[j] (optionally degree-normalized).

    Accepts (N, D) or a graph-batched (B, N, D); the batch is folded into
    the feature axis (SpMM is linear over columns) so one kernel launch
    serves the whole batch — MXU-friendlier than vmap.

    mode: "sum" (A @ x), "mean" (D^-1 A x), "sym" (D^-1/2 A D^-1/2 x,
    the GCN-paper normalization).
    """
    if x.ndim == 3:
        b, n, d = x.shape
        flat = jnp.transpose(x, (1, 0, 2)).reshape(n, b * d)
        out = aggregate(g, flat, mode)
        return jnp.transpose(out.reshape(n, b, d), (1, 0, 2))
    out_dtype = x.dtype
    if g.agg_dtype is not None:
        x = x.astype(g.agg_dtype)  # thinner gather stream, f32 accum
    if mode == "sym":
        # GCN-paper normalization D^-1/2 A D^-1/2 — binary SpMM composed
        # with diagonal scalings (row/col-scaled weighted SpMM without a
        # per-edge value plane)
        assert g.inv_sqrt_deg is not None, "graph built without sym norm"
        pre = (g.inv_sqrt_deg * x).astype(x.dtype)
        return (
            g.inv_sqrt_deg * spmm_ad(g.plan, g.plan_t, pre)
        ).astype(out_dtype)
    out = spmm_ad(g.plan, g.plan_t, x).astype(out_dtype)
    if mode == "mean":
        out = g.inv_deg * out
    elif mode != "sum":
        raise ValueError(f"unknown aggregation mode {mode!r}")
    return out
