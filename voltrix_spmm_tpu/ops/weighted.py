"""Weighted SpMM: per-edge values beyond the binary bitmask.

Extension over the reference (its format is binary-only — hspa carries
presence bits, spmm_kernels.cuh:1632-1644 expands them to 0/1
fragments); GNN workloads with edge weights (normalized adjacency, GAT
attention, weighted knn graphs) need A's values. On TPU the natural
encoding is a dense (block_h, block_w) value tile per block, aligned
with the bitmask: the masked matmul becomes a plain `values @ xg` MXU
pass — no bitmask expansion at all, zeros where there is no edge.

Trade-off: the value plane costs total_blocks * block_h * block_w * 4
bytes, so weighted plans want moderate window heights (the preprocessor
asserts gather_segment == 1; use block_h <= 512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.plan import SpmmPlan
from .pallas_spmm import _cdiv, _interpret_default, _round_up


def _spmm_weighted_kernel(
    wob_ref,  # scalar-prefetch: int32 (num_groups,)
    values_ref,  # (unroll, block_h, K) float32
    xg_ref,  # (unroll * K, block_d)
    out_ref,  # (block_h, block_d) float32
    *,
    precision,
    unroll: int,
):
    b = pl.program_id(1)
    w = wob_ref[b]
    prev_w = wob_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, prev_w != w)

    vals = jnp.concatenate(
        [values_ref[u] for u in range(unroll)], axis=1
    )  # (block_h, unroll*K)
    xg = xg_ref[...].astype(jnp.float32)
    contrib = jnp.dot(
        vals, xg, preferred_element_type=jnp.float32, precision=precision
    )

    @pl.when(is_first)
    def _():
        out_ref[...] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[...] += contrib


def spmm_pallas_weighted(
    plan: SpmmPlan,
    feat: jax.Array,
    *,
    block_d: int | None = None,
    precision=None,
    interpret: bool | None = None,
    **_ignored,
) -> jax.Array:
    """out[N, D] = A[N, N] @ feat[N, D] with A's per-edge values taken
    from `plan.values` (csr_preprocess(..., values=...))."""
    assert plan.values is not None, "plan has no value plane; use spmm_pallas"
    n, d = feat.shape
    assert n == plan.source_rows, (n, plan.source_rows)
    out_rows = plan.num_nodes
    out_dtype = feat.dtype
    if plan.total_blocks == 0:
        return jnp.zeros((out_rows, d), out_dtype)

    cfg = plan.config
    block_h, block_w = cfg.block_h, cfg.block_w
    assert block_h % 8 == 0 and block_w % 128 == 0
    if interpret is None:
        interpret = _interpret_default()

    d_pad = _round_up(d, 128)
    if block_d is None:
        block_d = min(d_pad, 512)
    d_pad = _round_up(d_pad, block_d)
    if d_pad != d:
        feat = jnp.pad(feat, ((0, 0), (0, d_pad - d)))
    num_chunks = d_pad // block_d

    hind_flat = jnp.asarray(plan.hind).reshape(-1)
    xg = jnp.take(feat, hind_flat, axis=0, mode="clip")

    unroll = cfg.block_unroll
    assert plan.total_blocks % unroll == 0
    num_groups = plan.total_blocks // unroll

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks, num_groups),
        in_specs=[
            pl.BlockSpec(
                (unroll, block_h, block_w), lambda c, b, wob: (b, 0, 0)
            ),
            pl.BlockSpec(
                (unroll * block_w, block_d), lambda c, b, wob: (b, c)
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_h, block_d), lambda c, b, wob: (wob[b], c)
        ),
    )
    kernel = functools.partial(
        _spmm_weighted_kernel, precision=precision, unroll=unroll
    )
    flops = 2 * plan.total_blocks * block_h * block_w * d_pad
    bytes_accessed = (
        xg.size * xg.dtype.itemsize
        + plan.total_blocks * block_h * block_w * 4
        + plan.padded_nodes * d_pad * 4
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.padded_nodes, d_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan.window_of_block)[::unroll],
        jnp.asarray(plan.values),
        xg,
    )

    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, cfg.block_h, total_repeat_length=plan.padded_nodes
        )
        out = jnp.where(nonempty[:, None], out, 0.0)

    return out[:out_rows, :d].astype(out_dtype)


def _dvalues_kernel(
    wob_ref,  # scalar-prefetch: int32 (num_groups,)
    g_ref,  # (block_h, block_d) float32 upstream gradient tile
    xg_ref,  # (unroll * K, block_d) float32 gathered features
    bm_ref,  # (unroll, words, K) uint32 presence bitmask
    out_ref,  # (unroll, block_h, K) float32 dV tiles
    *,
    block_h: int,
    block_w: int,
    precision,
    unroll: int,
):
    """dV[b] = mask[b] * (g_window @ xg[b]^T), accumulated over feature
    chunks (grid dim 1, `arbitrary`, revisits the same output tile)."""
    from .bitmask import expand_bitmask

    c = pl.program_id(1)
    g = g_ref[...]
    for u in range(unroll):
        contrib = jax.lax.dot_general(
            g,
            xg_ref[u * block_w : (u + 1) * block_w, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (block_h, K)
        # gradient exists only where an edge exists: slots the forward
        # masked out must stay zero so the edge-slot scatter roundtrip
        # (format.edge_slot_map) is exact
        contrib *= expand_bitmask(bm_ref[u], block_h, jnp.float32)

        @pl.when(c == 0)
        def _(u=u, contrib=contrib):
            out_ref[u] = contrib

        @pl.when(c != 0)
        def _(u=u, contrib=contrib):
            out_ref[u] += contrib


def spmm_weighted_dvalues(
    plan: SpmmPlan,
    feat: jax.Array,
    g: jax.Array,
    *,
    block_d: int | None = None,
    precision=None,
    interpret: bool | None = None,
) -> jax.Array:
    """d/d(plan.values) of `sum(spmm_pallas_weighted(plan, feat) * g)`:
    a (total_blocks, block_h, block_w) plane, zero off-edge.

    Per block b in window w: dV[b, r, l] = g[w*H + r, :] . feat[hind[b,
    l], :] where the bitmask has an edge — the outer-product structure
    makes this another MXU pass (g_tile @ xg_tile^T), streamed over the
    same gathered tiles as the forward."""
    n, d = feat.shape
    assert n == plan.source_rows, (n, plan.source_rows)
    cfg = plan.config
    block_h, block_w, words = cfg.block_h, cfg.block_w, cfg.words_per_col
    if plan.total_blocks == 0:
        return jnp.zeros((0, block_h, block_w), jnp.float32)
    assert block_h % 32 == 0 and block_w % 128 == 0
    if interpret is None:
        interpret = _interpret_default()

    d_pad = _round_up(d, 128)
    if block_d is None:
        block_d = min(d_pad, 512)
    d_pad = _round_up(d_pad, block_d)
    feat = feat.astype(jnp.float32)
    if d_pad != d:
        feat = jnp.pad(feat, ((0, 0), (0, d_pad - d)))
    num_chunks = d_pad // block_d

    g = g.astype(jnp.float32)
    if g.shape != (plan.padded_nodes, d_pad):
        g = jnp.pad(
            g, ((0, plan.padded_nodes - g.shape[0]), (0, d_pad - g.shape[1]))
        )

    hind_flat = jnp.asarray(plan.hind).reshape(-1)
    xg = jnp.take(feat, hind_flat, axis=0, mode="clip")

    unroll = cfg.block_unroll
    assert plan.total_blocks % unroll == 0
    num_groups = plan.total_blocks // unroll

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_groups, num_chunks),
        in_specs=[
            pl.BlockSpec((block_h, block_d), lambda b, c, wob: (wob[b], c)),
            pl.BlockSpec((unroll * block_w, block_d), lambda b, c, wob: (b, c)),
            pl.BlockSpec((unroll, words, block_w), lambda b, c, wob: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (unroll, block_h, block_w), lambda b, c, wob: (b, 0, 0)
        ),
    )
    kernel = functools.partial(
        _dvalues_kernel,
        block_h=block_h,
        block_w=block_w,
        precision=precision,
        unroll=unroll,
    )
    flops = 2 * plan.total_blocks * block_h * block_w * d_pad
    bytes_accessed = (
        xg.size * 4
        + plan.padded_nodes * d_pad * 4
        + plan.total_blocks * block_h * block_w * 4
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (plan.total_blocks, block_h, block_w), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan.window_of_block)[::unroll],
        g,
        xg,
        jnp.asarray(plan.bitmask),
    )


def sddmm(
    plan: SpmmPlan,
    x: jax.Array,
    y: jax.Array,
    *,
    per_edge=None,
    **kwargs,
) -> jax.Array:
    """Sampled dense-dense matmul: (x @ y^T) masked to A's sparsity.

    The standard companion op to SpMM (cuSPARSE `cusparseSDDMM`; absent
    from the reference, which is SpMM-only): for every edge (u, v) of
    the plan, out_uv = x[u] . y[v]. Returns the (total_blocks, block_h,
    block_w) value plane (zero off-edge) — feed it straight back into a
    weighted SpMM — or, with `per_edge=slots` from
    `format.edge_slot_map`, the (nnz,) per-edge vector (GAT attention
    logits, link-prediction scores). Runs the same streamed MXU kernel
    as the weighted backward: per block, g_window @ gathered^T masked
    by the bitmask."""
    plane = spmm_weighted_dvalues(plan, y, x, **kwargs)
    if per_edge is not None:
        return plane.reshape(-1)[per_edge]
    return plane


@jax.custom_vjp
def spmm_weighted_ad(plan: SpmmPlan, plan_t: SpmmPlan, feat):
    """Weighted SpMM with gradients for BOTH feat and the value plane.

    `plan_t` must encode A^T with transposed values (build its CSR with
    `format.csr_transpose(..., values=...)`). Backward:
      d/dfeat   = (A o V)^T @ g   — a weighted SpMM with plan_t;
      d/dvalues = mask * (g @ feat^T) per block (spmm_weighted_dvalues),
    delivered as the cotangent of `plan.values` — differentiate through
    `dataclasses.replace(plan, values=...)` or feed per-edge parameters
    via `format.edge_slot_map`."""
    return spmm_pallas_weighted(plan, feat)


def _weighted_fwd(plan, plan_t, feat):
    return spmm_pallas_weighted(plan, feat), (plan, plan_t, feat)


def _weighted_bwd(res, g):
    import dataclasses

    from .autodiff import _zero_cotangent

    plan, plan_t, feat = res
    dfeat = spmm_pallas_weighted(plan_t, g.astype(feat.dtype)).astype(
        feat.dtype
    )
    dvalues = spmm_weighted_dvalues(plan, feat, g)
    dplan = dataclasses.replace(
        jax.tree.map(_zero_cotangent, plan), values=dvalues
    )
    return (dplan, jax.tree.map(_zero_cotangent, plan_t), dfeat)


spmm_weighted_ad.defvjp(_weighted_fwd, _weighted_bwd)
