"""Pallas kernels for the edge-per-lane (ELL) plan.

Three ops on `format.EllPlan` (see format/ell.py for the layout):

- `spmm_ell`          out = (A o V) @ X, value tile rebuilt in-register
- `spmm_ell_dvals`    per-lane d/dvals (and the SDDMM forward — same math)
- `spmm_ell_ad` / `sddmm_ell_ad`   custom-VJP training entry points

The forward's value-tile construction is the TPU translation of the
reference's bitmask->fragment expansion (spmm_kernels.cuh:1632-1644
lane-test -> 0x3f800000): one broadcast integer compare against a row
iota selects each lane's destination row, multiplied by the lane value —
pure VPU, no gather/scatter — then a single MXU pass per block group.

The lane-gradient kernel reuses the weighted-backward identity
dV = mask o (G @ Xg^T) (ops/weighted.py) but reduces each lane's column
on-chip: dval[l] = sum_r S0[r,l] * (G @ Xg^T)[r,l], a sublane reduction
landing in natural (1, K) lane layout. With G <- X it IS the SDDMM
forward (cuSPARSE `cusparseSDDMM` role): score[l] = x[dest_l] . y[src_l].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.ell import EllPlan
from .pallas_spmm import _interpret_default, _pick_block_d, _round_up


def _ell_fwd_kernel(
    wob_ref,  # scalar-prefetch: int32 (num_groups,)
    erow_ref,  # (1, unroll, K) int32 window-local dest row per lane
    vals_ref,  # (1, unroll, K) f32 lane values (0 on padding)
    xg_ref,  # (unroll * K, block_d) gathered X rows
    out_ref,  # (block_h, block_d) f32
    *,
    block_h: int,
    block_w: int,
    compute_dtype,
    precision,
    unroll: int,
):
    b = pl.program_id(1)
    w = wob_ref[b]
    prev_w = wob_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, prev_w != w)

    iota = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w), 0)
    tiles = []
    for u in range(unroll):
        sel = (iota == erow_ref[0, u : u + 1, :]).astype(compute_dtype)
        tiles.append(sel * vals_ref[0, u : u + 1, :].astype(compute_dtype))
    s = jnp.concatenate(tiles, axis=1)  # (H, unroll*K)
    xg = xg_ref[...].astype(compute_dtype)
    contrib = jnp.dot(
        s, xg, preferred_element_type=jnp.float32, precision=precision
    )

    @pl.when(is_first)
    def _():
        out_ref[...] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[...] += contrib


def spmm_ell(
    plan: EllPlan,
    feat: jax.Array,
    *,
    block_d: int | None = None,
    compute_dtype=jnp.float32,
    precision=None,
    interpret: bool | None = None,
    out_dtype=None,
) -> jax.Array:
    """out[N, D] = (A o V)[N, M] @ feat[M, D] over the edge-per-lane plan.

    With binary values (csr_preprocess_ell(values=None)) this is the
    row-parallel CSR SpMM baseline (GE-SpMM role, reference
    bench/scripts/gespmm.cu:469-786): raw CSR edges padded per window,
    none of the binned-bitmask format's dedup/compression."""
    n, d = feat.shape
    assert n == plan.source_rows, (n, plan.source_rows)
    out_rows = plan.num_nodes
    if out_dtype is None:
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
        block_d = _pick_block_d(d_pad, block_h, 2 * 2**20)
    d_pad = _round_up(d_pad, block_d)
    if d_pad != d:
        feat = jnp.pad(feat, ((0, 0), (0, d_pad - d)))
    num_chunks = d_pad // block_d

    hind_flat = jnp.asarray(plan.hind).reshape(-1)
    xg = jnp.take(feat, hind_flat, axis=0, mode="clip")

    unroll = cfg.block_unroll
    assert plan.total_blocks % unroll == 0
    num_groups = plan.total_blocks // unroll
    erow3 = jnp.asarray(plan.erow).reshape(num_groups, unroll, block_w)
    vals3 = jnp.asarray(plan.vals).reshape(num_groups, unroll, block_w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks, num_groups),
        in_specs=[
            pl.BlockSpec((1, unroll, block_w), lambda c, b, wob: (b, 0, 0)),
            pl.BlockSpec((1, unroll, block_w), lambda c, b, wob: (b, 0, 0)),
            pl.BlockSpec((unroll * block_w, block_d), lambda c, b, wob: (b, c)),
        ],
        out_specs=pl.BlockSpec(
            (block_h, block_d), lambda c, b, wob: (wob[b], c)
        ),
    )
    kernel = functools.partial(
        _ell_fwd_kernel,
        block_h=block_h,
        block_w=block_w,
        compute_dtype=compute_dtype,
        precision=precision,
        unroll=unroll,
    )
    flops = 2 * plan.total_blocks * block_h * block_w * d_pad
    bytes_accessed = (
        xg.size * xg.dtype.itemsize
        + plan.total_blocks * block_w * 8
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
        erow3,
        vals3,
        xg,
    )

    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, block_h, total_repeat_length=plan.padded_nodes
        )
        out = jnp.where(nonempty[:, None], out, 0.0)
    return out[:out_rows, :d].astype(out_dtype)


def spmm_ell_streamed(
    plan: EllPlan, feat: jax.Array, *, num_chunks: int = 8, **kwargs
) -> jax.Array:
    """Window-chunked dispatch: peak HBM bounded by one chunk's gather
    (reddit-class graphs; the format/stream.py analogue). `plan` may be
    pre-sliced (a list from `format.ell.slice_ell_windows`)."""
    from ..format.ell import slice_ell_windows

    subs = (
        slice_ell_windows(plan, num_chunks)
        if isinstance(plan, EllPlan)
        else list(plan)
    )
    outs = [spmm_ell(s, feat, **kwargs) for s in subs]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _ell_dvals_kernel(
    wob_ref,  # scalar-prefetch: int32 (num_groups,)
    g_ref,  # (block_h, block_d) f32 upstream gradient / SDDMM left side
    xg_ref,  # (unroll * K, block_d) gathered right-side rows
    erow_ref,  # (1, unroll, K) int32
    out_ref,  # (1, 8, unroll * K) f32 — row 0 holds the lane vector
    *,
    block_h: int,
    block_w: int,
    precision,
    unroll: int,
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (block_h, block_w), 0)
    g = g_ref[...]
    for u in range(unroll):
        gx = jax.lax.dot_general(
            g,
            xg_ref[u * block_w : (u + 1) * block_w, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (H, K): gx[r, l] = g[r] . xg[l]
        sel = (iota == erow_ref[0, u : u + 1, :]).astype(jnp.float32)
        # lane l's gradient lives at row erow[l]: select it and fold the
        # column with a sublane reduction -> natural (1, K) lane layout
        lane = jnp.sum(sel * gx, axis=0, keepdims=True)  # (1, K)
        out_ref[0, 0:1, u * block_w : (u + 1) * block_w] += lane


def spmm_ell_dvals(
    plan: EllPlan,
    feat: jax.Array,
    g: jax.Array,
    *,
    block_d: int | None = None,
    precision=None,
    interpret: bool | None = None,
) -> jax.Array:
    """d/d(plan.vals) of sum(spmm_ell(plan, feat) * g): a (total_blocks,
    block_w) per-LANE gradient — O(nnz) output, no expanded plane.

    Identity: dval[b, l] = g[wob[b]*H + erow[b,l], :] . feat[hind[b,l], :]
    — with g <- X this is exactly the SDDMM forward (see `sddmm_ell`)."""
    n, d = feat.shape
    assert n == plan.source_rows, (n, plan.source_rows)
    cfg = plan.config
    block_h, block_w = cfg.block_h, cfg.block_w
    if plan.total_blocks == 0:
        return jnp.zeros((0, block_w), jnp.float32)
    assert block_h % 8 == 0 and block_w % 128 == 0
    if interpret is None:
        interpret = _interpret_default()

    d_pad = _round_up(d, 128)
    if block_d is None:
        block_d = _pick_block_d(d_pad, block_h, 2 * 2**20)
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
    erow3 = jnp.asarray(plan.erow).reshape(num_groups, unroll, block_w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_groups, num_chunks),
        in_specs=[
            pl.BlockSpec((block_h, block_d), lambda b, c, wob: (wob[b], c)),
            pl.BlockSpec((unroll * block_w, block_d), lambda b, c, wob: (b, c)),
            pl.BlockSpec((1, unroll, block_w), lambda b, c, wob: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, unroll * block_w), lambda b, c, wob: (b, 0, 0)
        ),
    )
    kernel = functools.partial(
        _ell_dvals_kernel,
        block_h=block_h,
        block_w=block_w,
        precision=precision,
        unroll=unroll,
    )
    flops = 2 * plan.total_blocks * block_h * block_w * d_pad
    bytes_accessed = (
        xg.size * 4
        + plan.padded_nodes * d_pad * 4
        + num_groups * 8 * unroll * block_w * 4
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_groups, 8, unroll * block_w), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(jnp.asarray(plan.window_of_block)[::unroll], g, xg, erow3)
    return out[:, 0, :].reshape(plan.total_blocks, block_w)


# ---------------------------------------------------------------------------
# training entry points


def _zero_like_tree(tree):
    from .autodiff import _zero_cotangent

    return jax.tree.map(_zero_cotangent, tree)


@jax.custom_vjp
def spmm_ell_ad(plan: EllPlan, plan_t: EllPlan, feat):
    """ELL weighted SpMM with gradients for feat AND the lane values.

    plan_t must encode A^T with matching values (build both with
    `format.ell.build_ell_pair`, or `ell_transpose`). Backward:
      d/dfeat = (A o V)^T @ g       — spmm_ell with plan_t;
      d/dvals = per-lane g.x inner products (spmm_ell_dvals), delivered
    as the cotangent of plan.vals — differentiate through
    `dataclasses.replace(plan, vals=lane_values(plan, w))` to train
    per-edge parameters w."""
    return spmm_ell(plan, feat)


def _ell_fwd(plan, plan_t, feat):
    return spmm_ell(plan, feat), (plan, plan_t, feat)


def _ell_bwd(res, g):
    import dataclasses

    plan, plan_t, feat = res
    dfeat = spmm_ell(plan_t, g.astype(feat.dtype)).astype(feat.dtype)
    dvals = spmm_ell_dvals(plan, feat, g)
    dplan = dataclasses.replace(_zero_like_tree(plan), vals=dvals)
    return (dplan, _zero_like_tree(plan_t), dfeat)


spmm_ell_ad.defvjp(_ell_fwd, _ell_bwd)


def sddmm_ell(
    plan: EllPlan, x: jax.Array, y: jax.Array, *, per_edge: bool = False,
    **kwargs,
) -> jax.Array:
    """Sampled dense-dense matmul on the ELL plan (cuSPARSE
    `cusparseSDDMM` role; the reference is SpMM-only): for every edge
    (u, v), score = x[u] . y[v]. Returns the (total_blocks, block_w)
    lane plane, or with per_edge=True the (nnz,) vector in CSR edge
    order (attention logits, link-prediction scores). Forward-only —
    for training use `sddmm_ell_ad`."""
    lanes = spmm_ell_dvals(plan, y, x, **kwargs)
    if per_edge:
        from ..format.ell import edge_values

        return edge_values(plan, lanes)
    return lanes


@jax.custom_vjp
def sddmm_ell_ad(plan: EllPlan, plan_t: EllPlan, x, y):
    """Differentiable SDDMM -> (nnz,) per-edge scores in CSR order.

    Backward (both are ELL SpMMs — the SDDMM/SpMM adjoint pair):
      dx = (A o G) @ y     with G = per-edge score cotangents;
      dy = (A o G)^T @ x   via plan_t.
    Build (plan, plan_t) with `format.ell.build_ell_pair` so both sides'
    edge maps are in the SAME (original CSR) edge order."""
    lanes = spmm_ell_dvals(plan, y, x)
    from ..format.ell import edge_values

    return edge_values(plan, lanes)


def _sddmm_fwd(plan, plan_t, x, y):
    return sddmm_ell_ad(plan, plan_t, x, y), (plan, plan_t, x, y)


def _sddmm_bwd(res, g):
    import dataclasses

    from ..format.ell import lane_values

    plan, plan_t, x, y = res
    g = g.astype(jnp.float32)
    gp = dataclasses.replace(plan, vals=lane_values(plan, g))
    gp_t = dataclasses.replace(plan_t, vals=lane_values(plan_t, g))
    dx = spmm_ell(gp, y.astype(jnp.float32)).astype(x.dtype)
    dy = spmm_ell(gp_t, x.astype(jnp.float32)).astype(y.dtype)
    return (_zero_like_tree(plan), _zero_like_tree(plan_t), dx, dy)


sddmm_ell_ad.defvjp(_sddmm_fwd, _sddmm_bwd)
