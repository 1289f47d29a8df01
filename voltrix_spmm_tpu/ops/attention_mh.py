"""Multi-head fused graph attention on the binned plan.

The per-head op (`ops.attention`) pays one gather CALL per head per
direction. On v5e a row gather is per-ROW-ISSUE-bound below ~1.94 KB
rows (gather law: max(rows/175M, bytes/340G), docs/DESIGN.md), so at
GAT widths (dk = dv = 64..256) every call costs the same ~rows/175M
floor no matter how thin the rows are — a 4-head training step makes
~10 such calls and the floor dominates the step (measured: 15 x
13.4 ms of gather floor inside the 249.5 ms rmat-17 d64 step).

This module batches the heads:

- ONE gather per (plan, direction) of a per-head-interleaved plane
  ([k_1||v_1 ... k_H||v_H], lane-aligned 128-padded segments), and
- ONE kernel launch with the head as a leading grid dimension; each
  grid step DMAs only its head's lane-aligned column slice, so VMEM
  pressure per step is identical to the per-head kernel.

Width grows H-fold but stays at (d64, H4) under the per-row knee: the
batched gather costs the SAME floor as one per-head call. The three
kernels (fwd online-softmax, dQ over the forward plan, dK/dV over the
transpose plan) are head-sliced versions of `ops.attention`'s; the
backward REQUIRES the transpose plan (the per-lane scatter fallback
stays per-head only).

Reference role: none — the reference serves binary GCN/SAGE aggregation
only (bmat_kernels.cuh:16-20); this is the TPU framework's own
transformer-class extension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.plan import SpmmPlan
from .bitmask import expand_bitmask
from .attention import _EMPTY_LSE, _NEG, _score_tile
from .pallas_spmm import (
    _gather_rows,
    _interpret_default,
    _round_up,
)


def _interleave_heads(parts, n_rows):
    """[(H, n, d_pad), ...] -> (n_rows, H * sum(d_pad)) with per-head
    segments [p0_h || p1_h || ...] interleaved (lane-aligned slices)."""
    cat = jnp.concatenate(parts, axis=2)  # (H, n, sum)
    h, n, w = cat.shape
    if n != n_rows:
        cat = jnp.pad(cat, ((0, 0), (0, n_rows - n), (0, 0)))
    return jnp.transpose(cat, (1, 0, 2)).reshape(n_rows, h * w)


def _pad_heads(x, d_pad):
    """(H, n, d) -> (H, n, d_pad) f32."""
    h, n, d = x.shape
    return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, d_pad - d)))


def _attn_fwd_mh_kernel(
    wob_ref,
    bitmask_ref,  # (unroll, words, K)
    q_ref,  # (block_h, dk_pad) — head h's slice
    kv_ref,  # (UK, dk_pad + dv_pad) — head h's gathered k||v slice
    out_ref,  # (block_h, dv_pad)
    *rest,  # [stats_ref] m_scr l_scr
    block_h: int,
    dk_pad: int,
    with_stats: bool,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
):
    stats_ref = rest[0] if with_stats else None
    m_scr, l_scr = rest[-2], rest[-1]
    b = pl.program_id(1)
    ngroups = pl.num_programs(1)
    w = wob_ref[b]
    is_first = jnp.logical_or(b == 0, wob_ref[jnp.maximum(b - 1, 0)] != w)
    is_last = jnp.logical_or(
        b == ngroups - 1, wob_ref[jnp.minimum(b + 1, ngroups - 1)] != w
    )

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        l_scr[...] = jnp.zeros_like(l_scr)

    mask_f = jnp.concatenate(
        [
            expand_bitmask(bitmask_ref[u], block_h, jnp.float32)
            for u in range(unroll)
        ],
        axis=1,
    )
    q = q_ref[...].astype(compute_dtype)
    kg = kv_ref[:, :dk_pad].astype(compute_dtype)
    vg = kv_ref[:, dk_pad:]
    s_m, _ = _score_tile(
        q, kg, mask_f,
        scale=scale, negative_slope=negative_slope, precision=precision,
    )
    m_old = m_scr[:, 0:1]
    m_new = jnp.maximum(m_old, jnp.max(s_m, axis=1, keepdims=True))
    corr = jnp.exp(m_old - m_new)
    p = jnp.exp(s_m - m_new) * mask_f
    l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    pv = jnp.dot(
        p.astype(compute_dtype),
        vg.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    out_ref[...] = out_ref[...] * corr + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(is_last)
    def _():
        out_ref[...] = out_ref[...] / jnp.maximum(l_new, 1e-30)
        if with_stats:
            lse = jnp.where(
                l_new > 0, m_new + jnp.log(jnp.maximum(l_new, 1e-30)),
                _EMPTY_LSE,
            )
            stats_ref[...] = jnp.broadcast_to(lse, stats_ref.shape)


def spmm_attention_mh(
    plan: SpmmPlan,
    q: jax.Array,  # (H, nq, dk)
    k: jax.Array,  # (H, nk, dk)
    v: jax.Array,  # (H, nk, dv)
    *,
    scale: float | None = None,
    negative_slope: float = 1.0,
    compute_dtype=jnp.float32,
    precision=None,
    return_stats: bool = False,
    interpret: bool | None = None,
    out_dtype=None,
):
    """All-head fused attention aggregation: per head h,
    out[h, r] = softmax_{l in N(r)}(act(scale q[h,r] . k[h,l])) @ v[h].

    ONE gather + ONE kernel launch for every head (head = leading grid
    dim). Returns (H, nq, dv) [+ lse (H, padded_nodes) when
    return_stats]. Heads share scale/slope (same dk per head).
    """
    assert q.ndim == k.ndim == v.ndim == 3, "mh op takes (H, n, d) stacks"
    H, nq, dk = q.shape
    _, nk, _ = k.shape
    dv = v.shape[2]
    assert k.shape == (H, nk, dk) and v.shape[:2] == (H, nk)
    assert nk == plan.source_rows and nq == plan.num_nodes
    if scale is None:
        scale = 1.0 / float(dk) ** 0.5
    if out_dtype is None:
        out_dtype = v.dtype
    if interpret is None:
        interpret = _interpret_default()
    if plan.total_blocks == 0:
        out = jnp.zeros((H, nq, dv), out_dtype)
        if return_stats:
            return out, jnp.full(
                (H, plan.padded_nodes), _EMPTY_LSE, jnp.float32
            )
        return out

    cfg = plan.config
    block_h, block_w, words = cfg.block_h, cfg.block_w, cfg.words_per_col
    assert block_h % 32 == 0 and block_w % 128 == 0
    dk_pad = _round_up(dk, 128)
    dv_pad = _round_up(dv, 128)

    qf = _interleave_heads([_pad_heads(q, dk_pad)], plan.padded_nodes)
    kvf = _interleave_heads(
        [_pad_heads(k, dk_pad), _pad_heads(v, dv_pad)], nk
    )
    kvg = _gather_rows(plan, kvf, H * (dk_pad + dv_pad))

    unroll = cfg.block_unroll
    num_groups = plan.total_blocks // unroll
    uk = unroll * block_w

    in_specs = [
        pl.BlockSpec((unroll, words, block_w), lambda h, b, wob: (b, 0, 0)),
        pl.BlockSpec((block_h, dk_pad), lambda h, b, wob: (wob[b], h)),
        pl.BlockSpec((uk, dk_pad + dv_pad), lambda h, b, wob: (b, h)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((plan.padded_nodes, H * dv_pad), jnp.float32)
    ]
    out_specs = [
        pl.BlockSpec((block_h, dv_pad), lambda h, b, wob: (wob[b], h))
    ]
    if return_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((plan.padded_nodes, H * 128), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((block_h, 128), lambda h, b, wob: (wob[b], h))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, num_groups),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_h, 128), jnp.float32),
            pltpu.VMEM((block_h, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _attn_fwd_mh_kernel,
        block_h=block_h,
        dk_pad=dk_pad,
        with_stats=return_stats,
        scale=float(scale),
        negative_slope=float(negative_slope),
        compute_dtype=compute_dtype,
        precision=precision,
        unroll=unroll,
    )
    flops = 2 * H * plan.total_blocks * block_h * block_w * (dk_pad + dv_pad)
    bytes_accessed = (
        kvg.size * 4
        + H * plan.total_blocks * words * block_w * 4
        + plan.padded_nodes * H * (dk_pad + dv_pad) * 4
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bytes_accessed,
            transcendentals=H * plan.total_blocks * block_h * block_w,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.window_of_block)[::unroll], jnp.asarray(plan.bitmask),
      qf, kvg)

    out_flat = outs[0]
    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, block_h, total_repeat_length=plan.padded_nodes
        )
        out_flat = jnp.where(nonempty[:, None], out_flat, 0.0)
    out = (
        out_flat.reshape(plan.padded_nodes, H, dv_pad)
        .transpose(1, 0, 2)[:, :nq, :dv]
        .astype(out_dtype)
    )
    if return_stats:
        lse = outs[1].reshape(plan.padded_nodes, H, 128)[:, :, 0].T
        if plan.has_empty_windows:
            lse = jnp.where(nonempty[None, :], lse, _EMPTY_LSE)
        return out, lse
    return out


def _attn_bwd_dq_mh_kernel(
    wob_ref,
    bitmask_ref,
    q_ref,  # (block_h, dk_pad) head slice
    kv_ref,  # (UK, dk_pad + dv_pad) head slice of the fwd gather
    do_ref,  # (block_h, dv_pad) head slice
    stats_ref,  # (block_h, 128) head slice: col 0 lse, col 1 D
    dq_ref,  # out (block_h, dk_pad) head slice, revisited
    *,
    block_h: int,
    dk_pad: int,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
):
    b = pl.program_id(1)
    w = wob_ref[b]
    is_first = jnp.logical_or(b == 0, wob_ref[jnp.maximum(b - 1, 0)] != w)

    @pl.when(is_first)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    mask_f = jnp.concatenate(
        [
            expand_bitmask(bitmask_ref[u], block_h, jnp.float32)
            for u in range(unroll)
        ],
        axis=1,
    )
    q = q_ref[...].astype(compute_dtype)
    kg = kv_ref[:, :dk_pad].astype(compute_dtype)
    vg = kv_ref[:, dk_pad:]
    do = do_ref[...]
    s_m, raw = _score_tile(
        q, kg, mask_f,
        scale=scale, negative_slope=negative_slope, precision=precision,
    )
    lse = stats_ref[:, 0:1]
    d_row = stats_ref[:, 1:2]
    p = jnp.exp(s_m - lse) * mask_f
    dp = jax.lax.dot_general(
        do.astype(compute_dtype),
        vg.astype(compute_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    ds = p * (dp - d_row)
    if negative_slope != 1.0:
        ds = ds * jnp.where(raw > 0, 1.0, negative_slope)
    draw = (ds * scale).astype(compute_dtype)
    dq_ref[...] += jnp.dot(
        draw, kg, preferred_element_type=jnp.float32, precision=precision
    )


def _attn_bwd_dkv_mh_kernel(
    wob_ref,
    bitmask_ref,  # transpose plan
    kv_ref,  # (block_h_t, dk_pad + dv_pad) window's OWN k||v, head slice
    qdo_ref,  # (UK_t, dk_pad + dv_pad) gathered q||dO, head slice
    stats_ref,  # (UK_t, dk_pad + dv_pad) gathered; cols 2h / 2h+1 of the
    #             leading 128 lanes hold lse_h / D_h
    dk_ref,  # out (block_h_t, dk_pad), revisited
    dv_ref,  # out (block_h_t, dv_pad), revisited
    *,
    block_h: int,
    dk_pad: int,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
):
    h = pl.program_id(0)
    b = pl.program_id(1)
    w = wob_ref[b]
    is_first = jnp.logical_or(b == 0, wob_ref[jnp.maximum(b - 1, 0)] != w)

    @pl.when(is_first)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    mask_f = jnp.concatenate(
        [
            expand_bitmask(bitmask_ref[u], block_h, jnp.float32)
            for u in range(unroll)
        ],
        axis=1,
    )
    kwin = kv_ref[:, :dk_pad].astype(compute_dtype)
    vwin = kv_ref[:, dk_pad:]
    qg = qdo_ref[:, :dk_pad].astype(compute_dtype)
    dog = qdo_ref[:, dk_pad:]
    # head h's per-dst scalars live at lanes 2h / 2h+1 of the stats tile;
    # lane-select via iota compare (dynamic lane slicing is not a Mosaic
    # primitive, a masked row-reduce is)
    stats = stats_ref[:, :128]
    lane = jax.lax.broadcasted_iota(jnp.int32, stats.shape, 1)
    lse_lane = jnp.sum(jnp.where(lane == 2 * h, stats, 0.0), axis=1)
    d_lane = jnp.sum(jnp.where(lane == 2 * h + 1, stats, 0.0), axis=1)

    s_m, raw = _score_tile(
        kwin, qg, mask_f,
        scale=scale, negative_slope=negative_slope, precision=precision,
    )
    p = jnp.exp(s_m - lse_lane[None, :]) * mask_f
    dv_ref[...] += jnp.dot(
        p.astype(compute_dtype),
        dog.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    dp = jax.lax.dot_general(
        vwin.astype(compute_dtype),
        dog.astype(compute_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    ds = p * (dp - d_lane[None, :])
    if negative_slope != 1.0:
        ds = ds * jnp.where(raw > 0, 1.0, negative_slope)
    draw = (ds * scale).astype(compute_dtype)
    dk_ref[...] += jnp.dot(
        draw, qg, preferred_element_type=jnp.float32, precision=precision
    )


def _attn_bwd_mh(
    plan: SpmmPlan,
    plan_t: SpmmPlan,
    q, k, v, out, lse, g,
    *,
    scale: float,
    negative_slope: float,
    compute_dtype=jnp.float32,
    precision=None,
    interpret: bool | None = None,
):
    """(dq, dk, dv) stacks for `spmm_attention_mh` — split backward over
    the (plan, plan^T) pair, one gather + one launch per kernel for all
    heads. The forward's interleaved kv gather is rebuilt identically so
    XLA CSEs it with the forward inside a jitted train step."""
    H, nq, dk = q.shape
    nk = k.shape[1]
    dv = v.shape[2]
    if interpret is None:
        interpret = _interpret_default()

    cfg = plan.config
    block_h, block_w, words = cfg.block_h, cfg.block_w, cfg.words_per_col
    dk_pad = _round_up(dk, 128)
    dv_pad = _round_up(dv, 128)
    padded = plan.padded_nodes

    qf = _interleave_heads([_pad_heads(q, dk_pad)], padded)
    kvf = _interleave_heads(
        [_pad_heads(k, dk_pad), _pad_heads(v, dv_pad)], nk
    )
    kvg = _gather_rows(plan, kvf, H * (dk_pad + dv_pad))
    dof = _interleave_heads([_pad_heads(g, dv_pad)], padded)
    # D = rowsum(dO o O) per head per dst row
    d_row = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=2
    )  # (H, nq)
    d_row = jnp.pad(d_row, ((0, 0), (0, padded - nq)))
    # kernel-A stats: per-head (padded, 128) blocks, col 0 lse, col 1 D
    stats_a = _interleave_heads(
        [
            lse.astype(jnp.float32)[:, :, None],
            d_row[:, :, None],
            jnp.zeros((H, padded, 126), jnp.float32),
        ],
        padded,
    )

    unroll = cfg.block_unroll
    num_groups = plan.total_blocks // unroll
    uk = unroll * block_w
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, num_groups),
        in_specs=[
            pl.BlockSpec(
                (unroll, words, block_w), lambda h, b, wob: (b, 0, 0)
            ),
            pl.BlockSpec((block_h, dk_pad), lambda h, b, wob: (wob[b], h)),
            pl.BlockSpec((uk, dk_pad + dv_pad), lambda h, b, wob: (b, h)),
            pl.BlockSpec((block_h, dv_pad), lambda h, b, wob: (wob[b], h)),
            pl.BlockSpec((block_h, 128), lambda h, b, wob: (wob[b], h)),
        ],
        out_specs=[
            pl.BlockSpec((block_h, dk_pad), lambda h, b, wob: (wob[b], h)),
        ],
    )
    (dq_flat,) = pl.pallas_call(
        functools.partial(
            _attn_bwd_dq_mh_kernel,
            block_h=block_h,
            dk_pad=dk_pad,
            scale=float(scale),
            negative_slope=float(negative_slope),
            compute_dtype=compute_dtype,
            precision=precision,
            unroll=unroll,
        ),
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((padded, H * dk_pad), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * H * plan.total_blocks * block_h * block_w
            * (dk_pad + dv_pad),
            bytes_accessed=kvg.size * 4
            + H * plan.total_blocks * words * block_w * 4
            + padded * H * (2 * dk_pad + dv_pad + 128) * 4,
            transcendentals=H * plan.total_blocks * block_h * block_w,
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan.window_of_block)[::unroll],
        jnp.asarray(plan.bitmask),
        qf,
        kvg,
        dof,
        stats_a,
    )
    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, block_h, total_repeat_length=padded
        )
        dq_flat = jnp.where(nonempty[:, None], dq_flat, 0.0)
    dq = dq_flat.reshape(padded, H, dk_pad).transpose(1, 0, 2)[:, :nq, :dk]

    # ---- dK/dV over the transpose plan ----
    cfg_t = plan_t.config
    bh_t, bw_t, words_t = cfg_t.block_h, cfg_t.block_w, cfg_t.words_per_col
    assert plan_t.source_rows == plan.num_nodes
    assert plan_t.num_nodes == plan.source_rows
    kvw = kvf
    if plan_t.padded_nodes != nk:
        kvw = jnp.pad(kvw, ((0, plan_t.padded_nodes - nk), (0, 0)))
    # gathered per-dst plane: interleaved [q_h || dO_h] segments plus a
    # trailing (dk_pad + dv_pad)-wide stats segment whose leading 128
    # lanes pack (lse_h, D_h) pairs at lanes (2h, 2h+1)
    pair_w = dk_pad + dv_pad
    stats_cols = [
        lse.astype(jnp.float32)[:, :, None],
        d_row[:, :, None],
    ]
    stats_packed = (
        jnp.concatenate(stats_cols, axis=2)
        .transpose(1, 0, 2)
        .reshape(padded, 2 * H)
    )
    stats_packed = jnp.pad(stats_packed, ((0, 0), (0, pair_w - 2 * H)))
    qdo = _interleave_heads(
        [_pad_heads(q, dk_pad), _pad_heads(g, dv_pad)], padded
    )
    qdo_all = jnp.concatenate([qdo, stats_packed], axis=1)
    qdo_g = _gather_rows(plan_t, qdo_all, (H + 1) * pair_w)

    unroll_t = cfg_t.block_unroll
    num_groups_t = plan_t.total_blocks // unroll_t
    uk_t = unroll_t * bw_t
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, num_groups_t),
        in_specs=[
            pl.BlockSpec(
                (unroll_t, words_t, bw_t), lambda h, b, wob: (b, 0, 0)
            ),
            pl.BlockSpec((bh_t, pair_w), lambda h, b, wob: (wob[b], h)),
            pl.BlockSpec((uk_t, pair_w), lambda h, b, wob: (b, h)),
            # the SAME gathered array again, pinned to its stats tail
            pl.BlockSpec((uk_t, pair_w), lambda h, b, wob: (b, H)),
        ],
        out_specs=[
            pl.BlockSpec((bh_t, dk_pad), lambda h, b, wob: (wob[b], h)),
            pl.BlockSpec((bh_t, dv_pad), lambda h, b, wob: (wob[b], h)),
        ],
    )
    dk_flat, dv_flat = pl.pallas_call(
        functools.partial(
            _attn_bwd_dkv_mh_kernel,
            block_h=bh_t,
            dk_pad=dk_pad,
            scale=float(scale),
            negative_slope=float(negative_slope),
            compute_dtype=compute_dtype,
            precision=precision,
            unroll=unroll_t,
        ),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (plan_t.padded_nodes, H * dk_pad), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (plan_t.padded_nodes, H * dv_pad), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * H * plan_t.total_blocks * bh_t * bw_t
            * (dk_pad + dv_pad),
            bytes_accessed=qdo_g.size * 4
            + H * plan_t.total_blocks * words_t * bw_t * 4
            + plan_t.padded_nodes * 2 * H * (dk_pad + dv_pad) * 4,
            transcendentals=H * plan_t.total_blocks * bh_t * bw_t,
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan_t.window_of_block)[::unroll_t],
        jnp.asarray(plan_t.bitmask),
        kvw,
        qdo_g,
        qdo_g,
    )
    if plan_t.has_empty_windows:
        bpw_t = jnp.diff(jnp.asarray(plan_t.block_ptr))
        nonempty_t = jnp.repeat(
            bpw_t > 0, bh_t, total_repeat_length=plan_t.padded_nodes
        )
        dk_flat = jnp.where(nonempty_t[:, None], dk_flat, 0.0)
        dv_flat = jnp.where(nonempty_t[:, None], dv_flat, 0.0)
    dk_out = (
        dk_flat.reshape(plan_t.padded_nodes, H, dk_pad)
        .transpose(1, 0, 2)[:, :nk, :dk]
    )
    dv_out = (
        dv_flat.reshape(plan_t.padded_nodes, H, dv_pad)
        .transpose(1, 0, 2)[:, :nk, :dv]
    )
    return (
        dq.astype(q.dtype), dk_out.astype(k.dtype), dv_out.astype(v.dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _spmm_attention_mh_ad(
    plan, plan_t, q, k, v, scale, negative_slope, compute_dtype, precision
):
    return spmm_attention_mh(
        plan, q, k, v,
        scale=scale, negative_slope=negative_slope,
        compute_dtype=compute_dtype, precision=precision,
    )


def _mh_ad_fwd(plan, plan_t, q, k, v, scale, negative_slope, compute_dtype,
               precision):
    if scale is None:
        scale = 1.0 / float(q.shape[2]) ** 0.5
    out, lse = spmm_attention_mh(
        plan, q, k, v,
        scale=scale, negative_slope=negative_slope,
        compute_dtype=compute_dtype, precision=precision,
        return_stats=True,
    )
    return out, (plan, plan_t, q, k, v, out, lse)


def _mh_ad_bwd(scale, negative_slope, compute_dtype, precision, res, g):
    plan, plan_t, q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / float(q.shape[2]) ** 0.5
    dq, dk, dv = _attn_bwd_mh(
        plan, plan_t, q, k, v, out, lse, g,
        scale=scale, negative_slope=negative_slope,
        compute_dtype=compute_dtype, precision=precision,
    )
    from .autodiff import _zero_cotangent

    dplan = jax.tree.map(_zero_cotangent, plan)
    dplan_t = jax.tree.map(_zero_cotangent, plan_t)
    return (dplan, dplan_t, dq, dk, dv)


_spmm_attention_mh_ad.defvjp(_mh_ad_fwd, _mh_ad_bwd)


def spmm_attention_mh_ad(
    plan: SpmmPlan,
    q,
    k,
    v,
    *,
    plan_t: SpmmPlan,
    scale: float | None = None,
    negative_slope: float = 1.0,
    compute_dtype=jnp.float32,
    precision=None,
):
    """Differentiable all-head fused attention (gradients for q/k/v
    stacks). Requires the transpose plan: the batched backward is the
    scatter-free split form only (per-lane fallback stays per-head —
    use `spmm_attention_ad` without plan_t for that)."""
    if plan_t is None:
        raise ValueError(
            "spmm_attention_mh_ad requires plan_t (csr_preprocess of "
            "A^T); for the scatter fallback call spmm_attention_ad per "
            "head"
        )
    return _spmm_attention_mh_ad(
        plan, plan_t, q, k, v, scale, negative_slope, compute_dtype,
        precision,
    )
