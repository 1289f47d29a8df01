"""Multi-head fused graph attention on the binned plan.

The per-head op (`ops.attention`) pays one gather CALL per head per
direction. On v5e a row gather is per-ROW-ISSUE-bound below ~1.94 KB
rows (gather law: max(rows/175M, bytes/340G), docs/DESIGN.md), so at
GAT widths (dk = dv = 64..256) every call costs the same ~rows/175M
floor no matter how thin the rows are — a 4-head training step makes
~10 such calls and the floor dominates the step (measured: the gather
floor was the majority of the 249.5 ms rmat-17 d64 split-backward
step). This module batches the heads:

- ONE gather per (plan, direction) of a per-head-interleaved plane and
  ONE kernel launch with the head as a leading grid dimension; each
  grid step DMAs only its head's lane-aligned column slice.

- PAIR PACKING: each head's segment is [k_h(dk) || v_h(dv)] padded to
  round_up(dk+dv, 128) — one segment, not two separately 128-padded
  planes. At d64 that halves every plane (256 -> 128 lanes/head). The
  kernels separate the k/v (q/dO) zones with in-register iota masks
  and exploit zero-block algebra: dot([q||0], [k||v]) = q.k, and
  p @ [k||v] lands p@v at a known column offset that the host slices
  out — polluted lanes fall in slices that are discarded.

- plane_dtype=bfloat16 (opt-in) halves gathered bytes again. The MXU's
  default matmul precision already rounds f32 inputs to bf16, so the
  score/aggregation dots lose nothing; the softmax statistics (lse, D)
  — which DO need f32 — travel as hi/lo bf16 pairs
  (hi = bf16(x), lo = bf16(x - f32(hi)), reconstructed in-kernel as
  f32(hi) + f32(lo), ~2^-16 relative error).

The backward is the scatter-free split form over the (plan, plan^T)
pair only (per-lane scatter fallback stays per-head in
`ops.attention`). Measured rmat-17 d64 h128u4 train step: 478.5 ms
(per-head, scatter bwd) -> 207.6 ms (padded mh) -> see bench/ CSVs for
the packed/bf16 numbers.

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


def _interleave_pairs(parts, n_rows, seg_w, dtype=jnp.float32):
    """[(H, n, d_i), ...] -> (n_rows, H * seg_w): per head, the parts
    are packed back to back ([p0_h || p1_h || ...]) and zero-padded to
    seg_w lanes; heads are interleaved so head h's segment is the
    lane-aligned column block [h*seg_w, (h+1)*seg_w)."""
    cat = jnp.concatenate(
        [p.astype(jnp.float32) for p in parts], axis=2
    )  # (H, n, sum d_i)
    h, n, w = cat.shape
    cat = jnp.pad(cat, ((0, 0), (0, n_rows - n), (0, seg_w - w)))
    return (
        jnp.transpose(cat, (1, 0, 2)).reshape(n_rows, h * seg_w)
        .astype(dtype)
    )


def _split_heads(flat, n_rows, seg_w, lo, hi, nq):
    """(n_rows, H*seg_w) -> (H, nq, hi-lo): undo _interleave_pairs and
    slice each head's segment columns [lo, hi)."""
    h = flat.shape[1] // seg_w
    return (
        flat.reshape(n_rows, h, seg_w)
        .transpose(1, 0, 2)[:, :nq, lo:hi]
    )


def _zone_mask(shape, lo, hi):
    """f32 (rows, lanes) mask selecting lane zone [lo, hi)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return jnp.where((lane >= lo) & (lane < hi), 1.0, 0.0)


def _split_hi_lo(x):
    """f32 -> (bf16 hi, bf16 lo) with f32(hi) + f32(lo) ~= x to ~2^-16
    relative — the two-term split that lets softmax statistics ride a
    bf16 gather plane without losing the f32 accuracy they need."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _lane_select(tile_f32, idx):
    """Sum-select lane `idx` (traced ok) of an f32 (rows, lanes) tile —
    dynamic lane slicing is not a Mosaic primitive, a masked reduce is."""
    lane = jax.lax.broadcasted_iota(jnp.int32, tile_f32.shape, 1)
    return jnp.sum(jnp.where(lane == idx, tile_f32, 0.0), axis=1)


def _group_occupancy(plan):
    """int32 (num_groups,) sub-window occupancy bitmap, OR'd over each
    unroll group (same scheme as ops/pallas_spmm's subtile path)."""
    from .pallas_spmm import _subtile_occupancy

    u = plan.config.block_unroll
    occ_blocks = (
        jnp.asarray(plan.occ)
        if plan.occ is not None
        else _subtile_occupancy(jnp.asarray(plan.bitmask), u)
    )
    occ_group = occ_blocks[::u]
    for i in range(1, u):
        occ_group = occ_group | occ_blocks[i::u]
    return occ_group


def _attn_fwd_mh_kernel(
    wob_ref,
    *args,  # [occ_ref] bitmask_ref q_ref kv_ref out_ref [stats_ref]
    #         m_scr l_scr — occ_ref only when nsub > 0
    block_h: int,
    with_stats: bool,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
    nsub: int = 0,
):
    """nsub == 0: one full (block_h, UK) online-softmax update per
    group. nsub > 0: the SpMM subtile trick (VERDICT r4 #3) — with
    column-clustered plans each group's bits concentrate in few 128-row
    sub-windows; rows of an empty sub-window provably keep their m/l/out
    state (empty mask -> m_new = m_old, corr = 1, p = 0), so skipping
    them skips the VPU bitmask expansion AND the exp() softmax work —
    the measured per-slot bottleneck of the tall-window attention walk
    (docs/RESULTS.md round-4 floor analysis)."""
    if nsub:
        occ_ref, bitmask_ref, q_ref, kv_ref, out_ref, *rest = args
    else:
        bitmask_ref, q_ref, kv_ref, out_ref, *rest = args
        occ_ref = None
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

    kv = kv_ref[...].astype(compute_dtype)

    def update(r0, rows, mask_f):
        # q's v-zone is zero, so the full-pair contraction IS q . k
        q_t = q_ref[r0 : r0 + rows, :].astype(compute_dtype)
        s_m, _ = _score_tile(
            q_t, kv, mask_f,
            scale=scale, negative_slope=negative_slope,
            precision=precision,
        )
        m_old = m_scr[r0 : r0 + rows, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(s_m, axis=1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(s_m - m_new) * mask_f
        l_new = l_scr[r0 : r0 + rows, 0:1] * corr + jnp.sum(
            p, axis=1, keepdims=True
        )
        # p @ [k || v]: the v-zone columns are the aggregation; the
        # k-zone columns are pollution the host slice discards
        pv = jnp.dot(
            p.astype(compute_dtype),
            kv,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        out_ref[r0 : r0 + rows, :] = out_ref[r0 : r0 + rows, :] * corr + pv
        m_scr[r0 : r0 + rows, :] = jnp.broadcast_to(m_new, (rows, 128))
        l_scr[r0 : r0 + rows, :] = jnp.broadcast_to(l_new, (rows, 128))

    if nsub:
        occ = occ_ref[b]
        for s in range(nsub):
            @pl.when((occ >> s) & 1 != 0)
            def _(s=s):
                mask_f = jnp.concatenate(
                    [
                        expand_bitmask(
                            bitmask_ref[u, s * 4 : (s + 1) * 4],
                            128,
                            jnp.float32,
                        )
                        for u in range(unroll)
                    ],
                    axis=1,
                )
                update(s * 128, 128, mask_f)
    else:
        mask_f = jnp.concatenate(
            [
                expand_bitmask(bitmask_ref[u], block_h, jnp.float32)
                for u in range(unroll)
            ],
            axis=1,
        )
        update(0, block_h, mask_f)

    @pl.when(is_last)
    def _():
        l_fin = l_scr[:, 0:1]
        out_ref[...] = out_ref[...] / jnp.maximum(l_fin, 1e-30)
        if with_stats:
            lse = jnp.where(
                l_fin > 0,
                m_scr[:, 0:1] + jnp.log(jnp.maximum(l_fin, 1e-30)),
                _EMPTY_LSE,
            )
            stats_ref[...] = jnp.broadcast_to(lse, stats_ref.shape)


def _plane_dtype_of(plane_dtype, *arrs):
    if plane_dtype is None:
        return jnp.float32
    return jnp.dtype(plane_dtype)


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
    plane_dtype=None,
    return_stats: bool = False,
    subtile: bool = False,
    interpret: bool | None = None,
    out_dtype=None,
):
    """All-head fused attention aggregation: per head h,
    out[h, r] = softmax_{l in N(r)}(act(scale q[h,r] . k[h,l])) @ v[h].

    ONE pair-packed gather + ONE kernel launch for every head (head =
    leading grid dim). plane_dtype=jnp.bfloat16 streams the gathered
    plane in bf16 (accumulation stays f32; same accuracy class as the
    MXU's default bf16-rounding matmul precision). Returns (H, nq, dv)
    [+ lse (H, padded_nodes) when return_stats]. Heads share scale and
    slope (same dk per head).

    subtile=True skips fully-masked 128-row sub-windows per group (the
    SpMM occupancy trick; pair with a cluster_cols plan so skipping
    actually fires). Requires block_h % 128 == 0."""
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
    pair_w = _round_up(dk + dv, 128)
    pdt = _plane_dtype_of(plane_dtype)
    itemsize = jnp.dtype(pdt).itemsize

    qf = _interleave_pairs([q], plan.padded_nodes, pair_w)
    kvf = _interleave_pairs([k, v], nk, pair_w, dtype=pdt)
    kvg = _gather_rows(plan, kvf, H * pair_w)

    unroll = cfg.block_unroll
    num_groups = plan.total_blocks // unroll
    uk = unroll * block_w
    nsub = block_h // 128 if subtile else 0
    if subtile:
        assert block_h % 128 == 0, "subtile needs block_h % 128 == 0"

    nsp = 2 if subtile else 1
    if subtile:
        in_specs = [
            pl.BlockSpec(
                (unroll, words, block_w), lambda h, b, *_: (b, 0, 0)
            ),
            pl.BlockSpec((block_h, pair_w), lambda h, b, wob, occ: (wob[b], h)),
            pl.BlockSpec((uk, pair_w), lambda h, b, *_: (b, h)),
        ]
        out_spec0 = pl.BlockSpec(
            (block_h, pair_w), lambda h, b, wob, occ: (wob[b], h)
        )
        stats_spec = pl.BlockSpec(
            (block_h, 128), lambda h, b, wob, occ: (wob[b], h)
        )
    else:
        in_specs = [
            pl.BlockSpec(
                (unroll, words, block_w), lambda h, b, wob: (b, 0, 0)
            ),
            pl.BlockSpec((block_h, pair_w), lambda h, b, wob: (wob[b], h)),
            pl.BlockSpec((uk, pair_w), lambda h, b, wob: (b, h)),
        ]
        out_spec0 = pl.BlockSpec(
            (block_h, pair_w), lambda h, b, wob: (wob[b], h)
        )
        stats_spec = pl.BlockSpec(
            (block_h, 128), lambda h, b, wob: (wob[b], h)
        )
    out_shapes = [
        jax.ShapeDtypeStruct((plan.padded_nodes, H * pair_w), jnp.float32)
    ]
    out_specs = [out_spec0]
    if return_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((plan.padded_nodes, H * 128), jnp.float32)
        )
        out_specs.append(stats_spec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
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
        with_stats=return_stats,
        scale=float(scale),
        negative_slope=float(negative_slope),
        compute_dtype=compute_dtype,
        precision=precision,
        unroll=unroll,
        nsub=nsub,
    )
    flops = 4 * H * plan.total_blocks * block_h * block_w * pair_w
    bytes_accessed = (
        kvg.size * itemsize
        + H * plan.total_blocks * words * block_w * 4
        + plan.padded_nodes * H * 2 * pair_w * 4
    )
    scalar_args = [jnp.asarray(plan.window_of_block)[::unroll]]
    if subtile:
        scalar_args.append(_group_occupancy(plan))
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
    )(*scalar_args, jnp.asarray(plan.bitmask), qf, kvg)

    out_flat = outs[0]
    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, block_h, total_repeat_length=plan.padded_nodes
        )
        out_flat = jnp.where(nonempty[:, None], out_flat, 0.0)
    out = _split_heads(
        out_flat, plan.padded_nodes, pair_w, dk, dk + dv, nq
    ).astype(out_dtype)
    if return_stats:
        lse = outs[1].reshape(plan.padded_nodes, H, 128)[:, :, 0].T
        if plan.has_empty_windows:
            lse = jnp.where(nonempty[None, :], lse, _EMPTY_LSE)
        return out, lse
    return out


def _attn_bwd_dq_mh_kernel(
    wob_ref,
    *args,  # [occ_ref] bitmask qdo kv stats -> dq
    block_h: int,
    dk: int,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
    nsub: int = 0,
):
    if nsub:
        occ_ref, bitmask_ref, qdo_ref, kv_ref, stats_ref, dq_ref = args
    else:
        bitmask_ref, qdo_ref, kv_ref, stats_ref, dq_ref = args
        occ_ref = None
    b = pl.program_id(1)
    w = wob_ref[b]
    is_first = jnp.logical_or(b == 0, wob_ref[jnp.maximum(b - 1, 0)] != w)

    @pl.when(is_first)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    kv = kv_ref[...].astype(compute_dtype)

    def update(r0, rows, mask_f):
        qdo = qdo_ref[r0 : r0 + rows, :].astype(jnp.float32)
        mk = _zone_mask(qdo.shape, 0, dk)
        q_t = (qdo * mk).astype(compute_dtype)
        do_t = (qdo * (1.0 - mk)).astype(compute_dtype)
        # q-zone against [k || v]: q.k (dO-zone hits v with zero q lanes)
        s_m, raw = _score_tile(
            q_t, kv, mask_f,
            scale=scale, negative_slope=negative_slope,
            precision=precision,
        )
        lse = stats_ref[r0 : r0 + rows, 0:1]
        d_row = stats_ref[r0 : r0 + rows, 1:2]
        p = jnp.exp(s_m - lse) * mask_f
        # dO-zone against [k || v]: dO.v = dP
        dp = jax.lax.dot_general(
            do_t,
            kv,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        ds = p * (dp - d_row)
        if negative_slope != 1.0:
            ds = ds * jnp.where(raw > 0, 1.0, negative_slope)
        draw = (ds * scale).astype(compute_dtype)
        # draw @ [k || v]: dq in the k-zone, pollution in the v-zone
        # (sliced by the host)
        dq_ref[r0 : r0 + rows, :] += jnp.dot(
            draw, kv, preferred_element_type=jnp.float32,
            precision=precision,
        )

    if nsub:
        occ = occ_ref[b]
        for s in range(nsub):
            @pl.when((occ >> s) & 1 != 0)
            def _(s=s):
                mask_f = jnp.concatenate(
                    [
                        expand_bitmask(
                            bitmask_ref[u, s * 4 : (s + 1) * 4],
                            128,
                            jnp.float32,
                        )
                        for u in range(unroll)
                    ],
                    axis=1,
                )
                update(s * 128, 128, mask_f)
    else:
        mask_f = jnp.concatenate(
            [
                expand_bitmask(bitmask_ref[u], block_h, jnp.float32)
                for u in range(unroll)
            ],
            axis=1,
        )
        update(0, block_h, mask_f)


def _attn_bwd_dkv_mh_kernel(
    wob_ref,
    *args,  # [occ_ref] bitmask kv qdo stats -> dk dv  (transpose plan)
    block_h: int,
    dk: int,
    hi_lo_stats: bool,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
    nsub: int = 0,
):
    if nsub:
        occ_ref, bitmask_ref, kv_ref, qdo_ref, stats_ref, dk_ref, dv_ref = (
            args
        )
    else:
        bitmask_ref, kv_ref, qdo_ref, stats_ref, dk_ref, dv_ref = args
        occ_ref = None
    h = pl.program_id(0)
    b = pl.program_id(1)
    w = wob_ref[b]
    is_first = jnp.logical_or(b == 0, wob_ref[jnp.maximum(b - 1, 0)] != w)

    @pl.when(is_first)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    qdo = qdo_ref[...].astype(compute_dtype)
    stats = stats_ref[:, :128].astype(jnp.float32)
    if hi_lo_stats:
        lse_lane = _lane_select(stats, 4 * h) + _lane_select(stats, 4 * h + 1)
        d_lane = _lane_select(stats, 4 * h + 2) + _lane_select(
            stats, 4 * h + 3
        )
    else:
        lse_lane = _lane_select(stats, 2 * h)
        d_lane = _lane_select(stats, 2 * h + 1)

    def update(r0, rows, mask_f):
        kv = kv_ref[r0 : r0 + rows, :].astype(jnp.float32)
        mk = _zone_mask(kv.shape, 0, dk)
        kwin = (kv * mk).astype(compute_dtype)
        vwin = (kv * (1.0 - mk)).astype(compute_dtype)
        # raw[s, r] = k_s . q_r (k-zone against [q || dO]; dO hits 0 k)
        s_m, raw = _score_tile(
            kwin, qdo, mask_f,
            scale=scale, negative_slope=negative_slope,
            precision=precision,
        )
        p = jnp.exp(s_m - lse_lane[None, :]) * mask_f
        # p @ [q || dO]: dV in the dO-zone, pollution in the q-zone
        dv_ref[r0 : r0 + rows, :] += jnp.dot(
            p.astype(compute_dtype),
            qdo,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        # dP[s, r] = v_s . dO_r (v-zone against [q || dO])
        dp = jax.lax.dot_general(
            vwin,
            qdo,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        ds = p * (dp - d_lane[None, :])
        if negative_slope != 1.0:
            ds = ds * jnp.where(raw > 0, 1.0, negative_slope)
        draw = (ds * scale).astype(compute_dtype)
        # draw @ [q || dO]: dK in the q-zone, pollution in the dO-zone
        dk_ref[r0 : r0 + rows, :] += jnp.dot(
            draw, qdo, preferred_element_type=jnp.float32,
            precision=precision,
        )

    if nsub:
        occ = occ_ref[b]
        for s in range(nsub):
            @pl.when((occ >> s) & 1 != 0)
            def _(s=s):
                mask_f = jnp.concatenate(
                    [
                        expand_bitmask(
                            bitmask_ref[u, s * 4 : (s + 1) * 4],
                            128,
                            jnp.float32,
                        )
                        for u in range(unroll)
                    ],
                    axis=1,
                )
                update(s * 128, 128, mask_f)
    else:
        mask_f = jnp.concatenate(
            [
                expand_bitmask(bitmask_ref[u], block_h, jnp.float32)
                for u in range(unroll)
            ],
            axis=1,
        )
        update(0, block_h, mask_f)


def _attn_bwd_mh(
    plan: SpmmPlan,
    plan_t: SpmmPlan,
    q, k, v, out, lse, g,
    *,
    scale: float,
    negative_slope: float,
    compute_dtype=jnp.float32,
    precision=None,
    plane_dtype=None,
    subtile: bool = False,
    interpret: bool | None = None,
):
    """(dq, dk, dv) stacks for `spmm_attention_mh` — split backward over
    the (plan, plan^T) pair, one gather + one launch per kernel for all
    heads. The forward's pair-packed kv gather is rebuilt identically so
    XLA CSEs it with the forward inside a jitted train step."""
    H, nq, dk = q.shape
    nk = k.shape[1]
    dv = v.shape[2]
    if interpret is None:
        interpret = _interpret_default()

    cfg = plan.config
    block_h, block_w, words = cfg.block_h, cfg.block_w, cfg.words_per_col
    pair_w = _round_up(dk + dv, 128)
    pdt = _plane_dtype_of(plane_dtype)
    itemsize = jnp.dtype(pdt).itemsize
    hi_lo = pdt == jnp.bfloat16
    padded = plan.padded_nodes

    kvf = _interleave_pairs([k, v], nk, pair_w, dtype=pdt)
    kvg = _gather_rows(plan, kvf, H * pair_w)
    qdo_win = _interleave_pairs([q, g], padded, pair_w)
    # D = rowsum(dO o O) per head per dst row
    d_row = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=2
    )  # (H, nq)
    d_row = jnp.pad(d_row, ((0, 0), (0, padded - nq)))
    lse_f = lse.astype(jnp.float32)
    # kernel-A stats: per-head (padded, 128) blocks, col 0 lse, col 1 D
    stats_a = _interleave_pairs(
        [lse_f[:, :, None], d_row[:, :, None]], padded, 128
    )

    unroll = cfg.block_unroll
    num_groups = plan.total_blocks // unroll
    uk = unroll * block_w
    nsub = block_h // 128 if subtile else 0
    if subtile:
        assert block_h % 128 == 0, "subtile needs block_h % 128 == 0"
    if subtile:
        dq_in_specs = [
            pl.BlockSpec(
                (unroll, words, block_w), lambda h, b, *_: (b, 0, 0)
            ),
            pl.BlockSpec(
                (block_h, pair_w), lambda h, b, wob, occ: (wob[b], h)
            ),
            pl.BlockSpec((uk, pair_w), lambda h, b, *_: (b, h)),
            pl.BlockSpec((block_h, 128), lambda h, b, wob, occ: (wob[b], h)),
        ]
        dq_out_specs = [
            pl.BlockSpec(
                (block_h, pair_w), lambda h, b, wob, occ: (wob[b], h)
            ),
        ]
    else:
        dq_in_specs = [
            pl.BlockSpec(
                (unroll, words, block_w), lambda h, b, wob: (b, 0, 0)
            ),
            pl.BlockSpec((block_h, pair_w), lambda h, b, wob: (wob[b], h)),
            pl.BlockSpec((uk, pair_w), lambda h, b, wob: (b, h)),
            pl.BlockSpec((block_h, 128), lambda h, b, wob: (wob[b], h)),
        ]
        dq_out_specs = [
            pl.BlockSpec((block_h, pair_w), lambda h, b, wob: (wob[b], h)),
        ]
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if subtile else 1,
        grid=(H, num_groups),
        in_specs=dq_in_specs,
        out_specs=dq_out_specs,
    )
    dq_scalars = [jnp.asarray(plan.window_of_block)[::unroll]]
    if subtile:
        dq_scalars.append(_group_occupancy(plan))
    (dq_flat,) = pl.pallas_call(
        functools.partial(
            _attn_bwd_dq_mh_kernel,
            block_h=block_h,
            dk=dk,
            scale=float(scale),
            negative_slope=float(negative_slope),
            compute_dtype=compute_dtype,
            precision=precision,
            unroll=unroll,
            nsub=nsub,
        ),
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((padded, H * pair_w), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * H * plan.total_blocks * block_h * block_w * pair_w,
            bytes_accessed=kvg.size * itemsize
            + H * plan.total_blocks * words * block_w * 4
            + padded * H * (2 * pair_w + 128) * 4,
            transcendentals=H * plan.total_blocks * block_h * block_w,
        ),
        interpret=interpret,
    )(
        *dq_scalars,
        jnp.asarray(plan.bitmask),
        qdo_win,
        kvg,
        stats_a,
    )
    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, block_h, total_repeat_length=padded
        )
        dq_flat = jnp.where(nonempty[:, None], dq_flat, 0.0)
    dq = _split_heads(dq_flat, padded, pair_w, 0, dk, nq)

    # ---- dK/dV over the transpose plan ----
    cfg_t = plan_t.config
    bh_t, bw_t, words_t = cfg_t.block_h, cfg_t.block_w, cfg_t.words_per_col
    assert plan_t.source_rows == plan.num_nodes
    assert plan_t.num_nodes == plan.source_rows
    kvw = kvf
    if plan_t.padded_nodes != nk:
        kvw = jnp.pad(kvw, ((0, plan_t.padded_nodes - nk), (0, 0)))
    # gathered per-dst plane: interleaved [q_h || dO_h] pair segments
    # plus a trailing pair_w-wide stats segment whose leading 128 lanes
    # pack the per-head softmax scalars (f32 pairs, or bf16 hi/lo quads)
    if hi_lo:
        lse_hi, lse_lo = _split_hi_lo(lse_f)
        d_hi, d_lo = _split_hi_lo(d_row)
        stats_parts = [
            lse_hi[:, :, None], lse_lo[:, :, None],
            d_hi[:, :, None], d_lo[:, :, None],
        ]
        slots = 4 * H
    else:
        stats_parts = [lse_f[:, :, None], d_row[:, :, None]]
        slots = 2 * H
    assert slots <= 128, f"too many heads for the stats block ({H})"
    stats_packed = (
        jnp.concatenate(
            [p.astype(jnp.float32) for p in stats_parts], axis=2
        )
        .transpose(1, 0, 2)
        .reshape(padded, slots)
    )
    stats_packed = jnp.pad(
        stats_packed, ((0, 0), (0, pair_w - slots))
    ).astype(pdt)
    qdo_plane = _interleave_pairs([q, g], padded, pair_w, dtype=pdt)
    qdo_all = jnp.concatenate([qdo_plane, stats_packed], axis=1)
    qdo_g = _gather_rows(plan_t, qdo_all, (H + 1) * pair_w)

    unroll_t = cfg_t.block_unroll
    num_groups_t = plan_t.total_blocks // unroll_t
    uk_t = unroll_t * bw_t
    nsub_t = bh_t // 128 if subtile else 0
    if subtile:
        assert bh_t % 128 == 0, "subtile needs block_h_t % 128 == 0"
    if subtile:
        dkv_in_specs = [
            pl.BlockSpec(
                (unroll_t, words_t, bw_t), lambda h, b, *_: (b, 0, 0)
            ),
            pl.BlockSpec((bh_t, pair_w), lambda h, b, wob, occ: (wob[b], h)),
            pl.BlockSpec((uk_t, pair_w), lambda h, b, *_: (b, h)),
            # the SAME gathered array again, pinned to its stats tail
            pl.BlockSpec((uk_t, pair_w), lambda h, b, *_: (b, H)),
        ]
        dkv_out_specs = [
            pl.BlockSpec((bh_t, pair_w), lambda h, b, wob, occ: (wob[b], h)),
            pl.BlockSpec((bh_t, pair_w), lambda h, b, wob, occ: (wob[b], h)),
        ]
    else:
        dkv_in_specs = [
            pl.BlockSpec(
                (unroll_t, words_t, bw_t), lambda h, b, wob: (b, 0, 0)
            ),
            pl.BlockSpec((bh_t, pair_w), lambda h, b, wob: (wob[b], h)),
            pl.BlockSpec((uk_t, pair_w), lambda h, b, wob: (b, h)),
            # the SAME gathered array again, pinned to its stats tail
            pl.BlockSpec((uk_t, pair_w), lambda h, b, wob: (b, H)),
        ]
        dkv_out_specs = [
            pl.BlockSpec((bh_t, pair_w), lambda h, b, wob: (wob[b], h)),
            pl.BlockSpec((bh_t, pair_w), lambda h, b, wob: (wob[b], h)),
        ]
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if subtile else 1,
        grid=(H, num_groups_t),
        in_specs=dkv_in_specs,
        out_specs=dkv_out_specs,
    )
    dkv_scalars = [jnp.asarray(plan_t.window_of_block)[::unroll_t]]
    if subtile:
        dkv_scalars.append(_group_occupancy(plan_t))
    dk_flat, dv_flat = pl.pallas_call(
        functools.partial(
            _attn_bwd_dkv_mh_kernel,
            block_h=bh_t,
            dk=dk,
            hi_lo_stats=hi_lo,
            scale=float(scale),
            negative_slope=float(negative_slope),
            compute_dtype=compute_dtype,
            precision=precision,
            unroll=unroll_t,
            nsub=nsub_t,
        ),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (plan_t.padded_nodes, H * pair_w), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (plan_t.padded_nodes, H * pair_w), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * H * plan_t.total_blocks * bh_t * bw_t * pair_w,
            bytes_accessed=qdo_g.size * itemsize
            + H * plan_t.total_blocks * words_t * bw_t * 4
            + plan_t.padded_nodes * 3 * H * pair_w * 4,
            transcendentals=H * plan_t.total_blocks * bh_t * bw_t,
        ),
        interpret=interpret,
    )(
        *dkv_scalars,
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
    dk_out = _split_heads(dk_flat, plan_t.padded_nodes, pair_w, 0, dk, nk)
    dv_out = _split_heads(
        dv_flat, plan_t.padded_nodes, pair_w, dk, dk + dv, nk
    )
    return (
        dq.astype(q.dtype), dk_out.astype(k.dtype), dv_out.astype(v.dtype)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _spmm_attention_mh_ad(
    plan, plan_t, q, k, v, scale, negative_slope, compute_dtype, precision,
    plane_dtype, subtile,
):
    return spmm_attention_mh(
        plan, q, k, v,
        scale=scale, negative_slope=negative_slope,
        compute_dtype=compute_dtype, precision=precision,
        plane_dtype=plane_dtype, subtile=subtile,
    )


def _mh_ad_fwd(plan, plan_t, q, k, v, scale, negative_slope, compute_dtype,
               precision, plane_dtype, subtile):
    if scale is None:
        scale = 1.0 / float(q.shape[2]) ** 0.5
    out, lse = spmm_attention_mh(
        plan, q, k, v,
        scale=scale, negative_slope=negative_slope,
        compute_dtype=compute_dtype, precision=precision,
        plane_dtype=plane_dtype, subtile=subtile,
        return_stats=True,
    )
    return out, (plan, plan_t, q, k, v, out, lse)


def _mh_ad_bwd(scale, negative_slope, compute_dtype, precision, plane_dtype,
               subtile, res, g):
    plan, plan_t, q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / float(q.shape[2]) ** 0.5
    dq, dk, dv = _attn_bwd_mh(
        plan, plan_t, q, k, v, out, lse, g,
        scale=scale, negative_slope=negative_slope,
        compute_dtype=compute_dtype, precision=precision,
        plane_dtype=plane_dtype, subtile=subtile,
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
    plane_dtype=None,
    subtile: bool = False,
):
    """Differentiable all-head fused attention (gradients for q/k/v
    stacks). Requires the transpose plan: the batched backward is the
    scatter-free split form only (per-lane fallback stays per-head —
    use `spmm_attention_ad` without plan_t for that).

    plane_dtype=jnp.bfloat16 halves gathered-plane traffic in both
    directions; softmax statistics keep f32 accuracy via hi/lo bf16
    splitting. Accuracy class matches the default (bf16-rounding) MXU
    matmul precision.

    subtile=True (pair with cluster_cols plans) skips fully-masked
    128-row sub-windows in all three kernels — the SpMM occupancy trick
    applied to the online-softmax walk."""
    if plan_t is None:
        raise ValueError(
            "spmm_attention_mh_ad requires plan_t (csr_preprocess of "
            "A^T); for the scatter fallback call spmm_attention_ad per "
            "head"
        )
    return _spmm_attention_mh_ad(
        plan, plan_t, q, k, v, scale, negative_slope, compute_dtype,
        precision, plane_dtype, subtile,
    )
