"""Fused graph attention (flash-SpMM) on the binned block-CSR plan.

out[r] = sum_l  softmax_{l in N(r)}( act(scale * q_r . k_l) ) * v_l

computed in ONE Pallas kernel over the *dedup'd* `SpmmPlan` — the
attention analogue of `spmm_pallas`, and the op the unfused pipeline
(ops/ell.py `sddmm_ell_ad` -> models segment softmax -> `spmm_ell_ad`)
approximates in three passes with O(nnz) intermediates.

Why this works on the binned plan when weighted SpMM could not: an
arbitrary per-edge value plane over the dedup'd format costs
O(lanes x block_h) expanded-slot memory (the round-2 scaling failure
that motivated the ELL format). Dot-product attention scores, however,
are a FUNCTION of the edge's endpoints — s[r, l] = q_r . k_l is exactly
the (block_h, K) tile one MXU pass produces from the window's q rows
and the plan's gathered k lanes. So the kernel materializes each block's
score tile in VMEM, masks it with the same row-packed bitmask expansion
as the binary kernel (ops/bitmask.py), and never stores a per-edge
value anywhere. The plan's gather dedup (each distinct neighbor fetched
once per window — 5.7x fewer rows than per-edge ELL on rmat-17) now
benefits attention, which the ELL formulation structurally cannot.

Softmax across a window's ragged block list uses the online
(flash-attention) recurrence, riding the same output-revisiting walk as
`spmm_pallas`: consecutive grid steps of one window rescale the VMEM
accumulator by exp(m_old - m_new) and the final step divides by the
running denominator. k and v are fetched with ONE combined gather of
(k || v) super-rows when the feature chunking allows it — the v5e
gather is per-ROW-issue-bound below ~1 KB rows (docs/DESIGN.md "gather
law"), so fusing the two gathers is close to free bandwidth.

Reference role: none — the reference's kernels serve binary GCN/SAGE
aggregation only (bmat_kernels.cuh:16-20); this is the framework's own
transformer-class extension (GAT / graph-transformer attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.plan import SpmmPlan
from .bitmask import expand_bitmask
from .pallas_spmm import (
    _gather_rows,
    _interpret_default,
    _pick_block_d,
    _round_up,
)

_NEG = -1e30  # finite -inf stand-in: exp(_NEG - m) underflows to 0
_EMPTY_LSE = 1e30  # lse sentinel for rows with no edges: exp(s - 1e30) = 0


def _score_tile(q, kg, mask_f, *, scale, negative_slope, precision):
    """(block_h, UK) masked activated score tile + the raw dot."""
    raw = jax.lax.dot_general(
        q,
        kg,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    s = raw * scale
    if negative_slope != 1.0:
        s = jnp.where(s > 0, s, s * negative_slope)
    s_m = jnp.where(mask_f > 0, s, _NEG)
    return s_m, raw


def _attn_fwd_kernel(
    wob_ref,  # scalar-prefetch int32 (num_groups,)
    bitmask_ref,  # (unroll, words, K) uint32
    q_ref,  # (block_h, dk_pad) f32 — window's own rows, no gather
    kv_ref,  # combined: (UK, dk_pad + dv_block); split: kg (UK, dk_pad)
    *rest,  # [vg_ref (UK, dv_block)] out_ref [stats_ref] m_scr l_scr
    block_h: int,
    dk_pad: int,
    combined: bool,
    with_stats: bool,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
):
    if combined:
        vg_ref = None
        rest_i = 0
    else:
        vg_ref, rest_i = rest[0], 1
    out_ref = rest[rest_i]
    stats_ref = rest[rest_i + 1] if with_stats else None
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
    )  # (block_h, UK)
    q = q_ref[...].astype(compute_dtype)
    if combined:
        kg = kv_ref[:, :dk_pad].astype(compute_dtype)
        vg = kv_ref[:, dk_pad:]
    else:
        kg = kv_ref[...].astype(compute_dtype)
        vg = vg_ref[...]

    s_m, _ = _score_tile(
        q, kg, mask_f,
        scale=scale, negative_slope=negative_slope, precision=precision,
    )

    m_old = m_scr[:, 0:1]
    m_new = jnp.maximum(m_old, jnp.max(s_m, axis=1, keepdims=True))
    corr = jnp.exp(m_old - m_new)
    # the explicit * mask_f kills the all-masked-group case, where
    # s_m == m_new == _NEG would make exp() come out 1, not 0
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


def spmm_attention(
    plan: SpmmPlan,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    negative_slope: float = 1.0,
    block_d: int | None = None,
    compute_dtype=jnp.float32,
    precision=None,
    return_stats: bool = False,
    interpret: bool | None = None,
    out_dtype=None,
) -> jax.Array:
    """Fused masked-softmax attention aggregation over the plan's edges.

    q: (num_nodes, dk) destination-row queries; k, v: (source_rows, dk) /
    (source_rows, dv) source-row keys/values. Per destination row r,
    logits over its in-neighbors are act(scale * q_r . k_v) with
    act = leaky_relu(negative_slope) (slope 1.0 = identity), normalized
    with an exact segment softmax, then aggregate v. Duplicate CSR edges
    collapse (the binary plan stores presence bits).

    return_stats=True additionally returns the per-row softmax
    log-sum-exp (padded_nodes,) — the backward residual; forces a single
    feature chunk (dv_pad <= block_d).
    """
    if getattr(plan, "values", None) is not None:
        raise ValueError(
            "attention computes its edge values in-kernel from q . k; "
            "a value plane on the plan would be silently ignored"
        )
    nq, dk = q.shape
    nk, dk2 = k.shape
    nv, dv = v.shape
    assert dk == dk2, (dk, dk2)
    assert nk == nv == plan.source_rows, (nk, nv, plan.source_rows)
    assert nq == plan.num_nodes, (nq, plan.num_nodes)
    if scale is None:
        scale = 1.0 / float(dk) ** 0.5
    if out_dtype is None:
        out_dtype = v.dtype
    if interpret is None:
        interpret = _interpret_default()
    if plan.total_blocks == 0:
        out = jnp.zeros((nq, dv), out_dtype)
        if return_stats:
            return out, jnp.full((plan.padded_nodes,), _EMPTY_LSE, jnp.float32)
        return out

    cfg = plan.config
    block_h, block_w, words = cfg.block_h, cfg.block_w, cfg.words_per_col
    assert block_h % 32 == 0, "device kernel requires block_h % 32 == 0"
    assert block_w % 128 == 0, "device kernel requires block_w % 128 == 0"

    dk_pad = _round_up(dk, 128)
    dv_pad = _round_up(dv, 128)
    if block_d is None:
        block_d = _pick_block_d(dv_pad, block_h, 2 * 2**20)
    if return_stats:
        block_d = dv_pad  # stats are per-window scalars: one chunk only
    dv_pad = _round_up(dv_pad, block_d)
    num_chunks = dv_pad // block_d

    qf = q.astype(jnp.float32)
    if qf.shape != (plan.padded_nodes, dk_pad):
        qf = jnp.pad(
            qf, ((0, plan.padded_nodes - nq), (0, dk_pad - dk))
        )
    kf = k.astype(jnp.float32)
    if dk_pad != dk:
        kf = jnp.pad(kf, ((0, 0), (0, dk_pad - dk)))
    vf = v.astype(jnp.float32)
    if dv_pad != dv:
        vf = jnp.pad(vf, ((0, 0), (0, dv_pad - dv)))

    combined = num_chunks == 1
    if combined:
        # one gather of (k || v) super-rows: the gather is per-row-cost
        # bound at these widths, so this is ~half the gather time of two
        # separate fetches of the same rows
        kvg = _gather_rows(
            plan, jnp.concatenate([kf, vf], axis=1), dk_pad + dv_pad
        )
        gathered = [kvg]
        kv_width = dk_pad + dv_pad
    else:
        kg = _gather_rows(plan, kf, dk_pad)
        vg = _gather_rows(plan, vf, dv_pad)
        gathered = [kg, vg]
        kv_width = dk_pad

    unroll = cfg.block_unroll
    assert plan.total_blocks % unroll == 0, (plan.total_blocks, unroll)
    num_groups = plan.total_blocks // unroll

    in_specs = [
        pl.BlockSpec((unroll, words, block_w), lambda c, b, wob: (b, 0, 0)),
        pl.BlockSpec((block_h, dk_pad), lambda c, b, wob: (wob[b], 0)),
        pl.BlockSpec((unroll * block_w, kv_width), lambda c, b, wob: (b, 0)),
    ]
    if not combined:
        in_specs.append(
            pl.BlockSpec(
                (unroll * block_w, block_d), lambda c, b, wob: (b, c)
            )
        )
    out_shapes = [
        jax.ShapeDtypeStruct((plan.padded_nodes, dv_pad), jnp.float32)
    ]
    out_specs = [
        pl.BlockSpec((block_h, block_d), lambda c, b, wob: (wob[b], c))
    ]
    if return_stats:
        out_shapes.append(
            jax.ShapeDtypeStruct((plan.padded_nodes, 128), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((block_h, 128), lambda c, b, wob: (wob[b], 0))
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks, num_groups),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_h, 128), jnp.float32),
            pltpu.VMEM((block_h, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _attn_fwd_kernel,
        block_h=block_h,
        dk_pad=dk_pad,
        combined=combined,
        with_stats=return_stats,
        scale=float(scale),
        negative_slope=float(negative_slope),
        compute_dtype=compute_dtype,
        precision=precision,
        unroll=unroll,
    )
    flops = 2 * plan.total_blocks * block_h * block_w * (dk_pad + dv_pad)
    bytes_accessed = (
        sum(g.size * g.dtype.itemsize for g in gathered)
        + plan.total_blocks * words * block_w * 4
        + plan.padded_nodes * (dk_pad + dv_pad) * 4
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
            transcendentals=plan.total_blocks * block_h * block_w,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.window_of_block)[::unroll], jnp.asarray(plan.bitmask),
      qf, *gathered)

    out = outs[0]
    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, block_h, total_repeat_length=plan.padded_nodes
        )
        out = jnp.where(nonempty[:, None], out, 0.0)
    result = out[:nq, :dv].astype(out_dtype)
    if return_stats:
        lse = outs[1][:, 0]
        if plan.has_empty_windows:
            lse = jnp.where(nonempty, lse, _EMPTY_LSE)
        return result, lse
    return result


def _attn_bwd_kernel(
    wob_ref,  # scalar-prefetch int32 (num_groups,)
    bitmask_ref,  # (unroll, words, K) uint32
    q_ref,  # (block_h, dk_pad)
    kvg_ref,  # (UK, dk_pad + dv_pad) combined gathered (k || v)
    do_ref,  # (block_h, dv_pad) upstream grad
    o_ref,  # (block_h, dv_pad) forward output (for D = rowsum(dO o O))
    lse_ref,  # (block_h, 128) per-row log-sum-exp (broadcast lanes)
    dq_ref,  # out (block_h, dk_pad), revisited per window
    dkg_ref,  # out (UK, dk_pad) per-lane key grads
    dvg_ref,  # out (UK, dv_pad) per-lane value grads
    *,
    block_h: int,
    dk_pad: int,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
):
    b = pl.program_id(0)
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
    kg = kvg_ref[:, :dk_pad].astype(compute_dtype)
    vg = kvg_ref[:, dk_pad:]
    do = do_ref[...]
    o = o_ref[...]

    s_m, raw = _score_tile(
        q, kg, mask_f,
        scale=scale, negative_slope=negative_slope, precision=precision,
    )
    lse = lse_ref[:, 0:1]
    p = jnp.exp(s_m - lse) * mask_f  # normalized probabilities

    # dV_lane = P^T @ dO
    dvg_ref[...] = jax.lax.dot_general(
        p.astype(compute_dtype),
        do.astype(compute_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    # dS = P o (dP - D);  dP = dO @ V^T;  D = rowsum(dO o O)
    dp = jax.lax.dot_general(
        do.astype(compute_dtype),
        vg.astype(compute_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    d_row = jnp.sum(do * o, axis=1, keepdims=True)
    ds = p * (dp - d_row)
    # through act: d(raw) = dS * scale * leaky_slope(raw * scale)
    if negative_slope != 1.0:
        ds = ds * jnp.where(raw > 0, 1.0, negative_slope)
    draw = (ds * scale).astype(compute_dtype)

    # dQ_row += draw @ K_lanes
    dq_ref[...] += jnp.dot(
        draw, kg, preferred_element_type=jnp.float32, precision=precision
    )
    # dK_lane = draw^T @ Q
    dkg_ref[...] = jax.lax.dot_general(
        draw,
        q,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _attn_bwd_dq_kernel(
    wob_ref,  # scalar-prefetch int32 (num_groups,)
    bitmask_ref,  # (unroll, words, K) uint32
    q_ref,  # (block_h, dk_pad)
    kvg_ref,  # (UK, dk_pad + dv_pad) combined gathered (k || v)
    do_ref,  # (block_h, dv_pad) upstream grad
    stats_ref,  # (block_h, 128): col 0 = lse, col 1 = D = rowsum(dO o O)
    dq_ref,  # out (block_h, dk_pad), revisited per window
    *,
    block_h: int,
    dk_pad: int,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
):
    """dQ half of the split flash backward: same window walk as the
    forward, no per-lane outputs (dK/dV come from the transpose-plan
    kernel below)."""
    b = pl.program_id(0)
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
    kg = kvg_ref[:, :dk_pad].astype(compute_dtype)
    vg = kvg_ref[:, dk_pad:]
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


def _attn_bwd_dkv_kernel(
    wob_ref,  # scalar-prefetch int32 (num_groups_T,) — TRANSPOSE plan
    bitmask_ref,  # (unroll_t, words_t, K) uint32 — bit (s, r): edge r->s
    kv_ref,  # (block_h_t, dk_pad + dv_pad) window's OWN k||v rows
    qds_ref,  # (UK, dk_pad + dv_pad + 128) gathered dst lanes:
    #           q_r || dO_r || stats_r (col 0 lse, col 1 D)
    dk_ref,  # out (block_h_t, dk_pad), revisited per window
    dv_ref,  # out (block_h_t, dv_pad), revisited per window
    *,
    block_h: int,
    dk_pad: int,
    dv_pad: int,
    scale: float,
    negative_slope: float,
    compute_dtype,
    precision,
    unroll: int,
):
    """dK/dV half over the transpose plan: each window owns block_h
    SOURCE rows; lanes are the destination rows that attend to them.
    Rebuilding p[s, r] = exp(act(scale k_s . q_r) - lse_r) per tile makes
    dK/dV a pair of MXU products accumulated straight into the window's
    own output rows — the scatter the per-lane formulation needed
    (segment_sum over 2.35 M lanes = 353 ms at rmat-17 h128) never
    exists."""
    b = pl.program_id(0)
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
    )  # (block_h_t, UK)
    kwin = kv_ref[:, :dk_pad].astype(compute_dtype)
    vwin = kv_ref[:, dk_pad:]
    qg = qds_ref[:, :dk_pad].astype(compute_dtype)
    dog = qds_ref[:, dk_pad : dk_pad + dv_pad]
    lse_lane = qds_ref[:, dk_pad + dv_pad]  # (UK,)
    d_lane = qds_ref[:, dk_pad + dv_pad + 1]  # (UK,)

    # raw[s, r] = k_s . q_r — the same raw value the forward computed as
    # q_r . k_s, so act/slope gating is identical
    s_m, raw = _score_tile(
        kwin, qg, mask_f,
        scale=scale, negative_slope=negative_slope, precision=precision,
    )
    p = jnp.exp(s_m - lse_lane[None, :]) * mask_f

    # dV[s] += sum_r p[s, r] dO_r
    dv_ref[...] += jnp.dot(
        p.astype(compute_dtype),
        dog.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    # dS[s, r] = p (dP - D_r);  dP[s, r] = v_s . dO_r
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
    # dK[s] += sum_r draw[s, r] q_r
    dk_ref[...] += jnp.dot(
        draw, qg, preferred_element_type=jnp.float32, precision=precision
    )


def _attn_bwd_split(
    plan: SpmmPlan,
    plan_t: SpmmPlan,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse: jax.Array,
    g: jax.Array,
    *,
    scale: float,
    negative_slope: float,
    compute_dtype=jnp.float32,
    precision=None,
    interpret: bool | None = None,
):
    """Flash backward split over the (plan, plan^T) pair.

    dQ rides the forward plan's window walk; dK/dV ride the transpose
    plan so every gradient row is OWNED by exactly one window and
    accumulates via output revisiting — no per-lane gradient planes and
    no O(lanes) segment-sum scatter (the cost that dominated the
    per-lane formulation: 353 ms of 478 ms at rmat-17 h128 d64)."""
    nq, dk = q.shape
    nk, _ = k.shape
    dv = v.shape[1]
    if interpret is None:
        interpret = _interpret_default()

    cfg = plan.config
    block_h, block_w, words = cfg.block_h, cfg.block_w, cfg.words_per_col
    dk_pad = _round_up(dk, 128)
    dv_pad = _round_up(dv, 128)

    qf = jnp.pad(
        q.astype(jnp.float32),
        ((0, plan.padded_nodes - nq), (0, dk_pad - dk)),
    )
    kf = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, dk_pad - dk)))
    vf = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, dv_pad - dv)))
    do = jnp.pad(
        g.astype(jnp.float32),
        ((0, plan.padded_nodes - nq), (0, dv_pad - dv)),
    )
    of = jnp.pad(
        out.astype(jnp.float32),
        ((0, plan.padded_nodes - nq), (0, dv_pad - dv)),
    )
    # per-dst-row scalars the probability rebuild needs: D = rowsum(dO o O)
    # next to the forward lse, packed into one 128-lane block (col 0 =
    # lse, col 1 = D) so both kernels read them as one tile
    d_row = jnp.sum(do * of, axis=1)
    stats = jnp.concatenate(
        [
            lse.astype(jnp.float32)[:, None],
            d_row[:, None],
            jnp.zeros((plan.padded_nodes, 126), jnp.float32),
        ],
        axis=1,
    )

    # ---- dQ over the forward plan ----
    kvg = _gather_rows(
        plan, jnp.concatenate([kf, vf], axis=1), dk_pad + dv_pad
    )
    unroll = cfg.block_unroll
    num_groups = plan.total_blocks // unroll
    uk = unroll * block_w
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_groups,),
        in_specs=[
            pl.BlockSpec((unroll, words, block_w), lambda b, wob: (b, 0, 0)),
            pl.BlockSpec((block_h, dk_pad), lambda b, wob: (wob[b], 0)),
            pl.BlockSpec((uk, dk_pad + dv_pad), lambda b, wob: (b, 0)),
            pl.BlockSpec((block_h, dv_pad), lambda b, wob: (wob[b], 0)),
            pl.BlockSpec((block_h, 128), lambda b, wob: (wob[b], 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_h, dk_pad), lambda b, wob: (wob[b], 0)),
        ],
    )
    dq_kernel = functools.partial(
        _attn_bwd_dq_kernel,
        block_h=block_h,
        dk_pad=dk_pad,
        scale=float(scale),
        negative_slope=float(negative_slope),
        compute_dtype=compute_dtype,
        precision=precision,
        unroll=unroll,
    )
    (dq_pad,) = pl.pallas_call(
        dq_kernel,
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((plan.padded_nodes, dk_pad), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * plan.total_blocks * block_h * block_w
            * (dk_pad + dv_pad),
            bytes_accessed=kvg.size * 4
            + plan.total_blocks * words * block_w * 4
            + plan.padded_nodes * (2 * dk_pad + dv_pad + 128) * 4,
            transcendentals=plan.total_blocks * block_h * block_w,
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan.window_of_block)[::unroll],
        jnp.asarray(plan.bitmask),
        qf,
        kvg,
        do,
        stats,
    )
    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, block_h, total_repeat_length=plan.padded_nodes
        )
        dq_pad = jnp.where(nonempty[:, None], dq_pad, 0.0)

    # ---- dK/dV over the transpose plan ----
    cfg_t = plan_t.config
    bh_t, bw_t, words_t = cfg_t.block_h, cfg_t.block_w, cfg_t.words_per_col
    assert plan_t.source_rows == plan.num_nodes, (
        "plan_t must be the transpose of plan (its columns are plan's rows)"
    )
    assert plan_t.num_nodes == plan.source_rows, (
        plan_t.num_nodes, plan.source_rows,
    )
    kvw = jnp.concatenate([kf, vf], axis=1)
    if plan_t.padded_nodes != nk:
        kvw = jnp.pad(kvw, ((0, plan_t.padded_nodes - nk), (0, 0)))
    # one gathered plane per dst lane: q || dO || (lse, D)
    qds = jnp.concatenate([qf, do, stats], axis=1)
    qds_g = _gather_rows(plan_t, qds, dk_pad + dv_pad + 128)
    unroll_t = cfg_t.block_unroll
    num_groups_t = plan_t.total_blocks // unroll_t
    uk_t = unroll_t * bw_t
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_groups_t,),
        in_specs=[
            pl.BlockSpec(
                (unroll_t, words_t, bw_t), lambda b, wob: (b, 0, 0)
            ),
            pl.BlockSpec((bh_t, dk_pad + dv_pad), lambda b, wob: (wob[b], 0)),
            pl.BlockSpec((uk_t, dk_pad + dv_pad + 128), lambda b, wob: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bh_t, dk_pad), lambda b, wob: (wob[b], 0)),
            pl.BlockSpec((bh_t, dv_pad), lambda b, wob: (wob[b], 0)),
        ],
    )
    dkv_kernel = functools.partial(
        _attn_bwd_dkv_kernel,
        block_h=bh_t,
        dk_pad=dk_pad,
        dv_pad=dv_pad,
        scale=float(scale),
        negative_slope=float(negative_slope),
        compute_dtype=compute_dtype,
        precision=precision,
        unroll=unroll_t,
    )
    dk_pad_arr, dv_pad_arr = pl.pallas_call(
        dkv_kernel,
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((plan_t.padded_nodes, dk_pad), jnp.float32),
            jax.ShapeDtypeStruct((plan_t.padded_nodes, dv_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * plan_t.total_blocks * bh_t * bw_t * (dk_pad + dv_pad),
            bytes_accessed=qds_g.size * 4
            + plan_t.total_blocks * words_t * bw_t * 4
            + plan_t.padded_nodes * 2 * (dk_pad + dv_pad) * 4,
            transcendentals=plan_t.total_blocks * bh_t * bw_t,
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan_t.window_of_block)[::unroll_t],
        jnp.asarray(plan_t.bitmask),
        kvw,
        qds_g,
    )
    if plan_t.has_empty_windows:
        bpw_t = jnp.diff(jnp.asarray(plan_t.block_ptr))
        nonempty_t = jnp.repeat(
            bpw_t > 0, bh_t, total_repeat_length=plan_t.padded_nodes
        )
        dk_pad_arr = jnp.where(nonempty_t[:, None], dk_pad_arr, 0.0)
        dv_pad_arr = jnp.where(nonempty_t[:, None], dv_pad_arr, 0.0)

    return (
        dq_pad[:nq, :dk].astype(q.dtype),
        dk_pad_arr[:nk, :dk].astype(k.dtype),
        dv_pad_arr[:nk, :dv].astype(v.dtype),
    )


def _attn_bwd(
    plan: SpmmPlan,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse: jax.Array,
    g: jax.Array,
    *,
    scale: float,
    negative_slope: float,
    compute_dtype=jnp.float32,
    precision=None,
    interpret: bool | None = None,
):
    """Returns (dq, dk, dv) for `spmm_attention` via score recompute.

    Per group the kernel rebuilds the masked probability tile from the
    saved per-row log-sum-exp (the flash-attention backward identity
    dS = P o (dP - rowsum(dO o O))), emits per-lane dK/dV planes, and
    accumulates dQ through the same output-revisiting window walk as the
    forward. Lane gradients scatter back to source rows with one
    segment-sum over the plan's gather map (duplicated hind entries —
    one per referencing window — sum, as they must).
    """
    nq, dk = q.shape
    nk, _ = k.shape
    dv = v.shape[1]
    if interpret is None:
        interpret = _interpret_default()

    cfg = plan.config
    block_h, block_w, words = cfg.block_h, cfg.block_w, cfg.words_per_col
    dk_pad = _round_up(dk, 128)
    dv_pad = _round_up(dv, 128)

    qf = jnp.pad(
        q.astype(jnp.float32),
        ((0, plan.padded_nodes - nq), (0, dk_pad - dk)),
    )
    kf = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, dk_pad - dk)))
    vf = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, dv_pad - dv)))
    kvg = _gather_rows(
        plan, jnp.concatenate([kf, vf], axis=1), dk_pad + dv_pad
    )
    do = jnp.pad(
        g.astype(jnp.float32),
        ((0, plan.padded_nodes - nq), (0, dv_pad - dv)),
    )
    of = jnp.pad(
        out.astype(jnp.float32),
        ((0, plan.padded_nodes - nq), (0, dv_pad - dv)),
    )
    lse_b = jnp.broadcast_to(
        lse.astype(jnp.float32)[:, None], (plan.padded_nodes, 128)
    )

    unroll = cfg.block_unroll
    num_groups = plan.total_blocks // unroll
    uk = unroll * block_w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_groups,),
        in_specs=[
            pl.BlockSpec((unroll, words, block_w), lambda b, wob: (b, 0, 0)),
            pl.BlockSpec((block_h, dk_pad), lambda b, wob: (wob[b], 0)),
            pl.BlockSpec((uk, dk_pad + dv_pad), lambda b, wob: (b, 0)),
            pl.BlockSpec((block_h, dv_pad), lambda b, wob: (wob[b], 0)),
            pl.BlockSpec((block_h, dv_pad), lambda b, wob: (wob[b], 0)),
            pl.BlockSpec((block_h, 128), lambda b, wob: (wob[b], 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_h, dk_pad), lambda b, wob: (wob[b], 0)),
            pl.BlockSpec((uk, dk_pad), lambda b, wob: (b, 0)),
            pl.BlockSpec((uk, dv_pad), lambda b, wob: (b, 0)),
        ],
    )
    kernel = functools.partial(
        _attn_bwd_kernel,
        block_h=block_h,
        dk_pad=dk_pad,
        scale=float(scale),
        negative_slope=float(negative_slope),
        compute_dtype=compute_dtype,
        precision=precision,
        unroll=unroll,
    )
    flops = 6 * plan.total_blocks * block_h * block_w * (dk_pad + dv_pad)
    bytes_accessed = (
        kvg.size * 4
        + plan.total_blocks * words * block_w * 4
        + plan.padded_nodes * (dk_pad + 2 * dv_pad) * 4
        + plan.total_blocks * block_w * (dk_pad + dv_pad) * 4
    )
    dq_pad, dkg, dvg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((plan.padded_nodes, dk_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_groups * uk, dk_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_groups * uk, dv_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bytes_accessed,
            transcendentals=plan.total_blocks * block_h * block_w,
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan.window_of_block)[::unroll],
        jnp.asarray(plan.bitmask),
        qf,
        kvg,
        do,
        of,
        lse_b,
    )

    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, block_h, total_repeat_length=plan.padded_nodes
        )
        dq_pad = jnp.where(nonempty[:, None], dq_pad, 0.0)

    # scatter the per-lane planes back to source rows: every window that
    # references row s contributes its lane gradient (masked lanes and
    # unroll padding emit exact zeros from the kernel)
    hind_flat = jnp.asarray(plan.hind).reshape(-1)
    dk_full = jax.ops.segment_sum(dkg, hind_flat, num_segments=nk)
    dv_full = jax.ops.segment_sum(dvg, hind_flat, num_segments=nk)
    return (
        dq_pad[:nq, :dk].astype(q.dtype),
        dk_full[:, :dk].astype(k.dtype),
        dv_full[:, :dv].astype(v.dtype),
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _spmm_attention_ad(
    plan: SpmmPlan, plan_t, q, k, v, scale, negative_slope, compute_dtype,
    precision,
):
    return spmm_attention(
        plan, q, k, v,
        scale=scale, negative_slope=negative_slope,
        compute_dtype=compute_dtype, precision=precision,
    )


def _attn_ad_fwd(plan, plan_t, q, k, v, scale, negative_slope,
                 compute_dtype, precision):
    if scale is None:
        scale = 1.0 / float(q.shape[1]) ** 0.5
    out, lse = spmm_attention(
        plan, q, k, v,
        scale=scale, negative_slope=negative_slope,
        compute_dtype=compute_dtype, precision=precision,
        return_stats=True,
    )
    return out, (plan, plan_t, q, k, v, out, lse)


def _attn_ad_bwd(scale, negative_slope, compute_dtype, precision, res, g):
    plan, plan_t, q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / float(q.shape[1]) ** 0.5
    if plan_t is not None:
        dq, dk, dv = _attn_bwd_split(
            plan, plan_t, q, k, v, out, lse, g,
            scale=scale, negative_slope=negative_slope,
            compute_dtype=compute_dtype, precision=precision,
        )
    else:
        dq, dk, dv = _attn_bwd(
            plan, q, k, v, out, lse, g,
            scale=scale, negative_slope=negative_slope,
            compute_dtype=compute_dtype, precision=precision,
        )
    from .autodiff import _zero_cotangent

    dplan = jax.tree.map(_zero_cotangent, plan)
    dplan_t = jax.tree.map(_zero_cotangent, plan_t)
    return (dplan, dplan_t, dq, dk, dv)


_spmm_attention_ad.defvjp(_attn_ad_fwd, _attn_ad_bwd)


def spmm_attention_ad(
    plan: SpmmPlan,
    q,
    k,
    v,
    *,
    plan_t: SpmmPlan | None = None,
    scale: float | None = None,
    negative_slope: float = 1.0,
    compute_dtype=jnp.float32,
    precision=None,
):
    """Differentiable fused attention aggregation (gradients for q/k/v).

    Exactly `spmm_attention(plan, q, k, v, ...)` with a flash-style
    recompute backward: residuals are (out, lse) — O(n) rows — never a
    per-edge attention vector.

    plan_t: the transpose plan (``csr_preprocess`` of A^T, e.g.
    ``GraphData.plan_t``). When given, dK/dV come from a kernel walking
    the TRANSPOSE plan's windows (each source row owned by one window,
    output-revisiting accumulation) instead of per-lane gradient planes
    + an O(lanes) segment-sum scatter — the scatter was 353 ms of the
    478 ms rmat-17 d64 GAT step. Pass it whenever the model already has
    the reversed adjacency; omit for the self-contained fallback.

    See `models.gat_flash` for the model wiring and
    `tests/test_attention.py` for dense-oracle grad parity. (Keyword
    wrapper: `jax.custom_vjp` requires positional args.)
    """
    return _spmm_attention_ad(
        plan, plan_t, q, k, v, scale, negative_slope, compute_dtype,
        precision,
    )
