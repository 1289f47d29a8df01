"""Fused-gather Pallas SpMM kernel (the "Voltrix part").

TPU-native redesign of the reference's producer/consumer persistent
kernel `spmm_mma161616_spa_swizzle_d` (spmm_kernels.cuh:1458-1727):

- Grid = (feature chunks, row windows) — the reference's persistent-CTA
  wave over the same 2D space (DynamicWaveScheduler,
  spmm_kernels.cuh:498-540) with scheduling left to XLA/Mosaic.
- Each window walks its blocks (`block_ptr[w]..block_ptr[w+1]`, the
  reference's Pointer1 ragged walk) in a software pipeline that runs
  *across* window boundaries: while block group g feeds the MXU, groups
  g+1..g+slots-1 have bitmask + gathered X segments in flight, and the
  next group's gather descriptors are already being fetched — the TPU
  translation of the producer-warp / mbarrier multi-buffering
  (spmm_kernels.cuh:1128-1194, 1519-1576; NUM_BUFFERS in {2,4} at
  :2017,2077 maps to `slots` here x the group width U). Buffer parity
  follows the *global* group id so the pipeline never drains at a
  window transition.
- X rows arrive in `gather_segment`-aligned runs, one
  `pltpu.make_async_copy` per run (the TMA bulk-copy translation,
  spmm_kernels.cuh:1563-1570). Descriptors are PACKED: one int32 per
  seg-run (K/seg per block) instead of per lane — at seg=128 that is
  128x fewer descriptor bytes on the wire and in SMEM.
- Only `block_ptr` (one int per window) is scalar-prefetched, so SMEM
  (1 MB) never bounds the matrix size, and empty windows write zeros
  (no uninitialized output tiles).

Requires a plan with `gather_segment >= 8`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.plan import SpmmPlan
from .bitmask import expand_bitmask
from .pallas_spmm import _interpret_default, _pick_block_d, _round_up


def _fused_kernel(
    # scalar prefetch
    bp_ref,  # int32 (num_windows + 1,) block prefix per window
    # inputs (all manual-DMA)
    bitmask_ref,  # HBM (total_blocks, words, K) uint32
    hseg_ref,  # HBM (total_groups, U * nseg) int32 packed run starts
    x_ref,  # HBM (n_pad, d_pad) compute dtype
    # outputs
    out_ref,  # VMEM (block_h, block_d) float32
    # scratch (group granularity: U = block_unroll blocks per step)
    desc_buf,  # SMEM (slots, U * nseg) int32
    bm_buf,  # VMEM (slots, U, words, K) uint32
    xg_buf,  # VMEM (slots, U * K, block_d) compute dtype
    desc_sems,  # DMA sems (slots,)
    bm_sems,  # DMA sems (slots,)
    xg_sems,  # DMA sems (slots,)
    *,
    block_h: int,
    block_w: int,
    seg: int,
    block_d: int,
    compute_dtype,
    precision,
    total_groups: int,
    unroll: int,
    slots: int,
):
    """Group-unrolled multi-slot pipeline: each step moves U blocks with
    ONE (tiny, packed) descriptor DMA + ONE bitmask DMA + U*nseg x-run
    DMAs and feeds the MXU one (block_h, U*K) @ (U*K, block_d) dot.
    `slots`-deep rotation keeps slots-1 groups of data in flight (the
    reference's NUM_BUFFERS knob). Plans must be built with
    block_unroll=U; padding blocks carry zero bits and canonical
    seg-aligned runs, so their DMAs are valid and their dot contributes
    zeros."""
    nseg = block_w // seg
    depth = slots - 1  # data groups in flight ahead of compute
    c = pl.program_id(0)
    w = pl.program_id(1)
    col0 = pl.multiple_of(c * block_d, block_d)
    b0 = bp_ref[w]
    nb = bp_ref[w + 1] - b0
    g0 = b0 // unroll  # block_ptr entries are multiples of U by padding

    def desc_dma(g):
        return pltpu.make_async_copy(
            hseg_ref.at[pl.ds(g, 1)],
            desc_buf.at[pl.ds(g % slots, 1)],
            desc_sems.at[g % slots],
        )

    def bm_dma(g):
        return pltpu.make_async_copy(
            bitmask_ref.at[pl.ds(g * unroll, unroll)],
            bm_buf.at[g % slots],
            bm_sems.at[g % slots],
        )

    def xg_dma(g, u, j):
        start = pl.multiple_of(desc_buf[g % slots, u * nseg + j], seg)
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(start, seg), pl.ds(col0, block_d)],
            xg_buf.at[g % slots, pl.ds(u * block_w + j * seg, seg), :],
            xg_sems.at[g % slots],
        )

    def issue_group(g):
        """Start bitmask + gathered-X fetches for group g (desc in)."""
        bm_dma(g).start()
        for u in range(unroll):
            for j in range(nseg):
                xg_dma(g, u, j).start()

    # pipeline cold start: the first non-empty window of each feature
    # chunk (empty leading windows share b0 == 0 but have nb == 0)
    @pl.when(jnp.logical_and(b0 == 0, nb > 0))
    def _():
        for s in range(depth):
            @pl.when(s < total_groups)
            def _(s=s):
                desc_dma(s).start()
                desc_dma(s).wait()
                issue_group(s)
        if total_groups > depth:
            desc_dma(depth).start()

    out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, _):
        g = g0 + i
        slot = g % slots

        # producer side: bring group g+depth's data in while g computes
        @pl.when(g + depth < total_groups)
        def _():
            desc_dma(g + depth).wait()
            issue_group(g + depth)

        @pl.when(g + depth + 1 < total_groups)
        def _():
            desc_dma(g + depth + 1).start()

        # consumer side: wait for g's bitmask + gathered rows
        bm_dma(g).wait()
        for u in range(unroll):
            for j in range(nseg):
                xg_dma(g, u, j).wait()

        mask = jnp.concatenate(
            [
                expand_bitmask(bm_buf[slot, u], block_h, compute_dtype)
                for u in range(unroll)
            ],
            axis=1,
        )
        out_ref[...] += jnp.dot(
            mask,
            xg_buf[slot],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        return 0

    jax.lax.fori_loop(0, nb // unroll, body, 0)


def spmm_pallas_fused(
    plan: SpmmPlan,
    feat: jax.Array,
    *,
    block_d: int | None = None,
    compute_dtype=jnp.float32,
    precision=None,
    slots: int = 2,
    interpret: bool | None = None,
    out_dtype=None,
) -> jax.Array:
    """out[N, D] = A[N, N] @ feat[N, D], gather fused into the kernel.

    slots: pipeline buffer count (2 = double buffering, 3 = one more
    group of data in flight — the reference's NUM_BUFFERS=4 class,
    spmm_kernels.cuh:2074-2108)."""
    if getattr(plan, "values", None) is not None:
        raise ValueError(
            "plan carries a value plane; spmm_pallas_fused computes the "
            "binary SpMM — use ops.spmm(plan, feat)"
        )
    if plan.config.seg_interleaved:
        raise ValueError(
            "seg_interleaved plans are pregather-only; the fused "
            "kernel's DMA descriptors assume run-contiguous lanes"
        )
    if getattr(plan, "src_perm", None) is not None:
        # hind indexes the PACKED source; this kernel DMAs feat rows by
        # hind directly and would silently fetch renamed rows. Permute
        # feat yourself (feat[plan.src_perm]) or use the pregather path.
        raise ValueError(
            "pack_order='incidence' plans are pregather-only; "
            "spmm_pallas_fused reads feat by hind directly"
        )
    n, d = feat.shape
    assert n == plan.source_rows, (n, plan.source_rows)
    out_rows = plan.num_nodes
    if out_dtype is None:
        out_dtype = feat.dtype
    if plan.total_blocks == 0:
        return jnp.zeros((out_rows, d), out_dtype)

    cfg = plan.config
    block_h, block_w, words = cfg.block_h, cfg.block_w, cfg.words_per_col
    seg = cfg.gather_segment
    assert seg >= 8, "fused kernel needs a coverage plan (gather_segment >= 8)"
    assert block_h % 32 == 0 and block_w % 128 == 0
    assert slots >= 2
    if interpret is None:
        interpret = _interpret_default()

    compute_dtype = jnp.dtype(compute_dtype)
    d_pad = _round_up(d, 128)
    if block_d is None:
        # 4 MB output tile cap (this kernel's manual scratch is small:
        # slots x (words, K) bitmask + slots x (K, block_d) X buffers);
        # h2048 x 1024 f32 = 8 MB measured over the scoped-vmem limit
        block_d = _pick_block_d(d_pad, block_h, 4 * 2**20, start=1024)
    d_pad = _round_up(d_pad, block_d)
    num_chunks = d_pad // block_d

    # pad rows so every seg-aligned descriptor is in bounds, cast once so
    # the DMA stream (the dominant traffic) moves compute_dtype bytes
    n_pad = _round_up(n, seg)
    x = feat.astype(compute_dtype)
    if (n_pad, d_pad) != (n, d):
        x = jnp.pad(x, ((0, n_pad - n), (0, d_pad - d)))

    unroll = cfg.block_unroll
    assert plan.total_blocks % unroll == 0, (plan.total_blocks, unroll)
    total_groups = plan.total_blocks // unroll
    nseg = block_w // seg
    # packed descriptors: one run-start per seg-run, grouped per step,
    # rows padded to 128 lanes (HBM i32 arrays are (1,128)-lane tiled;
    # DMA slices must cover whole lanes) — at seg=128/U=4 that is one
    # 512 B descriptor DMA per group vs 2 KB for full hind rows
    hseg = jnp.asarray(plan.hind)[:, ::seg].reshape(
        total_groups, unroll * nseg
    )
    desc_w = max(128, _round_up(unroll * nseg, 128))
    if desc_w != unroll * nseg:
        hseg = jnp.pad(hseg, ((0, 0), (0, desc_w - unroll * nseg)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks, plan.num_windows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((block_h, block_d), lambda c, w, bp: (w, c)),
        scratch_shapes=[
            pltpu.SMEM((slots, desc_w), jnp.int32),
            pltpu.VMEM((slots, unroll, words, block_w), jnp.uint32),
            pltpu.VMEM((slots, unroll * block_w, block_d), compute_dtype),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )

    kernel = functools.partial(
        _fused_kernel,
        block_h=block_h,
        block_w=block_w,
        seg=seg,
        block_d=block_d,
        compute_dtype=compute_dtype,
        precision=precision,
        total_groups=total_groups,
        unroll=unroll,
        slots=slots,
    )
    flops = 2 * plan.total_blocks * block_h * block_w * d_pad
    bytes_accessed = (
        plan.total_blocks * block_w * d_pad * compute_dtype.itemsize
        + plan.total_blocks * words * block_w * 4
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
        jnp.asarray(plan.block_ptr),
        jnp.asarray(plan.bitmask),
        hseg,
        x,
    )
    return out[:out_rows, :d].astype(out_dtype)
