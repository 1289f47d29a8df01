"""Pallas TPU SpMM kernels.

TPU-native redesign of the reference's warp-specialized Hopper kernels
(spmm_kernels.cuh:1458-1727 `spmm_mma161616_spa_swizzle_d` and friends):

- The 16x8 tensor-core tile becomes an MXU-sized (block_h x block_w)
  masked matmul: bitmask-expand (VPU) -> dot (MXU) per block.
- The persistent-CTA wave over (row windows x feature chunks)
  (DynamicWaveScheduler, spmm_kernels.cuh:498-540) becomes a Pallas grid
  (feature_chunks, flat_blocks) with `dimension_semantics=("parallel",
  "arbitrary")` — XLA owns persistence/scheduling.
- The TMA + mbarrier producer/consumer double buffering
  (spmm_kernels.cuh:1128-1194) becomes the Pallas pipeline's automatic
  double-buffered HBM->VMEM streaming of the gathered X tiles; a fused
  in-kernel DMA-gather variant is a separate entry (see
  `spmm_pallas_fused`).
- Variable blocks-per-window (blockPartition/Pointer1) is handled by the
  flat block walk + *output revisiting*: consecutive grid steps whose
  prefetched `window_of_block` is unchanged accumulate into the same
  VMEM output tile; Pallas flushes the tile when the index map advances.

Variant "pregather" (this file's default, the analogue of reference
model 0): the irregular row gather of X is executed by XLA's native
dynamic-gather (`jnp.take`) which saturates HBM on TPU, and the kernel
streams the now-contiguous gathered tiles.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.plan import SpmmPlan
from ..project import const
from .bitmask import expand_bitmask


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _interpret_default() -> bool:
    if os.environ.get(const.INTERPRET_FLAG, "0") == "1":
        return True
    return jax.default_backend() != "tpu"


def _pick_block_d(
    d_pad: int, block_h: int, max_tile_bytes: int, start: int = 512
) -> int:
    """Default feature-chunk width bounded by the VMEM output tile.

    Mosaic's scoped-vmem limit is 16 MB and the pipelined kernels stage
    the (block_h, block_d) f32 output tile plus double-buffered inputs;
    h2048 x 512 f32 measured 17.01M scoped — over the limit on current
    toolchains. Shrinking block_d adds bitmask re-reads (one per chunk)
    but is the only knob that keeps tall windows compiling at d >= 512."""
    bd = min(d_pad, start)
    while bd > 128 and block_h * bd * 4 > max_tile_bytes:
        # halve, then floor to a 128 multiple — lanes must stay aligned
        # (d_pad=640 would otherwise yield 320; DMA slices of non-128
        # widths fail Mosaic lowering)
        bd = max(128, (bd // 2) // 128 * 128)
    return bd


def _gather_rows(plan: SpmmPlan, feat: jax.Array, d_pad: int) -> jax.Array:
    """Materialize the gathered X rows `xg[TB*K, d_pad]` in lane order.

    seg == 1: XLA's native row gather (`jnp.take`) — its cost is
    per-ROW up to ~1-2 KB rows (measured on v5e: ~constant Mrows/s from
    256 B to ~1 KB row width), so thin rows waste most of the machine.

    seg == q > 1 (packed gather): the plan's lanes come in q-aligned
    runs of q consecutive source rows (format/preprocess.py seg
    coverage), so the gather can fetch ONE q-row super-row per run head
    instead of q thin rows. Same bytes, 1/q the rows — measured
    1.5-3x faster gather at q in {2,4} on v5e. The cost is coverage
    waste (covered-but-absent rows stream through the MXU as zero-bit
    lanes); the tuner gates packed variants on `pack_ratios`.

    Formulation note (both measured on v5e, rmat-17 d256): gathering
    (q*d)-wide 2D super-rows and flattening back with an XLA reshape
    costs a layout copy that is small relative to the win at
    rmat-17-class sizes (q=2: 11.9 -> 9.2 ms end to end); gathering 3D
    (rows, q, d) and merging inside the kernel avoids the XLA copy but
    pays a per-step Mosaic relayout that measured strictly worse
    (14.7 ms) — so the 2D flatten is the shipped form."""
    n = feat.shape[0]
    q = plan.config.gather_segment
    if q == 1:
        assert plan.src_perm is None  # build-time invariant (PlanConfig)
        hind_flat = jnp.asarray(plan.hind).reshape(-1)
        return jnp.take(feat, hind_flat, axis=0, mode="clip")
    # interleaved plans have j-major lanes — this run-major flatten path
    # would misread them; spmm_pallas routes them to _gather_rows_ipack
    assert not plan.config.seg_interleaved
    if plan.src_perm is not None:
        # pack_order="incidence": physically lay the source out in
        # incidence order so the q-runs the plan was built against are
        # contiguous. One n-row gather — trivial next to gather_rows.
        feat = jnp.take(
            feat, jnp.asarray(plan.src_perm), axis=0, mode="clip"
        )
    n_super = _cdiv(n, q)
    if n_super * q != n:
        feat = jnp.pad(feat, ((0, n_super * q - n), (0, 0)))
    heads = jnp.asarray(plan.hind).reshape(-1, q)[:, 0] // q
    xg = jnp.take(
        feat.reshape(n_super, q * d_pad), heads, axis=0, mode="clip"
    )
    return xg.reshape(-1, d_pad)


def _gather_rows_ipack(
    plan: SpmmPlan, feat: jax.Array, d_pad: int, block_d: int
) -> jax.Array:
    """Wide packed gather for seg_interleaved plans: ONE (q*d_pad)-wide
    super-row per run, consumed by the kernel directly — the flatten
    reshape of `_gather_rows`'s q>1 path rewrote the whole gathered
    array and measured as the dominant cost of packed variants
    (bench/exp_split_rmat17.txt: q=2 raced 9.72 ms vs 6.40 ms seg1 at
    rmat-17 d256; at reddit scale the copy alone is ~28 ms).

    Returns (TB*K/q, q*d_pad) in group-run order, chunk-major within a
    row ([c0: x_0..x_{q-1} | c1: ...]) so a (m*K, q*block_d) BlockSpec
    tile at feature-chunk c is one contiguous slab. The source prep
    (reshape/transpose of feat) is an n-row pass — trivial next to the
    gather itself."""
    n = feat.shape[0]
    cfg = plan.config
    q, K, u = cfg.gather_segment, cfg.block_w, cfg.block_unroll
    m = u // q
    if plan.src_perm is not None:
        feat = jnp.take(
            feat, jnp.asarray(plan.src_perm), axis=0, mode="clip"
        )
    n_super = _cdiv(n, q)
    if n_super * q != n:
        feat = jnp.pad(feat, ((0, n_super * q - n), (0, 0)))
    nc = d_pad // block_d
    fprep = (
        feat.reshape(n_super, q, nc, block_d)
        .transpose(0, 2, 1, 3)
        .reshape(n_super, q * d_pad)
    )
    # blocks [0, m) of each group hold offset 0 of every run — their
    # hind values are the run heads
    heads = (
        jnp.asarray(plan.hind).reshape(-1, u * K)[:, : m * K].reshape(-1)
        // q
    )
    return jnp.take(fprep, heads, axis=0, mode="clip")


def _spmm_block_kernel(
    wob_ref,  # scalar-prefetch: int32 (num_groups,) window of each group
    bitmask_ref,  # (unroll, words, K) uint32
    xg_ref,  # (unroll * K, block_d) feat dtype; ipack (seg_interleaved):
    #          (unroll * K // q, q * block_d) — the wide packed gather
    #          consumed directly, no flatten
    out_ref,  # (block_h, block_d) float32
    *,
    block_h: int,
    compute_dtype,
    precision,
    unroll: int,
    ipack_q: int = 1,
):
    b = pl.program_id(1)
    w = wob_ref[b]
    prev_w = wob_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, prev_w != w)

    # one wide masked matmul over `unroll` blocks: masks concatenated
    # along lanes, gathered tiles along rows — amortizes per-step and
    # MXU setup cost (the reference's K=16 block pairing taken further,
    # spmm_kernels.cuh:1531 `i += 2` dual-block loop)
    masks = [
        expand_bitmask(bitmask_ref[u], block_h, compute_dtype)
        for u in range(unroll)
    ]
    xg = xg_ref[...].astype(compute_dtype)
    if ipack_q == 1:
        contrib = jnp.dot(
            jnp.concatenate(masks, axis=1), xg,
            preferred_element_type=jnp.float32, precision=precision,
        )
    else:
        # block-granular j-major layout: blocks [j*m, (j+1)*m) of the
        # group hold offset j of every run — q accumulated dots, each a
        # concat of WHOLE expanded blocks against the j-th block_d
        # slice of the wide gathered rows (see PlanConfig.seg_interleaved)
        m = unroll // ipack_q
        bd = xg.shape[1] // ipack_q
        contrib = None
        for j in range(ipack_q):
            mask_j = jnp.concatenate(masks[j * m : (j + 1) * m], axis=1)
            d_j = jnp.dot(
                mask_j, xg[:, j * bd : (j + 1) * bd],
                preferred_element_type=jnp.float32, precision=precision,
            )
            contrib = d_j if contrib is None else contrib + d_j

    @pl.when(is_first)
    def _():
        out_ref[...] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[...] += contrib


def _spmm_subtiled_kernel(
    wob_ref,  # scalar-prefetch: int32 (num_groups,)
    occ_ref,  # scalar-prefetch: int32 (num_groups,) group sub-window bitmap
    bitmask_ref,  # (unroll, words, K) uint32
    xg_ref,  # (unroll * K, block_d)
    out_ref,  # (block_h, block_d) float32
    *,
    block_h: int,
    block_w: int,
    compute_dtype,
    precision,
    unroll: int,
    ipack_q: int = 1,
):
    """Tall-window variant that skips empty 128-row sub-tiles.

    At tall windows the mask is extremely sparse (<1% of slots); with
    column-clustered plans (format/cluster.py) each unroll-group's bits
    concentrate in few 128-row sub-windows. Per occupied sub-window the
    group computes ONE wide (128, unroll*K) @ (unroll*K, D) masked dot —
    skipping empty sub-windows skips both the VPU bitmask expansion
    (the measured per-step bottleneck at tall windows) and the MXU pass.
    Group-level (not per-block) predication keeps the dot large and the
    branch count at nsub per step; a per-block version measured slower
    (64 predicated small dots/step ate the savings on v5e).

    ipack_q > 1 (seg_interleaved plans): q accumulated dots per
    occupied sub-window over j-major lane segments — consumes the wide
    packed gather directly, no flatten (see _spmm_block_kernel)."""
    b = pl.program_id(1)
    w = wob_ref[b]
    prev_w = wob_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, prev_w != w)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    nsub = block_h // 128
    occ = occ_ref[b]
    xg = xg_ref[...].astype(compute_dtype)
    for s in range(nsub):
        @pl.when((occ >> s) & 1 != 0)
        def _(s=s):
            masks = [
                expand_bitmask(
                    bitmask_ref[u, s * 4 : (s + 1) * 4],
                    128,
                    compute_dtype,
                )
                for u in range(unroll)
            ]
            if ipack_q == 1:
                out_ref[s * 128 : (s + 1) * 128, :] += jnp.dot(
                    jnp.concatenate(masks, axis=1),
                    xg,
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            else:
                m = unroll // ipack_q
                bd = xg.shape[1] // ipack_q
                acc = None
                for j in range(ipack_q):
                    mask_j = jnp.concatenate(
                        masks[j * m : (j + 1) * m], axis=1
                    )
                    d_j = jnp.dot(
                        mask_j,
                        xg[:, j * bd : (j + 1) * bd],
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    acc = d_j if acc is None else acc + d_j
                out_ref[s * 128 : (s + 1) * 128, :] += acc


def _subtile_occupancy(bitmask, unroll: int):
    """(TB, words, K) -> int32 (TB,) bit s set iff sub-window s (128
    rows = 4 words) of the block has any bit."""
    tb, words, _ = bitmask.shape
    nsub = words // 4
    any_word = (bitmask != 0).any(axis=2)  # (TB, words)
    any_sub = any_word.reshape(tb, nsub, 4).any(axis=2)  # (TB, nsub)
    weights = (1 << jnp.arange(nsub, dtype=jnp.int32))[None, :]
    return jnp.sum(any_sub.astype(jnp.int32) * weights, axis=1, dtype=jnp.int32)


def spmm_pallas(
    plan: SpmmPlan,
    feat: jax.Array,
    *,
    block_d: int | None = None,
    compute_dtype=jnp.float32,
    precision=None,
    subtile: bool = False,
    interpret: bool | None = None,
    out_dtype=None,
) -> jax.Array:
    """out[N, D] = A[N, N] @ feat[N, D] via the binned block-CSR plan.

    compute_dtype: dtype fed to the MXU. float32 with default precision
    reproduces the reference's tf32-class accuracy (MXU rounds inputs to
    bf16 internally); bfloat16 halves the stream volume; float32 with
    precision="highest" gives near-exact fp32 at ~3x MXU passes.

    out_dtype: output dtype (default: feat's). Callers that downcast
    feat for gather volume (feat_dtype variants) pass their original
    dtype here so the f32 accumulators reach the caller untruncated —
    without it the output round-trips through bf16 (headline diff rate
    2.8e-6 -> 1.4e-6 with the fix; time-neutral, XLA fuses the casts).
    """
    if getattr(plan, "values", None) is not None:
        # a weighted plan through the binary kernel would silently drop
        # the value plane and return A@X instead of (A o V)@X
        raise ValueError(
            "plan carries a value plane; use ops.spmm(plan, feat) / "
            "spmm_pallas_weighted — spmm_pallas computes the binary SpMM"
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
    assert block_h % 32 == 0, "device kernel requires block_h % 32 == 0"
    assert block_w % 128 == 0, "device kernel requires block_w % 128 == 0"
    if interpret is None:
        interpret = _interpret_default()

    d_pad = _round_up(d, 128)
    if block_d is None:
        # 2 MB output tile: the pipeline also stages bitmask + gathered
        # tiles double-buffered, and the 16 MB scoped-vmem budget is
        # shared (h2048 x 512 f32 = 4 MB tile measured over the limit)
        block_d = _pick_block_d(d_pad, block_h, 2 * 2**20)
    d_pad = _round_up(d_pad, block_d)
    if d_pad != d:
        feat = jnp.pad(feat, ((0, 0), (0, d_pad - d)))
    num_chunks = d_pad // block_d

    unroll = cfg.block_unroll
    assert plan.total_blocks % unroll == 0, (plan.total_blocks, unroll)
    num_groups = plan.total_blocks // unroll

    ipack_q = cfg.gather_segment if cfg.seg_interleaved else 1
    if ipack_q > 1:
        xg = _gather_rows_ipack(plan, feat, d_pad, block_d)
        xg_spec = pl.BlockSpec(
            (unroll * block_w // ipack_q, ipack_q * block_d),
            lambda c, b, *_: (b, c),
        )
    else:
        xg = _gather_rows(plan, feat, d_pad)
        xg_spec = pl.BlockSpec(
            (unroll * block_w, block_d), lambda c, b, *_: (b, c)
        )

    if subtile:
        assert block_h % 128 == 0, "subtile needs block_h % 128 == 0"
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_chunks, num_groups),
            in_specs=[
                pl.BlockSpec(
                    (unroll, words, block_w), lambda c, b, *_: (b, 0, 0)
                ),
                xg_spec,
            ],
            out_specs=pl.BlockSpec(
                (block_h, block_d), lambda c, b, wob, occ: (wob[b], c)
            ),
        )
        kernel = functools.partial(
            _spmm_subtiled_kernel,
            block_h=block_h,
            block_w=block_w,
            compute_dtype=compute_dtype,
            precision=precision,
            unroll=unroll,
            ipack_q=ipack_q,
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_chunks, num_groups),
            in_specs=[
                pl.BlockSpec(
                    (unroll, words, block_w), lambda c, b, *_: (b, 0, 0)
                ),
                xg_spec,
            ],
            out_specs=pl.BlockSpec(
                (block_h, block_d), lambda c, b, wob: (wob[b], c)
            ),
        )
        kernel = functools.partial(
            _spmm_block_kernel,
            block_h=block_h,
            compute_dtype=compute_dtype,
            precision=precision,
            unroll=unroll,
            ipack_q=ipack_q,
        )
    flops = 2 * plan.total_blocks * block_h * block_w * d_pad
    bytes_accessed = (
        xg.size * xg.dtype.itemsize
        + plan.total_blocks * words * block_w * 4
        + plan.padded_nodes * d_pad * 4
    )
    scalar_args = [jnp.asarray(plan.window_of_block)[::unroll]]
    if subtile:
        # cluster_cols plans carry the skip bitmap precomputed on the host
        occ_blocks = (
            jnp.asarray(plan.occ)
            if plan.occ is not None
            else _subtile_occupancy(jnp.asarray(plan.bitmask), unroll)
        )
        # group-level bitmap: OR over the unroll blocks of each step
        occ_group = occ_blocks[::unroll]
        for i in range(1, unroll):
            occ_group = occ_group | occ_blocks[i::unroll]
        scalar_args.append(occ_group)
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
    )(*scalar_args, jnp.asarray(plan.bitmask), xg)

    # Windows with zero blocks are never visited by the grid, leaving
    # their output tiles uninitialized — zero them explicitly.
    if plan.has_empty_windows:
        bpw = jnp.diff(jnp.asarray(plan.block_ptr))
        nonempty = jnp.repeat(
            bpw > 0, plan.config.block_h, total_repeat_length=plan.padded_nodes
        )
        out = jnp.where(nonempty[:, None], out, 0.0)

    return out[:out_rows, :d].astype(out_dtype)
