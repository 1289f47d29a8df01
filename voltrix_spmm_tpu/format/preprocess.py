"""CSR -> binned block-CSR preprocessing (vectorized numpy path).

TPU-native rebuild of the reference's 3-stage preprocessing pipeline
(reference: voltrix/spmm/spmm.py:16-89):
  1. window sort + dedup + compress   (voltrix::preprocess,
     bmat_kernels.cuh:264-320, CPU/OpenMP)
  2. tile materialization (hspa/hind) (hmat_cuda_kernel,
     bmat_kernels.cuh:21-111, GPU)
  3. bitmask pack + swizzle           (hmat_convert_uint32_swizzle,
     bmat_kernels.cuh:151-193, GPU)

Here all three collapse into one fully-vectorized numpy pass (sort/unique/
scatter) producing the `SpmmPlan`; a C++/OpenMP native backend with the
same contract lives in `voltrix_spmm_tpu/runtime` (built by the JIT layer)
and is parity-tested against this implementation.
"""

from __future__ import annotations

import os

import numpy as np

from ..project import const
from .plan import PlanConfig, SpmmPlan


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def csr_preprocess(
    indptr,
    indices,
    num_nodes: int,
    config: PlanConfig = PlanConfig(),
    backend: str = "auto",
    num_cols: int | None = None,
    values=None,
) -> SpmmPlan:
    """Build an `SpmmPlan` from CSR adjacency (binary values implied).

    Parity with the reference public entry point
    (voltrix/spmm/spmm.py:16: ``csr_preprocess(indptr, indices,
    num_nodes) -> (pointer1, hspa_packed, hind)``) — the returned plan
    carries the same three payloads as ``block_ptr``/``bitmask``/``hind``
    plus the flattened window map the TPU kernel needs.

    backend: "numpy", "native" (C++/OpenMP), or "auto" (native when the
    runtime library is available, else numpy).

    values: optional per-edge weights aligned with `indices` (the
    reference format is binary-only; this extension stores a dense
    (total_blocks, block_h, block_w) value plane and `spmm` dispatches
    to the weighted kernel). Duplicate (row, col) entries SUM, the
    scipy/cuSPARSE CSR convention. Use moderate block_h (<= 512): the
    value plane costs total_blocks * block_h * block_w * 4 bytes.
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    assert indptr.ndim == 1 and indptr.shape[0] == num_nodes + 1
    assert indices.ndim == 1

    if values is not None:
        assert config.gather_segment == 1, "weighted plans need exact lanes"
        assert not config.cluster_cols, (
            "weighted plans do not support column clustering yet"
        )
        if config.block_h % 32 != 0:
            # surface the constraint at build time: the forward kernel
            # accepts block_h % 8 but the dvalues backward needs whole
            # bitmask words (% 32) — failing here beats failing mid-train
            raise ValueError(
                f"weighted plans need block_h % 32 == 0 (got "
                f"{config.block_h}): spmm_weighted_dvalues packs row bits "
                "in uint32 words"
            )
        values = np.asarray(values, dtype=np.float32)
        assert values.shape == indices.shape
        # the value plane is built by the numpy path; the native backend
        # covers the binary fast path only
        backend = "numpy"

    if backend == "auto":
        if os.environ.get(const.DISABLE_NATIVE_FLAG, "0") == "1":
            backend = "numpy"
        else:
            from ..runtime import native_available

            backend = "native" if native_available() else "numpy"

    src_perm = None
    if config.pack_order == "incidence":
        # Rename the column space by window-incidence order BEFORE the
        # layout pass: both backends then see an ordinary CSR whose
        # seg-runs happen to cover tightly, and the plan records the
        # permutation so the runtime packs X once per call.
        src_perm = incidence_order(
            indptr, indices, num_nodes, config.block_h, num_cols
        )
        rank = np.empty(src_perm.shape[0], np.int64)
        rank[src_perm] = np.arange(src_perm.shape[0])
        indices = rank[indices]

    if backend == "native":
        from ..runtime import native_preprocess

        plan = native_preprocess(indptr, indices, num_nodes, config, num_cols)
    else:
        assert backend == "numpy", f"unknown backend {backend!r}"
        plan = _numpy_preprocess(
            indptr, indices, num_nodes, config, num_cols, values
        )

    if config.cluster_cols:
        # two-level windows: sort each window's lanes by sub-window
        # signature and precompute the subtile skip bitmap. The native
        # pass is window-local (cache-resident, OpenMP) — the numpy path
        # shuffles the full bitmask through strided copies (118 s vs
        # ~2 s measured at rmat-19 h2048)
        if backend == "native":
            from ..runtime import native_cluster

            plan = native_cluster(plan)
        else:
            from .cluster import block_occupancy, cluster_window_columns

            plan = cluster_window_columns(plan)
            plan.occ = block_occupancy(np.asarray(plan.bitmask))
    if config.seg_interleaved:
        # Block-granular j-major remap, applied AFTER clustering: within
        # each unroll-group the m*K runs (m = unroll // q, run-major
        # across the group's blocks) are redistributed so blocks
        # [j*m, (j+1)*m) hold offset j of every run — flat group slot
        # j*m*K + r takes old slot r*q + j. A pure relabeling of
        # (block, lane) slots inside each group: occupancy, windows,
        # and semantics are unchanged (the group-level occ OR is
        # permutation-invariant); only the kernel's per-j block concat
        # (ops/pallas_spmm ipack path) and the run-head extraction
        # (first m blocks of each group) depend on it.
        q, K, u = config.gather_segment, config.block_w, config.block_unroll
        m = u // q
        uk = u * K
        newpos = np.arange(uk)
        old_of_new = (newpos % (m * K)) * q + newpos // (m * K)
        hind = np.asarray(plan.hind).reshape(-1, uk)[:, old_of_new]
        plan.hind = np.ascontiguousarray(hind.reshape(-1, K))
        bm = np.asarray(plan.bitmask)
        words = bm.shape[1]
        bm = (
            bm.reshape(-1, u, words, K)
            .transpose(0, 2, 1, 3)
            .reshape(-1, words, uk)[:, :, old_of_new]
            .reshape(-1, words, u, K)
            .transpose(0, 2, 1, 3)
        )
        plan.bitmask = np.ascontiguousarray(bm.reshape(-1, words, K))
        if plan.occ is not None:
            # per-block occupancy moved with the runs; the group-level
            # OR the kernel consumes is invariant, but keep the stored
            # per-block bitmap truthful
            from .cluster import block_occupancy

            plan.occ = block_occupancy(np.asarray(plan.bitmask))
    if src_perm is not None:
        plan.src_perm = src_perm.astype(np.int32)
    return plan


def pad_empty_windows(blocks_per_window: np.ndarray, unroll: int) -> np.ndarray:
    """Give zero-block windows `unroll` zero-bit padding blocks when cheap.

    Windows with no blocks are never visited by the kernel grid, leaving
    their output tiles uninitialized; the post-kernel `where` that zeroes
    them rewrites the WHOLE output (measured 0.4-0.6 ms at rmat-17 d256,
    ~5% of the dispatch). Visiting them with one zero-bit block group
    instead writes the zeros in-kernel for free. Skipped when empty
    windows dominate (e.g. rectangular transpose shards) — there the
    padding blocks would outnumber the real ones and the single `where`
    is cheaper."""
    empty = blocks_per_window == 0
    n_empty = int(empty.sum())
    if n_empty == 0:
        return blocks_per_window
    real_blocks = int(blocks_per_window.sum())
    if n_empty * unroll > max(64, real_blocks // 8):
        return blocks_per_window
    out = blocks_per_window.copy()
    out[empty] = unroll
    return out


def _numpy_preprocess(
    indptr: np.ndarray,
    indices: np.ndarray,
    num_nodes: int,
    config: PlanConfig,
    num_cols: int | None = None,
    values: np.ndarray | None = None,
) -> SpmmPlan:
    span = num_cols if num_cols is not None else num_nodes
    W, K = config.block_h, config.block_w
    words = config.words_per_col
    num_windows = max(_cdiv(num_nodes, W), 1)

    deg = np.diff(indptr)
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), deg)
    cols = indices.astype(np.int64)

    # Deduplicate (row, col) pairs so every bit is set exactly once
    # (the reference dedups per-window columns at bmat_kernels.cuh:248-262;
    # duplicate *edges* would corrupt its hspa the same way they would our
    # bitmask, so canonicalize here). Weighted plans SUM duplicate values
    # (scipy CSR convention).
    edge_key = rows * span + cols
    if values is not None:
        edge_key, edge_inv = np.unique(edge_key, return_inverse=True)
        vals = np.zeros(edge_key.shape[0], np.float32)
        np.add.at(vals, edge_inv, values)
    else:
        edge_key = np.unique(edge_key)
        vals = None
    rows = edge_key // span
    cols = edge_key % span
    nnz = int(rows.shape[0])

    if nnz == 0:
        return SpmmPlan(
            bitmask=np.zeros((0, words, K), np.uint32),
            hind=np.zeros((0, K), np.int32),
            window_of_block=np.zeros((0,), np.int32),
            block_ptr=np.zeros((num_windows + 1,), np.int32),
            config=config,
            num_nodes=num_nodes,
            num_edges=0,
            num_windows=num_windows,
            total_blocks=0,
            has_empty_windows=True,
            num_cols=num_cols,
        )

    win = rows // W
    seg = config.gather_segment
    num_segs_total = _cdiv(span, seg)
    # Sorted-unique (window, col-segment): at seg=1 this is exactly the
    # window-local sort + dedup + compressed-column numbering of the
    # reference (bmat_kernels.cuh:290-307 edgeToColumn construction); at
    # seg>1 it is the aligned-run coverage of the neighbor set.
    wc = win * num_segs_total + cols // seg
    uniq_wc, edge_to_unique = np.unique(wc, return_inverse=True)
    uniq_win = uniq_wc // num_segs_total
    uniq_seg = (uniq_wc % num_segs_total).astype(np.int64)

    # blocks per window = ceil(#covered / K)  (reference blockPartition,
    # bmat_kernels.cuh:298-299); block_ptr = exclusive prefix (Pointer1,
    # bmat_kernels.cuh:312-319).
    win_unique = np.bincount(uniq_win, minlength=num_windows)
    blocks_per_window = -(-(win_unique * seg) // K)
    if config.block_unroll > 1:
        u = config.block_unroll
        blocks_per_window = -(-blocks_per_window // u) * u
    blocks_per_window = pad_empty_windows(
        blocks_per_window, config.block_unroll
    )
    block_ptr = np.zeros(num_windows + 1, dtype=np.int64)
    np.cumsum(blocks_per_window, out=block_ptr[1:])
    total_blocks = int(block_ptr[-1])

    win_unique_start = np.zeros(num_windows + 1, dtype=np.int64)
    np.cumsum(win_unique, out=win_unique_start[1:])
    # Position of each unique segment inside its window's covered numbering
    # (a segment never straddles a block since K % seg == 0).
    upos = (
        np.arange(uniq_wc.shape[0], dtype=np.int64) - win_unique_start[uniq_win]
    ) * seg
    ublock = block_ptr[uniq_win] + upos // K
    ulane = upos % K

    # hind: source-row gather map, zero-padded lanes carry no bits
    # (reference hind zero-init at bmat_kernels.cuh:71-74). Covered rows
    # may exceed num_nodes-1 at the tail; their bits are all zero and
    # consumers clip/pad.
    # init: padding lanes carry the canonical [0..seg) run so every
    # seg-lane group is a valid aligned DMA descriptor (bits all zero)
    offs = np.arange(seg, dtype=np.int64)
    hind = np.tile(offs.astype(np.int32), (total_blocks, K // seg))
    hind[ublock[:, None], ulane[:, None] + offs[None, :]] = (
        uniq_seg[:, None] * seg + offs[None, :]
    ).astype(np.int32)

    # Row-packed bitmask: each edge lights exactly one distinct bit, so a
    # scatter-add of (1 << shift) is an exact bitwise OR.
    r_local = (rows % W).astype(np.int64)
    e_block = ublock[edge_to_unique]
    e_lane = ulane[edge_to_unique] + cols % seg
    bitmask = np.zeros((total_blocks, words, K), dtype=np.uint32)
    np.add.at(
        bitmask,
        (e_block, r_local // 32, e_lane),
        (np.uint32(1) << (r_local % 32).astype(np.uint32)),
    )

    vplane = None
    if vals is not None:
        # dense per-block value plane aligned with the bitmask; each
        # deduped edge owns exactly one slot, so direct scatter is exact
        vplane = np.zeros((total_blocks, W, K), dtype=np.float32)
        vplane[e_block, r_local, e_lane] = vals

    window_of_block = np.repeat(
        np.arange(num_windows, dtype=np.int32), blocks_per_window
    )

    return SpmmPlan(
        bitmask=bitmask,
        hind=hind,
        window_of_block=window_of_block,
        block_ptr=block_ptr.astype(np.int32),
        config=config,
        num_nodes=num_nodes,
        num_edges=nnz,
        num_windows=num_windows,
        total_blocks=total_blocks,
        has_empty_windows=bool((blocks_per_window == 0).any()),
        num_cols=num_cols,
        values=vplane,
    )


def coverage_expansion(
    indptr, indices, num_nodes: int, block_h: int, seg: int
) -> float:
    """Gather rows per nnz for a coverage plan (gather_segment=seg) —
    computed straight from the CSR, no plan build (a full coverage plan
    on a scattered graph can be GBs; the tuner gates fused candidates on
    this instead, see tuner.default_space)."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    nnz = int(indices.shape[0])
    if nnz == 0:
        return 0.0
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    nseg = _cdiv(num_nodes, seg)
    keys = (rows // block_h) * nseg + indices // seg
    return float(np.unique(keys).shape[0] * seg) / nnz


def pack_ratios(
    indptr, indices, num_nodes: int, block_h: int, qs=(2, 4)
) -> tuple[int, dict[int, float]]:
    """Lane-count inflation of packed (gather_segment=q) plans.

    Returns (unique_lanes, {q: ratio}) where unique_lanes is the exact
    (window, col) dedup count (= gather rows of a seg=1 plan before
    block padding) and ratio = q * groups_q / unique_lanes >= 1 — the
    factor by which covered lane slots (and hence blocks / bitmask
    bytes / MXU passes) grow when lanes are covered by q-aligned runs.
    The packed gather fetches ONE (q*d)-wide super-row per run, so its
    row count is unique_lanes * ratio / q: the gather gets q/ratio
    cheaper in rows while the kernel pays ratio more slots. One sort
    over nnz; the per-q counts are diffs over the already-unique keys."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    nnz = int(indices.shape[0])
    if nnz == 0:
        return 0, {q: 1.0 for q in qs}
    span = num_nodes
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    uniq = np.unique((rows // block_h) * span + indices)
    u = int(uniq.shape[0])
    win = uniq // span
    col = uniq % span
    out = {}
    for q in qs:
        gkey = win * (span // q + 1) + col // q
        # uniq is sorted by (win, col), so gkey is nondecreasing
        groups = int(np.count_nonzero(np.diff(gkey))) + 1
        out[q] = q * groups / u
    return u, out


def incidence_order(
    indptr,
    indices,
    num_nodes: int,
    block_h: int,
    num_cols: int | None = None,
    max_bits: int = 512,
) -> np.ndarray:
    """Source-column permutation that tightens q-run coverage.

    Sorts columns lexicographically by their window-incidence bitset
    (window 0 most significant, natural id as tie-break): columns
    referenced by EXACTLY the same windows become adjacent — their
    q-runs are all-or-none per window, i.e. zero coverage waste — and
    columns with similar incidence share long mask prefixes and land
    nearby. This keys on co-occurrence directly; frequency order (the
    obvious proxy) measured nearly no ratio gain (bench/exp_pack_order
    census: rmat-17 q=4 ratio natural 1.752, freq 1.704, incidence
    1.312). Reference role: spmm_kernels.cuh:1563-1570 — fewer, wider
    bulk copies of gathered rows.

    Returns int32 (span,) `order`, new position -> original column
    (Xp = X[order]). Windows beyond `max_bits` are folded into coarse
    buckets so the mask table stays bounded (span x max_bits/8 bytes).
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    span = num_cols if num_cols is not None else num_nodes
    nwin = max(_cdiv(num_nodes, block_h), 1)
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    uniq = np.unique((rows // block_h) * span + indices)
    win = uniq // span
    col = uniq % span
    if nwin > max_bits:
        # coarse buckets keep neighboring windows together so the
        # lexicographic prefix still reflects locality
        win = win * max_bits // nwin
        nwin = max_bits
    nwords = _cdiv(nwin, 64)
    masks = np.zeros((span, nwords), np.uint64)
    np.bitwise_or.at(
        masks,
        (col, (win // 64).astype(np.int64)),
        np.uint64(1) << ((63 - win % 64).astype(np.uint64)),
    )
    order = np.lexsort(tuple(masks[:, w] for w in range(nwords - 1, -1, -1)))
    return order.astype(np.int32)


def incidence_pack_ratios(
    indptr, indices, num_nodes: int, block_h: int, qs=(2, 4, 8)
) -> dict[int, float]:
    """`pack_ratios` under the incidence-order column renaming — the
    gate for pack_order='incidence' tuning candidates (same semantics:
    covered/needed lane inflation; the gather fetches needed*ratio/q
    super-rows and the kernel pays ratio more slots)."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    if indices.shape[0] == 0:
        return {q: 1.0 for q in qs}
    span = num_nodes
    order = incidence_order(indptr, indices, num_nodes, block_h)
    rank = np.empty(span, np.int64)
    rank[order] = np.arange(span)
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    uniq = np.unique((rows // block_h) * span + rank[indices])
    u = int(uniq.shape[0])
    win = uniq // span
    col = uniq % span
    out = {}
    for q in qs:
        gkey = win * (span // q + 1) + col // q
        groups = int(np.count_nonzero(np.diff(gkey))) + 1
        out[q] = q * groups / u
    return out


def density_split_stats(
    indptr,
    indices,
    num_nodes: int,
    block_h: int,
    q: int,
    thresh: int | None = None,
) -> tuple[float, float]:
    """(gather_rows_fraction, slot_inflation) of a density-split hybrid
    (format/hybrid.py with a pregather dense side, ops/hybrid.py):
    (window, col//q) groups holding >= thresh distinct needed columns
    are fetched as ONE (q*d)-wide super-row (waste bounded at
    q/thresh); the rest stay exact single lanes. Both relative to the
    seg=1 needed-lane count u: gather_rows_fraction = (dense_groups +
    tail_lanes)/u (the per-row gather-law win), slot_inflation =
    (q*dense_groups + tail_lanes)/u (the kernel's extra masked-matmul
    work). Census (bench/exp_pack_order.py, v5e gather law): reddit-
    proxy h2048 q8 t4 -> rows 0.41x, slots 1.22x; rmat-17 -> rows
    0.38x, slots 1.16x."""
    if thresh is None:
        thresh = max(2, q // 2)
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    if indices.shape[0] == 0:
        return 1.0, 1.0
    span = num_nodes
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), np.diff(indptr))
    uniq = np.unique((rows // block_h) * span + indices)
    u = int(uniq.shape[0])
    gkey = (uniq // span) * (span // q + 1) + (uniq % span) // q
    # uniq sorted by (win, col) -> gkey nondecreasing
    boundaries = np.flatnonzero(np.diff(gkey)) + 1
    counts = np.diff(np.concatenate(([0], boundaries, [u])))
    dense = counts >= thresh
    nd = int(dense.sum())
    tail = int(counts[~dense].sum())
    return (nd + tail) / u, (nd * q + tail) / u


# the fused bulk-DMA kernel is eligible when an h2048/seg128 coverage
# plan wastes at most this many gather rows per nnz (measured regime
# boundary; one constant shared by the tuner, the bench harness, and
# the model-layer auto config so the gate can't drift between them)
FUSED_COVERAGE_THRESHOLD = 0.5

# packed-gather (gather_segment=2/4 pregather) variants join the tuning
# space when the lane-slot inflation stays under this ratio: the gather
# gains in row count while the kernel pays `ratio` more covered slots
# and the gather's bandwidth term pays `ratio` more bytes. Measured on
# v5e d256 bf16 clustered-subtile h2048: rmat-17 ratio 1.34 -> 1.29x
# net WIN (11.9 -> 9.2 ms); reddit-proxy ratio 1.47 -> net LOSS (68.9
# -> ~81 ms best case: kernel +65%, gather only -12% because the byte
# term binds at 1 KB rows). The huge-regime space uses the tighter
# bound (candidates there cost minutes to build+race); elsewhere the
# tuner measures, so the looser gate only bounds tuning time.
PACK_RATIO_THRESHOLD = 1.5
PACK_RATIO_THRESHOLD_HUGE = 1.4


def fused_auto_config(indptr, indices, num_nodes: int):
    """The fused bulk-DMA plan config when this matrix's coverage waste
    is under `FUSED_COVERAGE_THRESHOLD`, else None (caller falls back
    to a pregather config)."""
    cov = coverage_expansion(indptr, indices, num_nodes, 2048, 128)
    if cov <= FUSED_COVERAGE_THRESHOLD:
        return PlanConfig(2048, 128, gather_segment=128, block_unroll=4)
    return None


def csr_transpose(indptr, indices, num_nodes: int, values=None,
                  num_cols: int | None = None):
    """CSR(A) -> CSR(A^T) on the host (counting sort, no scipy).

    A is (num_nodes, span) with span = num_cols or num_nodes. Returns
    (indptr_t, indices_t, values_t) for the (span, num_nodes) transpose;
    values_t is None when values is None. Together with
    `csr_preprocess(..., values=...)` this builds the transpose plan a
    weighted training step needs (`ops.spmm_weighted_ad`): the reference
    is inference-only and binary-only (bmat_kernels.cuh:16-20), so both
    the value plane and its backward are TPU-side extensions."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    span = num_cols if num_cols is not None else num_nodes
    deg = np.diff(indptr)
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), deg)
    order = np.argsort(indices, kind="stable")  # stable keeps rows sorted
    indptr_t = np.zeros(span + 1, dtype=np.int64)
    np.cumsum(np.bincount(indices, minlength=span), out=indptr_t[1:])
    values_t = (
        None if values is None else np.asarray(values, np.float32)[order]
    )
    return indptr_t, rows[order], values_t


def edge_slot_map(plan: SpmmPlan, indptr, indices) -> np.ndarray:
    """Flat index into `plan.values` for every CSR edge.

    Derived from the plan itself (hind + bitmask), not by re-running the
    layout pass, so it stays correct under preprocessing changes. With
    `slots = edge_slot_map(plan, indptr, indices)`, a differentiable
    value plane is built inside jit from per-edge parameters `w`:

        plane = jnp.zeros(tb * H * K).at[slots].add(w).reshape(tb, H, K)
        out = spmm(dataclasses.replace(plan, values=plane), feat)

    Duplicate (row, col) edges share a slot, so `.add` reproduces the
    duplicate-summing CSR convention of `csr_preprocess(values=...)`.
    This is the hook for learned edge weights (GAT-style attention,
    learned normalizations) — gradients flow through the scatter."""
    cfg = plan.config
    assert cfg.gather_segment == 1 and not cfg.cluster_cols
    W, K = cfg.block_h, cfg.block_w
    span = plan.source_rows
    bm = np.asarray(plan.bitmask)
    hind = np.asarray(plan.hind).astype(np.int64)
    wob = np.asarray(plan.window_of_block).astype(np.int64)
    # real lanes carry at least one presence bit; padding lanes are 0
    b_idx, l_idx = np.nonzero((bm != 0).any(axis=1))
    keys = wob[b_idx] * span + hind[b_idx, l_idx]
    order = np.argsort(keys)
    keys_sorted = keys[order]
    lane_flat = (b_idx * K + l_idx)[order]

    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    rows = np.repeat(
        np.arange(indptr.shape[0] - 1, dtype=np.int64), np.diff(indptr)
    )
    ekeys = (rows // W) * span + indices
    pos = np.searchsorted(keys_sorted, ekeys)
    if pos.shape[0] and not bool(
        (keys_sorted[np.minimum(pos, keys_sorted.shape[0] - 1)] == ekeys).all()
    ):
        # a real raise, not an assert: under python -O a silent mismatch
        # would scatter weights into other edges' slots
        raise ValueError(
            "edge not represented in plan (wrong plan for this CSR?)"
        )
    bl = lane_flat[pos] if pos.shape[0] else np.zeros(0, np.int64)
    return (bl // K) * (W * K) + (rows % W) * K + (bl % K)


def expand_bitmask_np(bitmask: np.ndarray, block_h: int) -> np.ndarray:
    """Expand a row-packed bitmask (B, words, K) -> dense 0/1 (B, block_h, K)."""
    bitmask = np.asarray(bitmask, dtype=np.uint32)
    nblocks, words, K = bitmask.shape
    shifts = np.arange(32, dtype=np.uint32)
    bits = (bitmask[:, :, None, :] >> shifts[None, None, :, None]) & np.uint32(1)
    return bits.reshape(nblocks, words * 32, K)[:, :block_h].astype(np.uint8)


def plan_to_dense(plan: SpmmPlan) -> np.ndarray:
    """Reconstruct the dense adjacency from a plan (test oracle)."""
    W = plan.config.block_h
    dense = np.zeros((plan.num_nodes, plan.num_nodes), dtype=np.uint8)
    if plan.total_blocks == 0:
        return dense
    bits = expand_bitmask_np(np.asarray(plan.bitmask), W)  # (B, W, K)
    hind = np.asarray(plan.hind).astype(np.int64)
    if plan.src_perm is not None:
        # hind indexes the packed source; map back to original columns
        perm = np.asarray(plan.src_perm).astype(np.int64)
        hind = perm[np.clip(hind, 0, perm.shape[0] - 1)]
    wob = np.asarray(plan.window_of_block)
    b_idx, r_idx, l_idx = np.nonzero(bits)
    global_rows = wob[b_idx] * W + r_idx
    global_cols = hind[b_idx, l_idx]
    keep = global_rows < plan.num_nodes
    dense[global_rows[keep], global_cols[keep]] = 1
    return dense


def plan_stats(plan: SpmmPlan) -> dict:
    """Packing statistics (the reference prints TC_Blocks / Exp_Edges,
    bmat_kernels.cuh:309-310)."""
    slots = plan.total_blocks * plan.config.block_h * plan.config.block_w
    return {
        "num_nodes": plan.num_nodes,
        "nnz": plan.num_edges,
        "num_windows": plan.num_windows,
        "total_blocks": plan.total_blocks,
        "gather_rows": plan.gather_rows,
        "expanded_slots": slots,
        "fill_ratio": plan.num_edges / slots if slots else 0.0,
        "gather_expansion": plan.gather_rows / max(plan.num_edges, 1),
    }
