"""Neighbor-sampled mini-batch blocks (the GraphSAGE training protocol).

The reference's kernels serve full-graph GNN aggregation
(bmat_kernels.cuh:16-20); production GraphSAGE trains on sampled
bipartite blocks instead — per batch of seed nodes, sample <= fanout
neighbors per hop and aggregate over the sampled edges only. This
module builds those blocks as rectangular SpMM plans (num_dst rows
gathering from num_src source rows, `csr_preprocess(num_cols=...)`).

TPU-first design: every block is padded to a capacity derived ONLY from
the static batch geometry (seed count, fanouts, PlanConfig) — source
lists to `num_dst * (fanout + 1)` slots, plan block arrays to a
closed-form block cap — so every mini-batch of a given geometry has
identical shapes and the jitted train step traces exactly once
(asserted in tests). Padding is dead weight the kernel masks out:
zero-bitmask blocks, -1 source slots with zeroed features.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

from ..format.plan import PlanConfig, SpmmPlan
from ..format.preprocess import csr_preprocess


def _pad_plan_blocks(plan: SpmmPlan, cap: int, edge_cap: int) -> SpmmPlan:
    """Pad the plan's block arrays to `cap` total blocks with masked
    (zero-bitmask) blocks in the last window — same trick as the ring
    trainer's grid padding (parallel/ring.py `_pad_stack_grid`).

    ALL static metadata is canonicalized to geometry-derived values
    (num_edges -> edge_cap, has_empty_windows -> True): SpmmPlan's
    pytree aux is part of the jit cache key, so any batch-dependent
    field would silently retrace the train step every mini-batch
    (tested via `step._cache_size() == 1`)."""
    t = plan.total_blocks
    assert t <= cap, (t, cap)
    words, K = plan.config.words_per_col, plan.config.block_w
    bm = np.zeros((cap, words, K), np.uint32)
    bm[:t] = np.asarray(plan.bitmask)
    hi = np.zeros((cap, K), np.int32)
    hi[:t] = np.asarray(plan.hind)
    wob = np.full((cap,), plan.num_windows - 1, np.int32)
    wob[:t] = np.asarray(plan.window_of_block)
    bp = np.asarray(plan.block_ptr).copy()
    bp[-1] = cap
    return dataclasses.replace(
        plan,
        bitmask=bm,
        hind=hi,
        window_of_block=wob,
        block_ptr=bp,
        total_blocks=cap,
        num_edges=edge_cap,
        has_empty_windows=True,
    )


def block_caps(
    num_dst: int, num_src: int, fanout: int, config: PlanConfig
) -> tuple[int, int]:
    """Closed-form block caps for a sampled block and its transpose.

    Forward: a window of block_h dst rows references <= block_h * fanout
    distinct sources (and never more than num_src). Transpose: a window
    of source rows references at most num_dst distinct columns."""
    h, w = config.block_h, config.block_w
    nwin = -(-num_dst // h)
    cap_f = max(nwin * (-(-min(h * fanout, num_src) // w)), 1)
    nwin_t = -(-num_src // h)
    cap_t = max(nwin_t * (-(-num_dst // w)), 1)
    return cap_f, cap_t


@dataclass
class SampleBlock:
    """One sampled hop: dst rows aggregate from src rows. Source slot j
    < num_dst is dst j itself (self features = h[:num_dst]); padding
    slots carry src_ids == -1."""

    plan: SpmmPlan  # (num_dst x num_src) sampled adjacency
    plan_t: SpmmPlan  # transpose, for the backward SpMM
    inv_deg: np.ndarray  # float32 (num_dst, 1): 1 / max(sampled deg, 1)
    src_ids: np.ndarray  # int32 (num_src,) global ids, -1 = padding
    num_dst: int
    num_src: int


def sample_block(
    indptr,
    indices,
    dst_ids: np.ndarray,
    fanout: int,
    rng: np.random.Generator,
    config: PlanConfig = PlanConfig(32, 128),
) -> SampleBlock:
    """Sample <= fanout distinct neighbors per dst node (without
    replacement) and build the padded rectangular plans. dst_ids may
    contain -1 padding rows (they sample nothing)."""
    import scipy.sparse as sp

    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    dst_ids = np.asarray(dst_ids, np.int64)
    num_dst = len(dst_ids)
    num_src = num_dst * (fanout + 1)

    src_ids = np.full(num_src, -1, np.int64)
    src_ids[:num_dst] = dst_ids
    src_index: dict[int, int] = {}
    for j, gid in enumerate(dst_ids):
        if gid >= 0 and gid not in src_index:
            src_index[int(gid)] = j
    next_slot = num_dst

    rows, cols = [], []
    inv_deg = np.ones((num_dst, 1), np.float32)
    for i, gid in enumerate(dst_ids):
        if gid < 0:
            continue
        lo, hi = int(indptr[gid]), int(indptr[gid + 1])
        deg = hi - lo
        if deg == 0:
            continue
        k = min(fanout, deg)
        sel = (
            np.arange(deg)
            if deg <= fanout
            else rng.choice(deg, size=k, replace=False)
        )
        inv_deg[i, 0] = 1.0 / k
        for nb in indices[lo:hi][sel]:
            nb = int(nb)
            j = src_index.get(nb)
            if j is None:
                j = next_slot
                src_index[nb] = j
                src_ids[j] = nb
                next_slot += 1
            rows.append(i)
            cols.append(j)

    a = sp.csr_matrix(
        (
            np.ones(len(rows), np.float32),
            (np.asarray(rows, np.int64), np.asarray(cols, np.int64)),
        ),
        shape=(num_dst, num_src),
    )
    a.sum_duplicates()
    at = a.T.tocsr()
    cap_f, cap_t = block_caps(num_dst, num_src, fanout, config)
    edge_cap = num_dst * fanout
    plan = _pad_plan_blocks(
        csr_preprocess(
            a.indptr, a.indices, num_dst, config, num_cols=num_src
        ),
        cap_f,
        edge_cap,
    )
    plan_t = _pad_plan_blocks(
        csr_preprocess(
            at.indptr, at.indices, num_src, config, num_cols=num_dst
        ),
        cap_t,
        edge_cap,
    )
    return SampleBlock(
        plan=plan,
        plan_t=plan_t,
        inv_deg=inv_deg,
        src_ids=src_ids.astype(np.int32),
        num_dst=num_dst,
        num_src=num_src,
    )


def sample_blocks(
    indptr,
    indices,
    seeds: np.ndarray,
    fanouts: list[int],
    rng: np.random.Generator,
    config: PlanConfig = PlanConfig(32, 128),
) -> list[SampleBlock]:
    """Layered sampling: fanouts[-1] samples the seed hop, fanouts[0]
    the deepest. Returns blocks input-side first (blocks[0] consumes raw
    features; blocks[-1] emits seed rows), each hop's dst list being the
    previous hop's full padded source list — so geometry, and therefore
    every array shape, is a pure function of (len(seeds), fanouts)."""
    blocks: list[SampleBlock] = []
    dst = np.asarray(seeds, np.int64)
    for f in reversed(fanouts):
        blk = sample_block(indptr, indices, dst, f, rng, config)
        blocks.append(blk)
        dst = blk.src_ids.astype(np.int64)
    return list(reversed(blocks))


def gather_features(x: np.ndarray, src_ids: np.ndarray) -> np.ndarray:
    """Fetch feature rows for a padded source list (-1 slots -> zeros)."""
    x = np.asarray(x)
    ids = np.asarray(src_ids)
    out = x[np.clip(ids, 0, x.shape[0] - 1)]
    out = np.where((ids >= 0)[:, None], out, 0.0).astype(x.dtype)
    return out
