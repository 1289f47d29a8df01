"""Tuple-style compatibility API matching the reference signatures.

The reference public API (voltrix/spmm/spmm.py:16-114) is:

    blk_offsets, hspa_packed, hind = csr_preprocess(indptr, indices, num_nodes)
    out = spmm(blk_offsets, hspa_packed, hind, num_nodes, num_edges, feat)

This module offers the same call shapes on top of the plan-object API so
reference users can port call sites mechanically. The payloads line up:
`blk_offsets` = block prefix per window (Pointer1), `hspa_packed` = the
packed bitmask, `hind` = the gather map.
"""

from __future__ import annotations

import numpy as np

from .format.plan import PlanConfig, SpmmPlan
from .format.preprocess import csr_preprocess as _csr_preprocess
from .ops import spmm as _spmm

# Default tile geometry (the reference's 16x8 GPU tiles become MXU-sized
# tiles on TPU; voltrix/spmm/spmm.py:12-13).
BLK_H = PlanConfig().block_h
BLK_W = PlanConfig().block_w

class _BlkOffsets(np.ndarray):
    """ndarray that carries its SpmmPlan, so `spmm_tuple` can recover the
    metadata the tuple API doesn't transport. Attaching the plan to the
    array itself (instead of a global id()-keyed registry) makes the
    plan's lifetime exactly the array's: no unbounded growth, and a
    recycled id() can never alias a *different* matrix's plan (r1
    advisor finding)."""

    _voltrix_plan: SpmmPlan


def csr_preprocess_tuple(indptr, indices, num_nodes: int, config=None):
    """Returns (blk_offsets, hspa_packed, hind) like the reference."""
    plan = _csr_preprocess(indptr, indices, num_nodes, config or PlanConfig())
    blk_offsets = np.asarray(plan.block_ptr).view(_BlkOffsets)
    blk_offsets._voltrix_plan = plan
    return blk_offsets, np.asarray(plan.bitmask), np.asarray(plan.hind)


def spmm_tuple(blk_offsets, hspa_packed, hind, num_nodes, num_edges, feat):
    """Reference-signature SpMM (voltrix/spmm/spmm.py:92-114)."""
    plan = getattr(blk_offsets, "_voltrix_plan", None)
    if plan is None:
        # tuple arrays from elsewhere: rebuild the plan wrapper
        hspa_packed = np.asarray(hspa_packed)
        total_blocks, words, block_w = hspa_packed.shape
        block_h = words * 32
        blk_offsets = np.asarray(blk_offsets)
        num_windows = blk_offsets.shape[0] - 1
        # the tuple protocol does not carry block_h; it is recovered as
        # words*32, which is only sound when the window count agrees —
        # sub-32 block heights (words == 1 can mean 8/16/32) would be
        # silently mis-addressed otherwise
        assert num_windows == -(-num_nodes // block_h), (
            f"cannot reconstruct plan geometry: {num_windows} windows is "
            f"inconsistent with block_h={block_h} over {num_nodes} nodes; "
            "pass arrays produced by csr_preprocess_tuple (same process) "
            "or use the plan-object API"
        )
        bpw = np.diff(blk_offsets.astype(np.int64))
        plan = SpmmPlan(
            bitmask=hspa_packed,
            hind=np.asarray(hind).reshape(total_blocks, block_w),
            window_of_block=np.repeat(
                np.arange(num_windows, dtype=np.int32), bpw
            ),
            block_ptr=blk_offsets.astype(np.int32),
            config=PlanConfig(block_h, block_w),
            num_nodes=num_nodes,
            num_edges=num_edges,
            num_windows=num_windows,
            total_blocks=total_blocks,
            has_empty_windows=bool((bpw == 0).any()),
        )
    assert plan.num_nodes == num_nodes
    return _spmm(plan, feat)
