"""Two-level windows: within-window column clustering.

Tall windows (block_h >= 1024) win on gather volume (dedup) but multiply
MXU waste: at h2048 the bitmask fill is ~0.3%, so >99% of every
(block_h, K) @ (K, D) pass is zeros. Skipping empty 128-row sub-tiles
(`spmm_pallas(..., subtile=True)`) failed on raw plans because each
block's K columns scatter bits across nearly all sub-windows (measured
occupancy 14/16 on R-MAT).

The fix is a *column* permutation, not a row one: within each window,
reorder the compressed columns so lanes whose bits live in the same
128-row sub-windows land in the same blocks. Sorting lanes by their
sub-window *signature* (bit s set iff the lane has any bit in sub-window
s) groups single-sub-window lanes — the common case on locality-ordered
graphs — into blocks whose union signature has few bits, which the
subtile kernel then skips. All-zero (padding) lanes sort to the window
tail, so `block_unroll` padding blocks become occupancy-0 and are
skipped entirely.

This is pure lane bookkeeping: a lane permutation within a window moves
(hind[lane], bitmask[:, lane]) pairs together, every block still
accumulates into the same window output, and the gather volume/order of
magnitude is untouched. It is this framework's answer to the
reference's dense-packed balanced tiles (bmat_kernels.cuh:264-320) taken
to a second level: the reference packs distinct columns densely into
tiles; we additionally pack their *row extents* densely into sub-tiles.

Requires gather_segment == 1 (exact lanes; permuting seg-run lanes would
break run alignment) and block_h % 128 == 0 (the sub-window unit).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .plan import SpmmPlan

SUBWIN_ROWS = 128  # sub-window height = MXU tile rows = 4 bitmask words
_WORDS_PER_SUB = SUBWIN_ROWS // 32


def lane_signatures(bitmask: np.ndarray) -> np.ndarray:
    """(TB, words, K) -> int64 (TB, K): bit s set iff the lane has any
    bit in 128-row sub-window s."""
    tb, words, k = bitmask.shape
    nsub = words // _WORDS_PER_SUB
    assert nsub * _WORDS_PER_SUB == words, (words,)
    sub_any = (
        bitmask.reshape(tb, nsub, _WORDS_PER_SUB, k).any(axis=2)
    )  # (TB, nsub, K)
    weights = (np.int64(1) << np.arange(nsub, dtype=np.int64))
    return (sub_any * weights[None, :, None]).sum(axis=1)


def cluster_window_columns(plan: SpmmPlan) -> SpmmPlan:
    """Return a plan with each window's lanes re-sorted by sub-window
    signature (empty lanes last, ties broken by column id for gather
    locality). Output of `spmm` is IDENTICAL; only which block a lane
    sits in changes."""
    cfg = plan.config
    assert cfg.gather_segment == 1, "clustering requires an exact plan"
    assert cfg.block_h % SUBWIN_ROWS == 0, cfg.block_h
    if plan.total_blocks == 0:
        return plan

    bm = np.asarray(plan.bitmask)
    hind = np.asarray(plan.hind)
    tb, words, k = bm.shape

    sig = lane_signatures(bm).reshape(-1)  # (TB*K,) lane-major per block
    col = hind.reshape(-1)
    # blocks of a window are contiguous in flat block order, so lanes of a
    # window are contiguous in (block, lane) flat order
    lane_win = np.repeat(np.asarray(plan.window_of_block), k).astype(np.int64)
    empty = sig == 0  # padding lanes -> window tail -> skippable blocks
    order = np.lexsort((col, sig, empty, lane_win))

    new_hind = np.ascontiguousarray(col[order].reshape(tb, k))
    lanes = bm.transpose(0, 2, 1).reshape(tb * k, words)
    new_bm = np.ascontiguousarray(
        lanes[order].reshape(tb, k, words).transpose(0, 2, 1)
    )
    return dataclasses.replace(plan, bitmask=new_bm, hind=new_hind)


def block_occupancy(bitmask: np.ndarray) -> np.ndarray:
    """(TB, words, K) -> int32 (TB,): bit s set iff 128-row sub-window s
    of the block carries any bit (the subtile kernel's skip bitmap)."""
    union = np.bitwise_or.reduce(lane_signatures(bitmask), axis=1)
    return union.astype(np.uint32).view(np.int32)


def subtile_stats(plan: SpmmPlan) -> dict:
    """Occupied-subtile accounting: what the subtile kernel will pay.

    `occupied_subtiles` counts (block, 128-row sub-window) pairs with any
    bit — each costs one (128, K) @ (K, D) MXU pass + mask expand. The
    dense kernel always pays `total_blocks * nsub`."""
    cfg = plan.config
    nsub = cfg.block_h // SUBWIN_ROWS
    if plan.total_blocks == 0:
        return {"occupied_subtiles": 0, "total_subtiles": 0, "occupancy": 0.0}
    sig = lane_signatures(np.asarray(plan.bitmask))  # (TB, K)
    union = np.bitwise_or.reduce(sig, axis=1)  # (TB,)
    occ = np.array(
        [bin(int(u)).count("1") for u in union], dtype=np.int64
    ).sum()
    total = plan.total_blocks * nsub
    return {
        "occupied_subtiles": int(occ),
        "total_subtiles": int(total),
        "occupancy": float(occ) / total,
    }
