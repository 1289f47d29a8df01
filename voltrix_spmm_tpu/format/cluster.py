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
    sits in changes.

    gather_segment == q > 1: lanes are sorted in RUN units of q (run
    signature = OR of member lanes, key column = the run head) so the
    q-aligned runs the packed gather depends on survive the permutation
    intact."""
    cfg = plan.config
    q = cfg.gather_segment
    assert cfg.block_h % SUBWIN_ROWS == 0, cfg.block_h
    if plan.total_blocks == 0:
        return plan

    bm = np.asarray(plan.bitmask)
    hind = np.asarray(plan.hind)
    tb, words, k = bm.shape

    sig_lane = lane_signatures(bm).reshape(-1)  # (TB*K,) lane-major
    nruns = tb * k // q
    sig = np.bitwise_or.reduce(sig_lane.reshape(nruns, q), axis=1)
    col = hind.reshape(nruns, q)[:, 0].astype(np.int64)
    # blocks of a window are contiguous in flat block order, so runs of a
    # window are contiguous in (block, lane) flat order (K % q == 0 —
    # runs never straddle blocks)
    run_win = np.repeat(
        np.asarray(plan.window_of_block), k // q
    ).astype(np.int64)
    empty = sig == 0  # padding runs -> window tail -> skippable blocks
    order = np.lexsort((col, sig, empty, run_win))
    lane_order = (
        order[:, None] * q + np.arange(q, dtype=order.dtype)[None, :]
    ).reshape(-1)

    new_hind = np.ascontiguousarray(
        hind.reshape(-1)[lane_order].reshape(tb, k)
    )
    lanes = bm.transpose(0, 2, 1).reshape(tb * k, words)
    new_bm = np.ascontiguousarray(
        lanes[lane_order].reshape(tb, k, words).transpose(0, 2, 1)
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


# ---------------------------------------------------------------------------
# Packed-subtile bitmask transport
#
# At power-law fill the clustered bitmask is ~80% empty sub-tiles
# (measured occupancy 0.197 at rmat-19 h2048 -> 1.6 GB dense), and the
# plan transfer dominates cold start through the device relay. The pack
# ships ONLY the occupied 128-row sub-tiles plus their int32 ids and
# rebuilds the dense bitmask ON DEVICE with a single scatter — the
# kernels keep their dense static-shape contract, the wire/disk pays
# O(occupied) bytes.


def pack_bitmask(bitmask: np.ndarray):
    """(TB, words, K) -> (packed (S, 4, K) uint32, ids (S,) int32, nsub)
    where S = occupied sub-tile count and ids index the (TB*nsub) flat
    sub-tile space. Requires words % 4 == 0 (block_h % 128 == 0)."""
    bm = np.asarray(bitmask)
    tb, words, k = bm.shape
    assert words % _WORDS_PER_SUB == 0, (words,)
    nsub = words // _WORDS_PER_SUB
    sub = bm.reshape(tb * nsub, _WORDS_PER_SUB, k)
    occupied = (sub != 0).any(axis=(1, 2))
    ids = np.nonzero(occupied)[0].astype(np.int32)
    return np.ascontiguousarray(sub[ids]), ids, nsub


def unpack_bitmask_np(packed, ids, total_blocks: int, words: int, k: int):
    """Host-side inverse of `pack_bitmask` (test oracle)."""
    nsub = words // _WORDS_PER_SUB
    dense = np.zeros((total_blocks * nsub, _WORDS_PER_SUB, k), np.uint32)
    dense[np.asarray(ids)] = np.asarray(packed)
    return dense.reshape(total_blocks, words, k)


def unpack_bitmask_device(packed, ids, total_blocks: int, words: int, k: int):
    """Device-side inverse: one XLA scatter, jit-safe."""
    import jax.numpy as jnp

    nsub = words // _WORDS_PER_SUB
    dense = jnp.zeros(
        (total_blocks * nsub, _WORDS_PER_SUB, k), jnp.uint32
    )
    dense = dense.at[jnp.asarray(ids)].set(jnp.asarray(packed))
    return dense.reshape(total_blocks, words, k)


def packed_stats(bitmask: np.ndarray) -> dict:
    packed, ids, _ = pack_bitmask(bitmask)
    dense_b = np.asarray(bitmask).nbytes
    packed_b = packed.nbytes + ids.nbytes
    return {
        "dense_bytes": int(dense_b),
        "packed_bytes": int(packed_b),
        "saving": 1.0 - packed_b / max(dense_b, 1),
    }
