"""Edge-per-lane (ELL) plan — O(nnz) weighted sparse format.

The round-2 weighted extension stored a dense (total_blocks, block_h,
block_w) value plane aligned with the bitmask — expanded-slot bytes,
100x+ of nnz at power-law fill ratios. This format applies the
reference's compression discipline (its bitmask packs A at 32x,
bmat_kernels.cuh:151-193) to *values*: every edge owns exactly one
128-wide lane slot, so value memory is exactly 4 bytes/edge (plus
per-window padding to the lane width).

Layout: rows of A are grouped into windows of ``block_h`` rows (as in
`SpmmPlan`), but lanes are *edges*, not deduplicated columns. Within a
window, edges are sorted by (column, row) — gather locality — and laid
out contiguously across that window's blocks of ``block_w`` lanes:

  hind[b, l]  int32  source row of X feeding lane l (column of A)
  erow[b, l]  int32  window-local destination row of lane l (-1 padding)
  vals[b, l]  f32    edge value (0.0 on padding lanes — padding is
                     self-killing, no bitmask needed)

The kernel rebuilds the dense (block_h, block_w) value tile in-register
with a broadcast compare — ``(row_iota == erow) * vals`` — a pure VPU
select, no scatter, then one MXU pass ``tile @ xg``. That construction
is the TPU answer to the reference's bitmask->fragment lane test
(spmm_kernels.cuh:1632-1644): one predicate per vreg element, zero
gather.

Because lanes are raw CSR edges (no dedup), a binary ELL plan (values
omitted -> 1.0) doubles as the GE-SpMM-role row-parallel CSR baseline
(reference bench/scripts/gespmm.cu:469-786): same math, none of the
binned-bitmask format's compression — exactly the control an honest
"the format is the win" comparison needs.

Trade-off vs the dense plane: duplicate columns within a window occupy
separate lanes, so gather volume and MXU passes scale with nnz instead
of deduplicated columns (dedup factor ~1-3x on GNN graphs); in exchange
the value memory drops from expanded-slot to O(nnz) and every graph the
binary path handles is now trainable with per-edge weights.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import numpy as np

from .plan import PlanConfig
from .preprocess import pad_empty_windows


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_pytree_node_class
@dataclass
class EllPlan:
    # --- array leaves (device-movable) ---
    hind: object  # int32 (total_blocks, block_w) source row per lane
    erow: object  # int32 (total_blocks, block_w) window-local dest row
    vals: object  # f32   (total_blocks, block_w) edge value (0 = padding)
    window_of_block: object  # int32 (total_blocks,)
    block_ptr: object  # int32 (num_windows + 1,)
    edge_lane: object  # int32 (nnz,) flat lane slot (block*K + lane) of
    # every CSR edge, in original CSR order — the differentiable hook:
    # vals = lane_values(plan, w) rebuilds the lane plane from per-edge
    # parameters inside jit (gather, gradients flow natively)
    lane_edge: object  # int32 (total_blocks * block_w,) inverse map,
    # -1 on padding lanes (gather beats scatter for plane construction)
    # --- static metadata ---
    config: PlanConfig
    num_nodes: int
    num_edges: int
    num_windows: int
    total_blocks: int
    has_empty_windows: bool = False
    num_cols: int | None = None  # rectangular: X row-space size

    def tree_flatten(self):
        children = (
            self.hind, self.erow, self.vals, self.window_of_block,
            self.block_ptr, self.edge_lane, self.lane_edge,
        )
        aux = (
            self.config, self.num_nodes, self.num_edges, self.num_windows,
            self.total_blocks, self.has_empty_windows, self.num_cols,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def padded_nodes(self) -> int:
        return self.num_windows * self.config.block_h

    @property
    def source_rows(self) -> int:
        return self.num_cols if self.num_cols is not None else self.num_nodes

    @property
    def gather_rows(self) -> int:
        return self.total_blocks * self.config.block_w

    def device(self) -> "EllPlan":
        import jax as _jax

        # window-sliced sub-plans drop the edge maps (None) — keep them
        put = lambda a: None if a is None else _jax.device_put(np.asarray(a))
        return dataclasses.replace(
            self,
            hind=put(self.hind),
            erow=put(self.erow),
            vals=put(self.vals),
            window_of_block=put(self.window_of_block),
            block_ptr=put(self.block_ptr),
            edge_lane=put(self.edge_lane),
            lane_edge=put(self.lane_edge),
        )

    def save(self, path: str) -> str:
        """Serialize to one .npz (same preprocess-once/serve-many
        contract as `SpmmPlan.save`; atomic pid-unique replace)."""
        import json
        import os

        header = json.dumps(
            {
                "config": dataclasses.asdict(self.config),
                "num_nodes": self.num_nodes,
                "num_edges": self.num_edges,
                "num_windows": self.num_windows,
                "total_blocks": self.total_blocks,
                "has_empty_windows": self.has_empty_windows,
                "num_cols": self.num_cols,
            }
        )
        arrays = {
            "hind": np.asarray(self.hind),
            "erow": np.asarray(self.erow),
            "vals": np.asarray(self.vals),
            "window_of_block": np.asarray(self.window_of_block),
            "block_ptr": np.asarray(self.block_ptr),
            "header": np.frombuffer(header.encode(), np.uint8),
        }
        if self.edge_lane is not None:
            arrays["edge_lane"] = np.asarray(self.edge_lane)
        if self.lane_edge is not None:
            arrays["lane_edge"] = np.asarray(self.lane_edge)
        if not path.endswith(".npz"):
            path += ".npz"
        tmp = f"{path}.tmp.{os.getpid()}.npz"
        np.savez(tmp.removesuffix(".npz"), **arrays)
        os.replace(tmp, path)
        return path

    @classmethod
    def load(cls, path: str) -> "EllPlan":
        import json

        with np.load(path) as z:
            meta = json.loads(bytes(z["header"]).decode())
            cfg = PlanConfig(**meta.pop("config"))
            return cls(
                hind=z["hind"],
                erow=z["erow"],
                vals=z["vals"],
                window_of_block=z["window_of_block"],
                block_ptr=z["block_ptr"],
                edge_lane=z["edge_lane"] if "edge_lane" in z else None,
                lane_edge=z["lane_edge"] if "lane_edge" in z else None,
                config=cfg,
                **meta,
            )


def csr_preprocess_ell(
    indptr,
    indices,
    num_nodes: int,
    config: PlanConfig = PlanConfig(128, 128),
    values=None,
    num_cols: int | None = None,
) -> EllPlan:
    """Build an `EllPlan` from CSR adjacency.

    values: per-edge weights aligned with `indices`; omitted -> binary
    (1.0) — the row-parallel CSR baseline configuration. Duplicate
    (row, col) entries keep separate lanes, so their contributions sum
    in the matmul (scipy CSR convention) with no dedup pass at all.
    """
    assert config.gather_segment == 1, "ELL lanes are exact edges"
    assert not config.cluster_cols
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    assert indptr.ndim == 1 and indptr.shape[0] == num_nodes + 1
    H, K = config.block_h, config.block_w
    num_windows = max(_cdiv(num_nodes, H), 1)
    nnz = int(indices.shape[0])
    if values is not None:
        values = np.asarray(values, dtype=np.float32)
        assert values.shape == indices.shape

    deg = np.diff(indptr)
    rows = np.repeat(np.arange(num_nodes, dtype=np.int64), deg)
    cols = indices
    win = rows // H

    # edges per window -> blocks per window (the blockPartition/Pointer1
    # analogue, reference bmat_kernels.cuh:298-319, counting edges
    # instead of deduplicated columns)
    epw = np.bincount(win, minlength=num_windows) if nnz else np.zeros(
        num_windows, np.int64
    )
    blocks_per_window = -(-epw // K)
    if config.block_unroll > 1:
        u = config.block_unroll
        blocks_per_window = -(-blocks_per_window // u) * u
    blocks_per_window = pad_empty_windows(
        blocks_per_window, config.block_unroll
    )
    block_ptr = np.zeros(num_windows + 1, dtype=np.int64)
    np.cumsum(blocks_per_window, out=block_ptr[1:])
    total_blocks = int(block_ptr[-1])

    hind = np.zeros(total_blocks * K, np.int32)
    # padding lanes get erow = -1: they can never match the kernel's row
    # iota, so they contribute zero in the forward AND receive zero lane
    # gradients in spmm_ell_dvals (vals = 0 alone would only fix forward)
    erow = np.full(total_blocks * K, -1, np.int32)
    vals = np.zeros(total_blocks * K, np.float32)
    lane_edge = np.full(total_blocks * K, -1, np.int32)
    edge_lane = np.zeros(nnz, np.int32)

    if nnz:
        # (window, col, row) sort: lanes of one window are contiguous and
        # column-sorted, so the XLA row gather walks X near-sequentially
        order = np.lexsort((rows, cols, win))
        win_s = win[order]
        win_start = np.zeros(num_windows + 1, dtype=np.int64)
        np.cumsum(epw, out=win_start[1:])
        p_local = np.arange(nnz, dtype=np.int64) - win_start[win_s]
        slot = block_ptr[win_s] * K + p_local
        hind[slot] = cols[order].astype(np.int32)
        erow[slot] = (rows[order] % H).astype(np.int32)
        vals[slot] = 1.0 if values is None else values[order]
        lane_edge[slot] = order.astype(np.int32)
        edge_lane[order] = slot.astype(np.int32)

    window_of_block = np.repeat(
        np.arange(num_windows, dtype=np.int32), blocks_per_window
    )
    return EllPlan(
        hind=hind.reshape(total_blocks, K),
        erow=erow.reshape(total_blocks, K),
        vals=vals.reshape(total_blocks, K),
        window_of_block=window_of_block,
        block_ptr=block_ptr.astype(np.int32),
        edge_lane=edge_lane,
        lane_edge=lane_edge,
        config=config,
        num_nodes=num_nodes,
        num_edges=nnz,
        num_windows=num_windows,
        total_blocks=total_blocks,
        has_empty_windows=bool((blocks_per_window == 0).any()),
        num_cols=num_cols,
    )


def lane_values(plan: EllPlan, w):
    """Per-edge parameters (nnz,) -> lane plane (total_blocks, block_w).

    A gather through `lane_edge` (clipped; padding lanes masked to 0),
    fully differentiable — the learned-edge-weight hook (GAT attention,
    DropEdge masks, learned normalizations)."""
    import jax.numpy as jnp

    le = jnp.asarray(plan.lane_edge)
    plane = jnp.take(w, jnp.maximum(le, 0), mode="clip")
    plane = jnp.where(le >= 0, plane, 0)
    return plane.reshape(plan.total_blocks, plan.config.block_w).astype(
        w.dtype
    )


def edge_values(plan: EllPlan, plane=None):
    """Lane plane -> per-edge vector (nnz,) in original CSR edge order
    (inverse of `lane_values`). plane=None reads plan.vals."""
    import jax.numpy as jnp

    if plane is None:
        plane = plan.vals
    return jnp.asarray(plane).reshape(-1)[jnp.asarray(plan.edge_lane)]


def slice_ell_windows(plan: EllPlan, num_chunks: int) -> list[EllPlan]:
    """Split an EllPlan into window-contiguous sub-plans balanced by
    block count (the stream.py analogue): each sub-plan's gather
    materializes, feeds the kernel, and is freed before the next —
    bounded peak HBM on reddit-class graphs."""
    bp = np.asarray(plan.block_ptr, dtype=np.int64)
    num_chunks = max(1, min(num_chunks, plan.num_windows))
    targets = [
        round(plan.total_blocks * (i + 1) / num_chunks)
        for i in range(num_chunks)
    ]
    cuts = np.unique(np.searchsorted(bp, targets, side="left"))
    cuts = cuts[(cuts > 0) & (cuts <= plan.num_windows)]
    bounds = np.concatenate([[0], cuts])
    if bounds[-1] != plan.num_windows:
        bounds = np.concatenate([bounds, [plan.num_windows]])
    subs = []
    for w0, w1 in zip(bounds[:-1], bounds[1:]):
        b0, b1 = int(bp[w0]), int(bp[w1])
        nwin = int(w1 - w0)
        nrows = min(
            plan.num_nodes - int(w0) * plan.config.block_h,
            nwin * plan.config.block_h,
        )
        sub_bp = (bp[w0 : w1 + 1] - b0).astype(np.int32)
        subs.append(
            EllPlan(
                hind=plan.hind[b0:b1],
                erow=plan.erow[b0:b1],
                vals=plan.vals[b0:b1],
                window_of_block=np.asarray(plan.window_of_block)[b0:b1]
                - int(w0),
                block_ptr=sub_bp,
                edge_lane=None,  # slot indices shift; per-edge hooks
                lane_edge=None,  # operate on the unsliced plan
                config=plan.config,
                num_nodes=nrows,
                num_edges=-1,
                num_windows=nwin,
                total_blocks=b1 - b0,
                has_empty_windows=bool(
                    (np.diff(np.asarray(sub_bp)) == 0).any()
                ),
                num_cols=plan.source_rows,
            )
        )
    return subs


def ell_transpose(
    indptr, indices, num_nodes: int, values=None,
    config: PlanConfig | None = None, num_cols: int | None = None,
) -> EllPlan:
    """EllPlan of A^T built straight from A's CSR (host counting sort,
    see preprocess.csr_transpose)."""
    from .preprocess import csr_transpose

    ptr_t, idx_t, vals_t = csr_transpose(
        indptr, indices, num_nodes, values=values, num_cols=num_cols
    )
    span = num_cols if num_cols is not None else num_nodes
    cfg = config if config is not None else PlanConfig(128, 128)
    return csr_preprocess_ell(
        ptr_t, idx_t, span, cfg, values=vals_t, num_cols=num_nodes
    )


def build_ell_pair(
    indptr,
    indices,
    num_nodes: int,
    values=None,
    config: PlanConfig = PlanConfig(128, 128),
    config_t: PlanConfig | None = None,
    num_cols: int | None = None,
) -> tuple[EllPlan, EllPlan]:
    """(plan, plan_t) for A and A^T with BOTH plans' edge maps expressed
    in A's original CSR edge order, so per-edge parameters (attention
    weights, dropout masks) feed either side through `lane_values`
    directly — the contract `spmm_ell_ad`/`sddmm_ell_ad` require."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    plan = csr_preprocess_ell(
        indptr, indices, num_nodes, config, values=values, num_cols=num_cols
    )
    plan_t = ell_transpose(
        indptr, indices, num_nodes, values=values,
        config=config_t if config_t is not None else config,
        num_cols=num_cols,
    )
    # rebase plan_t's edge maps: transpose-CSR position p is original
    # edge t_order[p] (csr_transpose's stable counting sort)
    t_order = np.argsort(indices, kind="stable").astype(np.int64)
    el_t = np.asarray(plan_t.edge_lane)
    le_t = np.asarray(plan_t.lane_edge)
    edge_lane = np.zeros_like(el_t)
    edge_lane[t_order] = el_t
    lane_edge = np.where(le_t >= 0, t_order[np.maximum(le_t, 0)], -1).astype(
        np.int32
    )
    plan_t = dataclasses.replace(
        plan_t, edge_lane=edge_lane, lane_edge=lane_edge
    )
    return plan, plan_t


def ell_stats(plan: EllPlan) -> dict:
    """Packing statistics (reference TC_Blocks/Exp_Edges analogue)."""
    slots = plan.total_blocks * plan.config.block_w
    return {
        "num_nodes": plan.num_nodes,
        "nnz": plan.num_edges,
        "num_windows": plan.num_windows,
        "total_blocks": plan.total_blocks,
        "lane_slots": slots,
        "lane_fill": plan.num_edges / slots if slots else 0.0,
        "value_bytes_per_edge": 4.0 * slots / max(plan.num_edges, 1),
    }
