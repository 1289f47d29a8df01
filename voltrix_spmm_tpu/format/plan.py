"""The binned block-CSR plan — the TPU-native sparse format.

This is the TPU redesign of the reference's preprocessed format
(reference: voltrix/spmm/spmm.py:16-89 returns `(pointer1, hspa_packed,
hind)` built from 16x8 tensor-core tiles). On TPU the natural tile is
MXU-sized, so the format is parameterized by a row-window height
``block_h`` (default 128 = MXU rows) and a column-block width ``block_w``
(default 128 = MXU contraction dim):

- Rows of A are grouped into windows of ``block_h`` consecutive rows.
- Within a window, the set of *distinct* neighbor column ids is sorted and
  compressed (the "balanced" packing, reference bmat_kernels.cuh:264-320);
  every ``block_w`` of them form one block.
- Per block we store:
  * ``hind[b, j]``   — source row of X feeding compressed column j
                       (reference `hind`, bmat_kernels.cuh:93-108), and
  * ``bitmask[b, w, j]`` — a row-packed presence bitmask: bit ``s`` of word
    ``w`` at lane ``j`` set iff A[window_row (w*32+s), hind[b, j]] == 1.
    This is the lane-layout redesign of the reference's MMA-swizzled pack
    (bmat_kernels.cuh:151-193): words are packed along *rows* (sublanes)
    so the Pallas kernel expands bits with a single broadcasted
    shift/AND over an (8,128)-tiled vreg, no gather.

``block_ptr`` is the exclusive block prefix sum per window (reference
`Pointer1`), and ``window_of_block`` flattens the ragged windows so a
Pallas grid can walk blocks with static shapes.

The plan is a JAX pytree: array leaves travel to the device, metadata is
static, so ``jax.jit(spmm)`` accepts a plan directly.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _jit_unpack_bitmask(packed, ids, total_blocks: int, words: int, k: int):
    from .cluster import unpack_bitmask_device

    return unpack_bitmask_device(packed, ids, total_blocks, words, k)


@dataclass(frozen=True)
class PlanConfig:
    """Tile geometry for the block-CSR plan.

    block_h: rows of A per window (MXU output rows). Multiple of 8.
    block_w: compressed columns per block (MXU contraction). Multiple of 128
             for the device kernel; the format itself accepts any value.
    gather_segment: source-row coverage granularity. 1 = exact (each lane
        is one deduped neighbor). s > 1 covers the window's neighbor set
        with s-aligned runs of s consecutive X rows, so the fused kernel
        fetches each run with ONE DMA (the TPU answer to the reference's
        TMA bulk copies of 8-row tiles, spmm_kernels.cuh:1563-1570) at
        the cost of gathering covered-but-absent rows (their mask bits
        are 0). Locality reordering (RCM/Rabbit) keeps the overhead low.
    """

    block_h: int = 128
    block_w: int = 128
    gather_segment: int = 1
    block_unroll: int = 1  # pad blocks/window to a multiple of this so
    # kernels can process `block_unroll` blocks per grid step (amortizes
    # per-step and MXU setup overhead); padding blocks carry zero bits
    cluster_cols: bool = False  # two-level windows: re-sort each window's
    # lanes by 128-row sub-window signature so the subtile kernel can skip
    # empty (128, K) sub-products (see format/cluster.py); semantics of
    # the plan are unchanged
    pack_order: str = "natural"  # source-column layout the seg-runs are
    # aligned in. "incidence": columns sorted at BUILD time by their
    # window-incidence bitset, so columns that co-occur across windows
    # land in the same q-run (measured: rmat-17 q=4 run-coverage ratio
    # 1.75 -> 1.31 vs natural/RCM order). The plan then carries
    # `src_perm` and the runtime pays one n-row feature permute per call
    # — trivial next to the plan's gather_rows (see
    # preprocess.incidence_order).
    seg_interleaved: bool = False  # seg>1 pregather only: lanes within
    # each block laid out j-major ([all run-offset-0 lanes | all
    # offset-1 | ...]) instead of run-major, so the kernel consumes the
    # (q*d)-wide packed gather DIRECTLY — per-j contiguous mask/xg
    # slices, q accumulated dots — with NO post-gather flatten. The
    # flatten copy rewrites the whole gathered array (measured the
    # dominant cost of packed variants at rmat-17 d256: packed q=2
    # raced 9.72 ms vs 6.40 ms seg1, bench/exp_split_rmat17.txt).
    # Incompatible with the fused kernel's run-contiguous DMA layout.

    def __post_init__(self):
        assert self.block_h > 0 and self.block_w > 0
        assert self.gather_segment >= 1
        assert self.block_w % self.gather_segment == 0
        assert self.block_unroll >= 1
        assert self.pack_order in ("natural", "incidence"), self.pack_order
        if self.pack_order == "incidence":
            # at seg=1 the gather fetches exactly the needed lanes in any
            # order — a permutation changes nothing but adds the n-row
            # permute, so reject it instead of silently wasting a gather
            assert self.gather_segment > 1, (
                "pack_order='incidence' only pays with gather_segment > 1"
            )
        if self.seg_interleaved:
            assert self.gather_segment > 1, (
                "seg_interleaved is a packed-gather (seg > 1) layout"
            )
            # block-granular interleave: each unroll-group's blocks are
            # grouped into q offset-planes of unroll//q blocks, so the
            # kernel's per-j mask is a concat of WHOLE blocks and its
            # xg slice is block_d-aligned — no Mosaic lane relayouts
            assert self.block_unroll % self.gather_segment == 0, (
                "seg_interleaved needs block_unroll % gather_segment == 0"
            )
        if self.cluster_cols:
            # seg > 1 clusters lane RUNS as units (run alignment — the
            # packed-gather contract of ops/pallas_spmm._gather_rows —
            # is preserved because members never split across a sort)
            assert self.block_h % 128 == 0, "clustering unit is 128 rows"

    @property
    def words_per_col(self) -> int:
        """uint32 words needed to pack block_h row-bits."""
        return -(-self.block_h // 32)


@jax.tree_util.register_pytree_node_class
@dataclass
class SpmmPlan:
    # --- array leaves (device-movable) ---
    bitmask: object  # uint32 (total_blocks, words_per_col, block_w)
    hind: object  # int32  (total_blocks, block_w) gathered source rows
    window_of_block: object  # int32 (total_blocks,)
    block_ptr: object  # int32 (num_windows + 1,)  exclusive block prefix
    # --- static metadata ---
    config: PlanConfig
    num_nodes: int
    num_edges: int  # deduplicated nnz actually represented
    num_windows: int
    total_blocks: int
    has_empty_windows: bool = False  # any window with zero blocks
    # rectangular support: source-node (column) space size; None = square.
    # Row-sharded execution uses shard rows x global columns.
    num_cols: int | None = None
    # per-block sub-window occupancy bitmap (int32 (total_blocks,), bit s
    # set iff 128-row sub-window s has any bit) — precomputed on the host
    # for cluster_cols plans so the subtile kernel's scalar prefetch is
    # free; None -> computed on the fly
    occ: object = None
    # weighted extension (the reference format is binary-only): per-edge
    # values as a dense (total_blocks, block_h, block_w) plane aligned
    # with the bitmask; the masked matmul becomes values @ xg (duplicate
    # CSR entries sum, scipy convention). None -> binary SpMM.
    values: object = None
    # pack_order="incidence" plans: int32 (source_rows,) permutation,
    # new position -> original source row (Xp = X[src_perm]); `hind`
    # then indexes the PERMUTED source. None = natural order. Consumers
    # other than the pregather gather must refuse plans carrying this
    # (their hind reads would silently fetch renamed rows).
    src_perm: object = None

    def tree_flatten(self):
        children = (
            self.bitmask, self.hind, self.window_of_block, self.block_ptr,
            self.occ, self.values, self.src_perm,
        )
        aux = (
            self.config,
            self.num_nodes,
            self.num_edges,
            self.num_windows,
            self.total_blocks,
            self.has_empty_windows,
            self.num_cols,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        bm, hind, wob, bptr, occ, values, src_perm = children
        return cls(
            bm, hind, wob, bptr, *aux,
            occ=occ, values=values, src_perm=src_perm,
        )

    # number of padded rows the kernel computes before slicing back to N
    @property
    def padded_nodes(self) -> int:
        return self.num_windows * self.config.block_h

    @property
    def source_rows(self) -> int:
        """Rows of X this plan gathers from (column space of A)."""
        return self.num_cols if self.num_cols is not None else self.num_nodes

    @property
    def gather_rows(self) -> int:
        """Total X rows gathered per full pass (the 'Exp_Edges' analogue)."""
        return self.total_blocks * self.config.block_w

    def save(self, path: str, packed: bool = False) -> str:
        """Serialize the plan to one .npz (preprocess once, serve from
        many processes — at reddit scale preprocessing is seconds-to-
        minutes while loading is an mmap'd read). Geometry travels in a
        header array; `SpmmPlan.load` restores the exact plan.

        packed=True stores only the occupied 128-row bitmask sub-tiles
        (~80% smaller at power-law fill; requires block_h % 128 == 0);
        load() rebuilds the dense bitmask transparently."""
        import json

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
            "window_of_block": np.asarray(self.window_of_block),
            "block_ptr": np.asarray(self.block_ptr),
            "header": np.frombuffer(header.encode(), np.uint8),
        }
        if packed and self.config.block_h % 128 == 0:
            from .cluster import pack_bitmask

            pk, ids, _ = pack_bitmask(np.asarray(self.bitmask))
            arrays["bitmask_packed"] = pk
            arrays["bitmask_ids"] = ids
        else:
            arrays["bitmask"] = np.asarray(self.bitmask)
        if self.occ is not None:
            arrays["occ"] = np.asarray(self.occ)
        if self.values is not None:
            arrays["values"] = np.asarray(self.values)
        if self.src_perm is not None:
            arrays["src_perm"] = np.asarray(self.src_perm)
        if not path.endswith(".npz"):
            path += ".npz"
        import os

        # pid-unique tmp so concurrent saves of the same path never
        # interleave partial writes before the atomic replace
        tmp = f"{path}.tmp.{os.getpid()}.npz"
        np.savez(tmp.removesuffix(".npz"), **arrays)
        os.replace(tmp, path)
        return path

    @classmethod
    def load(cls, path: str) -> "SpmmPlan":
        import json

        with np.load(path) as z:
            meta = json.loads(bytes(z["header"]).decode())
            cfg = PlanConfig(**meta.pop("config"))
            if "bitmask_packed" in z:
                from .cluster import unpack_bitmask_np

                bitmask = unpack_bitmask_np(
                    z["bitmask_packed"], z["bitmask_ids"],
                    meta["total_blocks"], cfg.words_per_col, cfg.block_w,
                )
            else:
                bitmask = z["bitmask"]
            return cls(
                bitmask=bitmask,
                hind=z["hind"],
                window_of_block=z["window_of_block"],
                block_ptr=z["block_ptr"],
                config=cfg,
                occ=z["occ"] if "occ" in z else None,
                values=z["values"] if "values" in z else None,
                src_perm=z["src_perm"] if "src_perm" in z else None,
                **meta,
            )

    def device_packed(self) -> "SpmmPlan":
        """Move to device shipping only the OCCUPIED 128-row sub-tiles
        of the bitmask (host pack -> one device scatter rebuilds the
        dense array the kernels need). At power-law fill the transfer
        drops ~80% (measured: rmat-19 h2048 clustered, 1.6 GB -> 333 MB)
        — cold start through the device relay is transfer-dominated.
        Falls back to .device() when block_h is not a 128 multiple."""
        if self.config.block_h % 128 != 0 or self.total_blocks == 0:
            return self.device()
        from .cluster import pack_bitmask, unpack_bitmask_device

        packed, ids, _ = pack_bitmask(np.asarray(self.bitmask))
        cfg = self.config
        # module-level jit with static geometry: repeated device_packed
        # calls with the same (total_blocks, words, k) reuse the
        # compiled scatter instead of re-tracing a fresh partial
        bm_dev = _jit_unpack_bitmask(
            jax.device_put(packed),
            jax.device_put(ids),
            self.total_blocks,
            cfg.words_per_col,
            cfg.block_w,
        )
        out = self.device_except_bitmask()
        out.bitmask = bm_dev
        return out

    def device_except_bitmask(self) -> "SpmmPlan":
        return dataclasses.replace(
            self,
            hind=jax.device_put(np.asarray(self.hind)),
            window_of_block=jax.device_put(np.asarray(self.window_of_block)),
            block_ptr=jax.device_put(np.asarray(self.block_ptr)),
            occ=(
                None
                if self.occ is None
                else jax.device_put(np.asarray(self.occ))
            ),
            values=(
                None
                if self.values is None
                else jax.device_put(np.asarray(self.values))
            ),
            src_perm=(
                None
                if self.src_perm is None
                else jax.device_put(np.asarray(self.src_perm))
            ),
        )

    def device(self) -> "SpmmPlan":
        """Move array leaves to the default JAX device."""
        return dataclasses.replace(
            self.device_except_bitmask(),
            bitmask=jax.device_put(np.asarray(self.bitmask)),
        )
