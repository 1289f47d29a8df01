"""Row-sharded (graph-partitioned) SpMM across a device mesh.

The reference is single-GPU; SURVEY.md §5 sketches the TPU scale-out:
partition A's *row windows* across devices (each device owns a
contiguous node range and its adjacency rows), keep X row-sharded, and
`all_gather` X over ICI before the local SpMM — the one collective a
partitioned binary SpMM needs. Output rows stay sharded (each device
produces its own node range), so a GNN layer chain keeps activations
sharded end to end.

Per-device plans have different block counts; shard_map needs one
program, so plans are built per shard and *stacked with padding* to the
max block count (padding blocks carry zero bits — the same trick as
`block_unroll` padding).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..format.plan import PlanConfig, SpmmPlan
from ..format.preprocess import csr_preprocess
from ..ops.pallas_spmm import spmm_pallas


@jax.tree_util.register_pytree_node_class
@dataclass
class RowShardedPlan:
    # stacked per-device plan arrays, leading dim = devices
    bitmask: object  # (ndev, tb_max, words, K)
    hind: object  # (ndev, tb_max, K)
    window_of_block: object  # (ndev, tb_max)
    block_ptr: object  # (ndev, windows_per_shard + 1)
    config: PlanConfig
    num_nodes: int  # global (padded to ndev * shard_rows)
    shard_rows: int  # nodes per device
    tb_max: int
    ndev: int
    # transpose plans (A[rows_s, :]^T per shard) for training: backward
    # of the local SpMM is another SpMM with these (see spmm_ad)
    bitmask_t: object = None  # (ndev, tbt_max, words, K)
    hind_t: object = None  # (ndev, tbt_max, K)
    window_of_block_t: object = None  # (ndev, tbt_max)
    block_ptr_t: object = None  # (ndev, global_windows + 1)
    tbt_max: int = 0
    # degree-balanced assignment: row_perm[k] = original row owning the
    # k-th padded output position (None = contiguous ranges)
    row_perm: object = None

    def tree_flatten(self):
        children = (
            self.bitmask,
            self.hind,
            self.window_of_block,
            self.block_ptr,
            self.bitmask_t,
            self.hind_t,
            self.window_of_block_t,
            self.block_ptr_t,
            self.row_perm,
        )
        aux = (
            self.config,
            self.num_nodes,
            self.shard_rows,
            self.tb_max,
            self.ndev,
            self.tbt_max,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (bm, hi, wob, bp, bmt, hit, wobt, bpt, rp) = children
        cfg, num_nodes, shard_rows, tb_max, ndev, tbt_max = aux
        return cls(
            bm, hi, wob, bp, cfg, num_nodes, shard_rows, tb_max, ndev,
            bmt, hit, wobt, bpt, tbt_max, rp,
        )


def _pad_stack_plans(plans, config, ndev):
    """Stack per-shard SpmmPlans into one SPMD set, padded to the max
    block count (padding blocks carry zero bits and attach to the last
    window)."""
    tb_max = max(max(p.total_blocks for p in plans), 1)
    words, K = config.words_per_col, config.block_w

    def pad_stack(getter, shape_tail, dtype):
        out = np.zeros((ndev, tb_max, *shape_tail), dtype=dtype)
        for i, p in enumerate(plans):
            arr = np.asarray(getter(p))
            out[i, : arr.shape[0]] = arr
        return out

    bitmask = pad_stack(lambda p: p.bitmask, (words, K), np.uint32)
    hind = pad_stack(lambda p: p.hind, (K,), np.int32)
    wob = np.zeros((ndev, tb_max), dtype=np.int32)
    for i, p in enumerate(plans):
        w = np.asarray(p.window_of_block)
        wob[i, : w.shape[0]] = w
        wob[i, w.shape[0] :] = p.num_windows - 1
    bptr = np.stack(
        [
            np.concatenate(
                [
                    np.asarray(p.block_ptr)[:-1],
                    np.array([tb_max], dtype=np.int32),
                ]
            )
            for p in plans
        ]
    ).astype(np.int32)
    return bitmask, hind, wob, bptr, tb_max


def build_row_sharded_plan(
    indptr,
    indices,
    num_nodes: int,
    ndev: int,
    config: PlanConfig = PlanConfig(128, 128),
    backend: str = "auto",
    with_transpose: bool = False,
    balance: bool = False,
) -> RowShardedPlan:
    """Partition rows into `ndev` shards and build one padded plan per
    shard. Columns (neighbor ids) stay global.

    with_transpose=True additionally builds each shard's A[rows_s,:]^T
    plan (global rows x shard columns) — required for training (the
    backward of the local SpMM, see parallel/row_sharded_gcn.py).

    balance=True assigns rows round-robin by degree rank instead of
    contiguous ranges, equalizing per-shard edge counts on skewed
    graphs (padding to the max block count wastes far less). The whole
    plan then lives in *permuted padded-position space*: row k of the
    stacked layout is original row `row_perm[k]`, and column ids are
    remapped through the inverse permutation so they index the
    all-gathered activations in that same layout. Consumers permute X
    on entry and scatter outputs back (`row_sharded_spmm` does both;
    the trainer keeps activations permuted end to end so layer
    chaining needs no per-layer reshuffle)."""
    import scipy.sparse as sp

    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    W = config.block_h
    shard_rows = -(-num_nodes // (ndev * W)) * W  # window-aligned
    n_pad = shard_rows * ndev

    if balance:
        deg = np.diff(indptr)
        order = np.argsort(-deg, kind="stable")
        shard_rows_list = []
        for dev in range(ndev):
            mine = np.sort(order[dev::ndev])
            shard_rows_list.append(mine)
        # padding slots map to the unused padded ids [num_nodes, n_pad) so
        # the inference scatter-back never collides with a real row
        row_perm = np.full(n_pad, -1, dtype=np.int32)
        for dev, mine in enumerate(shard_rows_list):
            row_perm[dev * shard_rows : dev * shard_rows + mine.shape[0]] = mine
        pad_slots = row_perm < 0
        row_perm[pad_slots] = np.arange(
            num_nodes, num_nodes + int(pad_slots.sum()), dtype=np.int32
        )
        # inverse: padded position of each original (or pad) id — used to
        # remap column ids so the plan is self-consistent in permuted
        # layout (a layer's output feeds the next layer's all_gather
        # without reshuffling; advisor r1 found the original-order column
        # convention scrambled layer >= 2 of the balanced trainer)
        pos_of = np.empty(n_pad, dtype=np.int64)
        pos_of[row_perm.astype(np.int64)] = np.arange(n_pad, dtype=np.int64)
    else:
        row_perm = None

    a_full = sp.csr_matrix(
        (np.ones(indices.shape[0], np.float32), indices, indptr),
        shape=(num_nodes, num_nodes),
    )

    plans: list[SpmmPlan] = []
    tplans: list[SpmmPlan] = []
    for dev in range(ndev):
        if balance:
            mine = shard_rows_list[dev]
            a_s = a_full[mine]  # (len(mine), num_nodes) csr
            local_ptr = np.zeros(shard_rows + 1, dtype=np.int64)
            local_ptr[1 : mine.shape[0] + 1] = a_s.indptr[1:]
            local_ptr[mine.shape[0] + 1 :] = a_s.indptr[-1]
            local_idx = pos_of[a_s.indices.astype(np.int64)]
        else:
            r0 = min(dev * shard_rows, num_nodes)
            r1 = min(r0 + shard_rows, num_nodes)
            local_ptr = np.zeros(shard_rows + 1, dtype=np.int64)
            seg = indptr[r0 : r1 + 1] - indptr[r0]
            local_ptr[: seg.shape[0]] = seg
            local_ptr[seg.shape[0] :] = seg[-1] if seg.shape[0] else 0
            local_idx = indices[indptr[r0] : indptr[r1]]
        # local CSR over shard_rows rows; columns remain GLOBAL ids
        # (they index the all-gathered X): original node ids for the
        # contiguous split, permuted padded positions when balance=True.
        plan = _preprocess_local(
            local_ptr,
            local_idx,
            shard_rows,
            n_pad if balance else num_nodes,
            config,
            backend,
        )
        plans.append(plan)
        if with_transpose:
            a_s2 = sp.csr_matrix(
                (
                    np.ones(local_idx.shape[0], np.float32),
                    local_idx,
                    local_ptr,
                ),
                shape=(shard_rows, n_pad),
            )
            at = a_s2.T.tocsr()  # (n_pad, shard_rows)
            tplans.append(
                csr_preprocess(
                    at.indptr,
                    at.indices,
                    n_pad,
                    config,
                    backend=backend,
                    num_cols=shard_rows,
                )
            )

    bitmask, hind, wob, bptr, tb_max = _pad_stack_plans(plans, config, ndev)
    out = RowShardedPlan(
        bitmask=bitmask,
        hind=hind,
        window_of_block=wob,
        block_ptr=bptr,
        config=config,
        num_nodes=n_pad,
        shard_rows=shard_rows,
        tb_max=tb_max,
        ndev=ndev,
    )
    out.row_perm = row_perm
    if with_transpose:
        bmt, hit, wobt, bptrt, tbt_max = _pad_stack_plans(tplans, config, ndev)
        out.bitmask_t, out.hind_t = bmt, hit
        out.window_of_block_t, out.block_ptr_t = wobt, bptrt
        out.tbt_max = tbt_max
    return out


def _preprocess_local(local_ptr, local_idx, shard_rows, global_nodes, config, backend):
    # rectangular preprocessing: shard_rows output rows x global columns
    return csr_preprocess(
        local_ptr,
        local_idx,
        shard_rows,
        config,
        backend=backend,
        num_cols=global_nodes,
    )


def row_sharded_spmm(
    plan: RowShardedPlan, feat: jax.Array, mesh: Mesh, axis: str = "data"
) -> jax.Array:
    """feat: (num_nodes, D) row-sharded over `axis`; returns out with the
    same row sharding. One all_gather of X rides the ICI; the SpMM
    itself is local."""
    n, d = feat.shape
    assert n == plan.num_nodes, (n, plan.num_nodes)
    cfg = plan.config

    def local_fn(bm, hi, wob, bptr, x_local):
        x_full = jax.lax.all_gather(x_local[0], axis, tiled=True)
        local_plan = SpmmPlan(
            bitmask=bm[0],
            hind=hi[0],
            window_of_block=wob[0],
            block_ptr=bptr[0],
            config=cfg,
            num_nodes=plan.shard_rows,
            num_edges=0,
            num_windows=plan.shard_rows // cfg.block_h,
            total_blocks=plan.tb_max,
            has_empty_windows=True,  # padded tails may be empty; mask them
            num_cols=x_full.shape[0],
        )
        out = spmm_pallas(local_plan, x_full)[: plan.shard_rows]
        return out[None]

    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    bm = jnp.asarray(plan.bitmask)
    hi = jnp.asarray(plan.hind)
    wob = jnp.asarray(plan.window_of_block)
    bptr = jnp.asarray(plan.block_ptr)
    if plan.row_perm is not None:
        # balanced plans live in permuted position space: feed X in that
        # layout (column ids were remapped at build time to match)
        feat = jnp.take(feat, jnp.asarray(plan.row_perm), axis=0)
    xr = feat.reshape(plan.ndev, plan.shard_rows, d)
    out = f(bm, hi, wob, bptr, xr).reshape(plan.num_nodes, d)
    if plan.row_perm is not None:
        # out[k] is the result for original row row_perm[k]; scatter back
        out = jnp.zeros_like(out).at[jnp.asarray(plan.row_perm)].set(out)
    return out
