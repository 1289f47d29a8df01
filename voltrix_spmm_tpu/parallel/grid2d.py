"""2D-partitioned (SUMMA-style) SpMM over a ('row', 'col') device mesh.

Every existing scale-out mode partitions A by OUTPUT rows only: each
device holds a full grid row of block plans (ring.py, hybrid.py) or
columns spanning the whole graph (row_sharded.py), so per-device plan
memory scales as 1/ndev at best and the gathered features span all N
nodes (row_sharded) or travel every hop (ring). This module partitions
A over BOTH mesh axes — device (i, j) of an (R, C) mesh owns the single
rectangular block A[rows_i, cols_j] — the classic 2D sparse-matmul
decomposition (the SUMMA family, scaling-book 2D-sharding recipe):

- adjacency-plan memory per device ~ nnz/(R*C): the only mode whose
  graph footprint shrinks with the FULL device count;
- feature gather reaches N/C rows per device instead of N;
- forward: all_gather of the local X shard over the 'row' axis, one
  rectangular block SpMM, psum_scatter of partial outputs over 'col';
- backward (custom VJP — the op is linear in X): the exact mirror —
  all_gather of dOut over 'col', transpose-block SpMM, psum_scatter
  over 'row'.

Activation sharding P(('row', 'col')) is preserved end to end in both
directions, so GCN layers chain with no reshuffles: global node block
b = i*C + j (rows [b*shard, (b+1)*shard)) lives on device (i, j); mesh
row i owns the contiguous output range [i*C*shard, (i+1)*C*shard); mesh
column j sources the strided union of blocks {i*C + j}, which is
exactly what `all_gather(x_local, 'row')` materializes.

The reference is single-GPU (SURVEY.md §2.3;
/root/reference/voltrix/utils.py:275 is its only — dead — distributed
call): this is TPU-native scale-out beyond reference scope.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

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
class Grid2DPlan:
    """(R, C) grid of rectangular block plans A[rows_i, cols_j], each
    covering C*shard output rows x R*shard source columns (column ids
    are local to the row-axis all_gather layout), padded to a common
    block count so one SPMD program serves every device."""

    bitmask: object  # (R, C, tb, words, K)
    hind: object  # (R, C, tb, K)
    window_of_block: object  # (R, C, tb)
    block_ptr: object  # (R, C, windows + 1)
    config: PlanConfig
    num_nodes: int  # padded global rows (= R * C * shard)
    shard: int  # rows per device block b = i*C + j
    tb_max: int
    nrow: int
    ncol: int
    # transpose blocks A[rows_i, cols_j]^T for the backward
    bitmask_t: object = None
    hind_t: object = None
    window_of_block_t: object = None
    block_ptr_t: object = None
    tbt_max: int = 0

    def tree_flatten(self):
        children = (
            self.bitmask, self.hind, self.window_of_block, self.block_ptr,
            self.bitmask_t, self.hind_t, self.window_of_block_t,
            self.block_ptr_t,
        )
        aux = (
            self.config, self.num_nodes, self.shard, self.tb_max,
            self.nrow, self.ncol, self.tbt_max,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        bm, hi, wob, bp, bmt, hit, wobt, bpt = children
        cfg, nn, sh, tb, r, c, tbt = aux
        return cls(bm, hi, wob, bp, cfg, nn, sh, tb, r, c, bmt, hit, wobt,
                   bpt, tbt)


def _pad_stack_grid2d(plans, config, nrow, ncol):
    """plans[(i, j)] -> stacked arrays padded to tb_max."""
    tb_max = max(max(p.total_blocks for p in plans.values()), 1)
    words, K = config.words_per_col, config.block_w
    nw = next(iter(plans.values())).num_windows
    bm = np.zeros((nrow, ncol, tb_max, words, K), np.uint32)
    hi = np.zeros((nrow, ncol, tb_max, K), np.int32)
    wob = np.zeros((nrow, ncol, tb_max), np.int32)
    bp = np.zeros((nrow, ncol, nw + 1), np.int32)
    for (i, j), p in plans.items():
        t = p.total_blocks
        bm[i, j, :t] = np.asarray(p.bitmask)
        hi[i, j, :t] = np.asarray(p.hind)
        wob[i, j, :t] = np.asarray(p.window_of_block)
        wob[i, j, t:] = p.num_windows - 1  # padding accumulates zeros
        bp[i, j, :-1] = np.asarray(p.block_ptr)[:-1]
        bp[i, j, -1] = tb_max
    return bm, hi, wob, bp, tb_max


def build_grid2d_plan(
    indptr,
    indices,
    num_nodes: int,
    nrow: int,
    ncol: int,
    config: PlanConfig = PlanConfig(128, 128),
    backend: str = "auto",
    with_transpose: bool = False,
) -> Grid2DPlan:
    """Pad the graph to R*C window-aligned node blocks and preprocess
    each device's rectangular block A[rows_i, cols_j] with column ids
    local to the row-axis gather layout (source block i*C + j maps to
    local rows [i*shard, (i+1)*shard))."""
    import scipy.sparse as sp

    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    W = config.block_h
    ndev = nrow * ncol
    shard = -(-num_nodes // (ndev * W)) * W
    n_pad = shard * ndev

    a = sp.csr_matrix(
        (np.ones(indices.shape[0], np.float32), indices, indptr),
        shape=(num_nodes, num_nodes),
    )
    a_pad = sp.vstack(
        [a, sp.csr_matrix((n_pad - num_nodes, num_nodes), dtype=np.float32)]
    )
    a_pad = sp.hstack(
        [a_pad, sp.csr_matrix((n_pad, n_pad - num_nodes), dtype=np.float32)]
    ).tocsr()

    plans, tplans = {}, {}
    for i in range(nrow):
        rows = a_pad[i * ncol * shard : (i + 1) * ncol * shard]
        for j in range(ncol):
            # column selection: the union of node blocks {i'*C + j},
            # in gather order (i' ascending) — local col = i'*shard + o
            col_sel = np.concatenate(
                [
                    np.arange(
                        (ip * ncol + j) * shard,
                        (ip * ncol + j + 1) * shard,
                        dtype=np.int64,
                    )
                    for ip in range(nrow)
                ]
            )
            blk = rows[:, col_sel].tocsr()
            plans[(i, j)] = csr_preprocess(
                blk.indptr.astype(np.int64),
                blk.indices.astype(np.int64),
                ncol * shard,
                config,
                backend=backend,
                num_cols=nrow * shard,
            )
            if with_transpose:
                tb = blk.T.tocsr()
                tplans[(i, j)] = csr_preprocess(
                    tb.indptr.astype(np.int64),
                    tb.indices.astype(np.int64),
                    nrow * shard,
                    config,
                    backend=backend,
                    num_cols=ncol * shard,
                )

    bm, hi, wob, bp, tb_max = _pad_stack_grid2d(plans, config, nrow, ncol)
    out = Grid2DPlan(
        bitmask=bm, hind=hi, window_of_block=wob, block_ptr=bp,
        config=config, num_nodes=n_pad, shard=shard, tb_max=tb_max,
        nrow=nrow, ncol=ncol,
    )
    if with_transpose:
        bmt, hit, wobt, bpt, tbt = _pad_stack_grid2d(
            tplans, config, nrow, ncol
        )
        out.bitmask_t, out.hind_t = bmt, hit
        out.window_of_block_t, out.block_ptr_t = wobt, bpt
        out.tbt_max = tbt
    return out


def _rect_spmm(arrs, cfg, out_rows, src_rows, tb_max, x):
    bm, hi, wob, bp = arrs
    local_plan = SpmmPlan(
        bitmask=bm,
        hind=hi,
        window_of_block=wob,
        block_ptr=bp,
        config=cfg,
        num_nodes=out_rows,
        num_edges=0,
        num_windows=out_rows // cfg.block_h,
        total_blocks=tb_max,
        has_empty_windows=True,  # padded tails may be empty; mask them
        num_cols=src_rows,
    )
    return spmm_pallas(local_plan, x)


def _grid2d_fwd_impl(static, x_local, arrs):
    cfg, nrow, ncol, shard, tb_max, _tbt, row_ax, col_ax = static
    # X[cols_j]: every mesh-row peer's chunk at THIS mesh column
    xg = jax.lax.all_gather(x_local, row_ax, axis=0, tiled=True)
    partial = _rect_spmm(
        arrs, cfg, ncol * shard, nrow * shard, tb_max, xg
    )
    # partial outputs for the whole mesh row; land shard i*C+j home
    out = jax.lax.psum_scatter(
        partial, col_ax, scatter_dimension=0, tiled=True
    )
    return out.astype(x_local.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _grid2d(static, x_local, bm, hi, wob, bp, bmt, hit, wobt, bpt):
    return _grid2d_fwd_impl(static, x_local, (bm, hi, wob, bp))


def _grid2d_fwd(static, x_local, bm, hi, wob, bp, bmt, hit, wobt, bpt):
    return (
        _grid2d_fwd_impl(static, x_local, (bm, hi, wob, bp)),
        (bmt, hit, wobt, bpt),
    )


def _grid2d_bwd(static, res, g):
    cfg, nrow, ncol, shard, _tb, tbt_max, row_ax, col_ax = static
    if tbt_max == 0:
        raise ValueError(
            "build_grid2d_plan(..., with_transpose=True) required for the "
            "grid2d backward"
        )
    arrs_t = res
    # mirror image of the forward: dOut[rows_i] over 'col', A_ij^T,
    # dX[cols_j] contributions summed+scattered over 'row'
    gg = jax.lax.all_gather(
        g.astype(jnp.float32), col_ax, axis=0, tiled=True
    )
    partial = _rect_spmm(
        arrs_t, cfg, nrow * shard, ncol * shard, tbt_max, gg
    )
    dx = jax.lax.psum_scatter(
        partial, row_ax, scatter_dimension=0, tiled=True
    )
    return (dx.astype(g.dtype),) + (None,) * 8


_grid2d.defvjp(_grid2d_fwd, _grid2d_bwd)


def grid2d_spmm(
    plan: Grid2DPlan,
    feat: jax.Array,
    mesh: Mesh,
    row_axis: str = "row",
    col_axis: str = "col",
) -> jax.Array:
    """feat: (num_nodes, D) row-sharded over (row_axis, col_axis);
    returns A @ feat with the same sharding. One all_gather over 'row'
    + one psum_scatter over 'col' (each touching N/C resp. N/(R*C) rows
    per device); the block SpMM is local."""
    n, d = feat.shape
    assert n == plan.num_nodes, (n, plan.num_nodes)
    nrow, ncol = mesh.shape[row_axis], mesh.shape[col_axis]
    assert (nrow, ncol) == (plan.nrow, plan.ncol), (
        (nrow, ncol), (plan.nrow, plan.ncol),
    )
    cfg = plan.config
    static = (
        cfg, nrow, ncol, plan.shard, plan.tb_max, plan.tbt_max,
        row_axis, col_axis,
    )

    def local_fn(bm, hi, wob, bp, bmt, hit, wobt, bpt, xr):
        return _grid2d(
            static, xr[0], bm[0, 0], hi[0, 0], wob[0, 0], bp[0, 0],
            bmt[0, 0], hit[0, 0], wobt[0, 0], bpt[0, 0],
        )[None]

    pspec = P(row_axis, col_axis)
    xspec = P((row_axis, col_axis))
    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(pspec,) * 8 + (xspec,),
        out_specs=xspec,
        check_vma=False,
    )
    arrs = [plan.bitmask, plan.hind, plan.window_of_block, plan.block_ptr]
    if plan.bitmask_t is not None:
        arrs += [
            plan.bitmask_t, plan.hind_t, plan.window_of_block_t,
            plan.block_ptr_t,
        ]
    else:
        # forward-only: ship zero-size transpose stand-ins
        z = np.zeros(
            (nrow, ncol, 1, cfg.words_per_col, cfg.block_w), np.uint32
        )
        arrs += [
            z,
            np.zeros((nrow, ncol, 1, cfg.block_w), np.int32),
            np.zeros((nrow, ncol, 1), np.int32),
            np.zeros_like(np.asarray(plan.block_ptr)),
        ]
    arrs = [jnp.asarray(a) for a in arrs]
    xr = feat.reshape(nrow * ncol, plan.shard, d)
    return f(*arrs, xr).reshape(plan.num_nodes, d)


def make_grid2d_train_step(
    plan: Grid2DPlan,
    mesh: Mesh,
    inv_deg,
    lr: float = 1e-2,
    row_axis: str = "row",
    col_axis: str = "col",
):
    """Full-graph GCN training step over the 2D-partitioned SpMM. Same
    contract as `make_ring_train_step`: jittable
    `(params, x, y) -> (params, loss)`, y == -100 marks rows excluded
    from the loss. Both aggregation layers pay one N/C-row all_gather
    forward and the mirrored pair backward through the custom VJP."""
    assert plan.tbt_max > 0, (
        "build_grid2d_plan(..., with_transpose=True) required for training"
    )
    import optax
    from jax.sharding import NamedSharding

    # device-commit each device's block once, laid out on the 2D mesh
    # (numpy leaves would re-upload the whole grid per step, ring.py)
    plan = jax.device_put(
        plan, NamedSharding(mesh, P(row_axis, col_axis))
    )
    invd = jnp.asarray(np.asarray(inv_deg, np.float32).reshape(-1, 1))

    def forward(params, plan_arg, invd_arg, x):
        h = invd_arg * grid2d_spmm(plan_arg, x, mesh, row_axis, col_axis)
        h = jax.nn.relu(h @ params["w1"] + params["b1"])
        h = invd_arg * grid2d_spmm(plan_arg, h, mesh, row_axis, col_axis)
        return h @ params["w2"] + params["b2"]

    def loss_fn(params, plan_arg, invd_arg, x, y):
        logits = forward(params, plan_arg, invd_arg, x)
        mask = y >= 0
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(y, 0)
        )
        return jnp.sum(jnp.where(mask, losses, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1
        )

    # plan travels as a traced argument, not a jit constant (remote-
    # compile 413 class, see make_ring_train_step)
    @jax.jit
    def _step(params, plan_arg, invd_arg, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, plan_arg, invd_arg, x, y
        )
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    def run(params, x, y):
        return _step(params, plan, invd, x, y)

    return run
