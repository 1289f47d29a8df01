"""Full-graph distributed GCN training on the row-sharded SpMM.

The standard "partitioned full-batch GNN" setup: each device owns a
contiguous node range (its rows of A, its rows of X/labels); every
layer all_gathers activations over ICI, aggregates locally through the
rectangular plan, and keeps the result row-sharded. Differentiation is
free: the transpose of `all_gather` is `psum_scatter`, so gradients
flow back to the owning shard automatically under `shard_map`.

This composes with the dp x tp batched trainer (sharded.py) to cover
the two canonical GNN scale-out regimes: one giant graph (this module)
vs many batched graphs (sharded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..format.plan import SpmmPlan
from .row_sharded import RowShardedPlan


def _local_aggregate(plan: RowShardedPlan, shard, x_local, axis):
    """sum-aggregate: all_gather X rows, local rectangular SpMM.

    Differentiable end to end: the local SpMM uses `spmm_ad` with the
    shard's transpose plan, and the transpose of `all_gather` is
    `psum_scatter`, routing gradient rows back to their owners."""
    bm, hi, wob, bptr, bmt, hit, wobt, bptrt = shard
    x_full = jax.lax.all_gather(x_local, axis, tiled=True)
    cfg = plan.config
    n_pad = x_full.shape[0]
    local_plan = SpmmPlan(
        bitmask=bm,
        hind=hi,
        window_of_block=wob,
        block_ptr=bptr,
        config=cfg,
        num_nodes=plan.shard_rows,
        num_edges=0,
        num_windows=plan.shard_rows // cfg.block_h,
        total_blocks=plan.tb_max,
        has_empty_windows=True,
        num_cols=n_pad,
    )
    local_plan_t = SpmmPlan(
        bitmask=bmt,
        hind=hit,
        window_of_block=wobt,
        block_ptr=bptrt,
        config=cfg,
        num_nodes=n_pad,
        num_edges=0,
        num_windows=n_pad // cfg.block_h,
        total_blocks=plan.tbt_max,
        has_empty_windows=True,
        num_cols=plan.shard_rows,
    )
    from ..ops.autodiff import spmm_ad

    return spmm_ad(local_plan, local_plan_t, x_full)


def make_row_sharded_train_step(
    plan: RowShardedPlan,
    mesh: Mesh,
    inv_deg,  # (num_nodes, 1) float32: 1/max(degree, 1)
    lr: float = 1e-2,
    axis: str = "data",
):
    """SPMD full-graph GCN training step: params replicated, node rows
    (features, labels, outputs) sharded over `axis`.

    axis may be one mesh axis name or a TUPLE of names for multi-host
    layouts — e.g. axis=("host", "chip") on a (DCN, ICI) mesh shards
    rows over both and the all_gather/psum ride the combined axes
    (parity-tested vs the flat mesh in tests/test_parallel.py).

    Returns jittable `(params, x, y) -> (params, loss)` where x is
    (num_nodes, D) and y (num_nodes,) int labels (pad rows with label
    -100 to exclude them from the loss).
    """
    import optax

    def local_step(
        params, bm, hi, wob, bptr, bmt, hit, wobt, bptrt,
        x_local, y_local, invd_local,
    ):
        # sharded inputs arrive with a leading local-shard dim of 1
        shard = (
            bm[0], hi[0], wob[0], bptr[0], bmt[0], hit[0], wobt[0], bptrt[0]
        )
        x_local, y_local, invd_local = x_local[0], y_local[0], invd_local[0]

        def forward(p, xl):
            h = invd_local * _local_aggregate(plan, shard, xl, axis)
            h = jax.nn.relu(h @ p["w1"] + p["b1"])
            h = invd_local * _local_aggregate(plan, shard, h, axis)
            return h @ p["w2"] + p["b2"]

        # global valid-row count OUTSIDE the differentiated function: under
        # check_vma=False the transpose of an in-body psum is psum again,
        # so differentiating through `psum(sum(losses))` seeds every
        # device with an ndev-scaled cotangent and the explicit grad psum
        # below would deliver ndev x the true gradient (measured 8x on the
        # 8-device dryrun; loss-only parity never caught it)
        count = jax.lax.psum(jnp.sum(y_local >= 0), axis)

        def loss_fn(p):
            logits = forward(p, x_local)
            mask = y_local >= 0
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(y_local, 0)
            )
            # LOCAL numerator over the global count — the per-device
            # gradient is then exactly this shard's contribution
            return jnp.sum(jnp.where(mask, losses, 0.0)) / jnp.maximum(
                count, 1
            )

        local_loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.psum(local_loss, axis)  # full loss, report only
        # grads of replicated params get contributions from every shard
        # through the all_gather transpose (psum_scatter) plus the local
        # dense layers -> psum the per-shard partials
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),  # params replicated
            P(axis), P(axis), P(axis), P(axis),  # forward plan shards
            P(axis), P(axis), P(axis), P(axis),  # transpose plan shards
            P(axis),  # x rows
            P(axis),  # labels
            P(axis),  # inv_deg rows
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )

    assert plan.bitmask_t is not None, (
        "build_row_sharded_plan(..., with_transpose=True) required for training"
    )
    # device-commit the shards once IN THEIR CONSUMED SHARDING — a plain
    # jnp.asarray would land everything on device 0 and pay a reshard
    # per step on a real mesh
    from jax.sharding import NamedSharding

    shard_sharding = NamedSharding(mesh, P(axis))
    arrays = tuple(
        jax.device_put(np.asarray(a), shard_sharding)
        for a in (
            plan.bitmask, plan.hind, plan.window_of_block, plan.block_ptr,
            plan.bitmask_t, plan.hind_t, plan.window_of_block_t,
            plan.block_ptr_t,
        )
    )
    invd = np.asarray(inv_deg, np.float32).reshape(-1)
    if plan.row_perm is not None:
        # degree-balanced shards: the whole computation runs in permuted
        # position space (plan columns were remapped at build time), so
        # features, labels and normalizers all follow the permutation;
        # the loss is permutation-invariant, so nothing scatters back
        perm = np.asarray(plan.row_perm)
        invd = invd[perm]
        row_perm = jnp.asarray(perm)
    else:
        row_perm = None
    invd = jnp.asarray(invd).reshape(-1, 1)

    @jax.jit
    def run(params, x, y):
        if row_perm is not None:
            x = jnp.take(x, row_perm, axis=0)
            y = jnp.take(y, row_perm, axis=0)
        return step(
            params,
            *arrays,
            x.reshape(plan.ndev, plan.shard_rows, -1),
            y.reshape(plan.ndev, plan.shard_rows),
            invd.reshape(plan.ndev, plan.shard_rows, 1),
        )

    return run
