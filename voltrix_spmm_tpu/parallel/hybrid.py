"""Hybrid multi-host SpMM: all_gather over DCN x ppermute ring over ICI.

The single-axis ring (`ring.py`) is the right shape inside one pod slice
— every hop rides ICI. Across hosts a ppermute ring would serialize on
the slow DCN links, and the flat all_gather trainer
(`row_sharded_gcn.py`) moves the whole X over DCN AND ICI up front with
nothing overlapped. This module composes the two the way the link
topology wants (the ROADMAP #8 split): on a 2D ('host', 'chip') mesh,

- forward: ONE all_gather of the local X chunk across the host (DCN)
  axis — the unavoidable cross-host traffic, paid once — then an
  (nchip-1)-hop ring over the chip (ICI) axis where each traveling
  bundle multiply is overlapped with the next ppermute in flight;
- backward (custom VJP; the op is linear in X): the transpose blocks
  run a reduce-scatter ring over ICI with a traveling accumulator
  bundle, then ONE psum_scatter across DCN lands each host's dX shard.

Reuses `RingShardedPlan`: the ndev x ndev block grid is topology-free;
only the traversal order changes. Device (h, c) of an
(nhost, nchip) mesh owns global row shard h * nchip + c.

The reference is single-GPU (SURVEY.md §2.3) — this is TPU+ scale-out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .ring import RingShardedPlan, _block_spmm


def _hybrid_fwd_impl(static, x_local, arrs):
    cfg, nhost, nchip, shard_rows, tb_max, _tbt, host_ax, chip_ax = static
    fwd_perm = [(i, (i + 1) % nchip) for i in range(nchip)]
    c = jax.lax.axis_index(chip_ax)
    # one DCN transfer: every host's chunk at THIS chip position
    bundle = jax.lax.all_gather(x_local, host_ax, axis=0)  # (nhost, rows, d)
    out = jnp.zeros((shard_rows, x_local.shape[1]), jnp.float32)
    for t in range(nchip):
        c_src = jax.lax.rem(c - t + nchip, nchip)
        for hp in range(nhost):
            src = hp * nchip + c_src
            out = out + _block_spmm(
                arrs, cfg, shard_rows, tb_max, src, bundle[hp]
            )
        if t + 1 < nchip:
            # next bundle rides ICI while this one multiplies
            bundle = jax.lax.ppermute(bundle, chip_ax, fwd_perm)
    return out.astype(x_local.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hybrid(static, x_local, bm, hi, wob, bp, bmt, hit, wobt, bpt):
    return _hybrid_fwd_impl(static, x_local, (bm, hi, wob, bp))


def _hybrid_fwd(static, x_local, bm, hi, wob, bp, bmt, hit, wobt, bpt):
    return (
        _hybrid_fwd_impl(static, x_local, (bm, hi, wob, bp)),
        (bmt, hit, wobt, bpt),
    )


def _hybrid_bwd(static, res, g):
    cfg, nhost, nchip, shard_rows, _tb, tbt_max, host_ax, chip_ax = static
    if tbt_max == 0:
        raise ValueError(
            "build_ring_sharded_plan(..., with_transpose=True) required "
            "for the hybrid backward"
        )
    arrs_t = res
    bwd_perm = [(i, (i - 1) % nchip) for i in range(nchip)]
    c = jax.lax.axis_index(chip_ax)
    g32 = g.astype(jnp.float32)

    def host_stack(c_src):
        # dX contributions of THIS device's grad to every host's chunk
        # at chip column c_src: (nhost, shard_rows, d)
        return jnp.stack(
            [
                _block_spmm(
                    arrs_t, cfg, shard_rows, tbt_max,
                    hp * nchip + c_src, g32,
                )
                for hp in range(nhost)
            ]
        )

    # reduce-scatter ring over ICI (mirrors ring.py's backward at the
    # chip level, with a bundle per host): the accumulator destined for
    # chip column c_src visits every chip of this host row and lands home
    acc = host_stack(jax.lax.rem(c + 1, nchip))
    for t in range(1, nchip):
        acc = jax.lax.ppermute(acc, chip_ax, bwd_perm)
        acc = acc + host_stack(jax.lax.rem(c + 1 + t, nchip))
    # one DCN collective: sum over host rows, scatter slot hp to host hp
    dx = jax.lax.psum_scatter(
        acc, host_ax, scatter_dimension=0, tiled=True
    )
    return (dx.reshape(shard_rows, -1).astype(g.dtype),) + (None,) * 8


_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def hybrid_sharded_spmm(
    plan: RingShardedPlan,
    feat: jax.Array,
    mesh: Mesh,
    host_axis: str = "host",
    chip_axis: str = "chip",
) -> jax.Array:
    """feat: (num_nodes, D) row-sharded over (host_axis, chip_axis);
    returns A @ feat with the same sharding."""
    n, d = feat.shape
    assert n == plan.num_nodes, (n, plan.num_nodes)
    nhost = mesh.shape[host_axis]
    nchip = mesh.shape[chip_axis]
    assert nhost * nchip == plan.ndev, (nhost, nchip, plan.ndev)
    cfg, shard_rows = plan.config, plan.shard_rows
    static = (
        cfg, nhost, nchip, shard_rows, plan.tb_max, plan.tbt_max,
        host_axis, chip_axis,
    )

    def local_fn(bm, hi, wob, bp, bmt, hit, wobt, bpt, xr):
        return _hybrid(
            static, xr[0], bm[0], hi[0], wob[0], bp[0],
            bmt[0], hit[0], wobt[0], bpt[0],
        )[None]

    spec = P((host_axis, chip_axis))
    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec,) * 8 + (spec,),
        out_specs=spec,
        check_vma=False,
    )
    arrs = [plan.bitmask, plan.hind, plan.window_of_block, plan.block_ptr]
    if plan.bitmask_t is not None:
        arrs += [
            plan.bitmask_t, plan.hind_t, plan.window_of_block_t,
            plan.block_ptr_t,
        ]
    else:
        z = np.zeros(
            (plan.ndev, plan.ndev, 1, cfg.words_per_col, cfg.block_w),
            np.uint32,
        )
        arrs += [
            z,
            np.zeros((plan.ndev, plan.ndev, 1, cfg.block_w), np.int32),
            np.zeros((plan.ndev, plan.ndev, 1), np.int32),
            np.zeros_like(np.asarray(plan.block_ptr)),
        ]
    arrs = [jnp.asarray(a) for a in arrs]
    xr = feat.reshape(plan.ndev, plan.shard_rows, d)
    return f(*arrs, xr).reshape(plan.num_nodes, d)


def make_hybrid_train_step(
    plan: RingShardedPlan,
    mesh: Mesh,
    inv_deg,
    lr: float = 1e-2,
    host_axis: str = "host",
    chip_axis: str = "chip",
):
    """Full-graph GCN training step over the hybrid SpMM: both
    aggregation layers pay one DCN all_gather + an ICI ring forward and
    an ICI ring + one DCN psum_scatter backward. Same contract as
    `make_ring_train_step`: jittable `(params, x, y) -> (params, loss)`,
    y == -100 marks rows excluded from the loss."""
    assert plan.tbt_max > 0, (
        "build_ring_sharded_plan(..., with_transpose=True) required for "
        "training"
    )
    import optax
    from jax.sharding import NamedSharding

    # device-commit the grid once, sharded over the flattened
    # (host, chip) device order the step consumes (see ring.py)
    plan = jax.device_put(
        plan, NamedSharding(mesh, P((host_axis, chip_axis)))
    )
    invd = jnp.asarray(np.asarray(inv_deg, np.float32).reshape(-1, 1))

    def forward(params, plan_arg, invd_arg, x):
        h = invd_arg * hybrid_sharded_spmm(
            plan_arg, x, mesh, host_axis, chip_axis
        )
        h = jax.nn.relu(h @ params["w1"] + params["b1"])
        h = invd_arg * hybrid_sharded_spmm(
            plan_arg, h, mesh, host_axis, chip_axis
        )
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

    # plan as traced argument, not a closed-over jit constant (remote-
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
