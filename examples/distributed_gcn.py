#!/usr/bin/env python
"""Example: full-graph distributed GCN training on a device mesh.

Partitions a planted-community graph across devices and trains with one
of the partitioned modes:

    --mode row     row shards, all_gather fwd / psum_scatter bwd (default)
    --mode ring    ppermute ring overlapped with block SpMM compute
    --mode grid2d  2D (SUMMA-style): A split over BOTH mesh axes,
                   plan memory ~ nnz/ndev

Runs on a virtual CPU mesh too:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_gcn.py --devices 8 --mode grid2d
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", f"--xla_force_host_platform_device_count={args.devices}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import scipy.sparse as sp
    from jax.sharding import Mesh

    from voltrix_spmm_tpu.format import PlanConfig
    from voltrix_spmm_tpu.models import init_gcn
    from voltrix_spmm_tpu.parallel import (
        build_grid2d_plan,
        build_ring_sharded_plan,
        build_row_sharded_plan,
        make_grid2d_train_step,
        make_ring_train_step,
        make_row_sharded_train_step,
    )

    rng = np.random.default_rng(args.seed)
    n, classes = args.nodes, args.communities
    comm = n // classes
    rows = rng.integers(0, n, size=n * 8)
    cols = np.where(
        rng.random(n * 8) < 0.9,
        (rows // comm) * comm + rng.integers(0, comm, size=n * 8),
        rng.integers(0, n, size=n * 8),
    )
    a = sp.csr_matrix((np.ones(rows.shape[0], np.float32), (rows, cols)), shape=(n, n))
    a = ((a + a.T) != 0).astype(np.float32).tocsr()

    ndev = args.devices
    cfg = PlanConfig(128, 128)
    if args.mode == "row":
        plan = build_row_sharded_plan(
            a.indptr, a.indices, n, ndev, cfg, with_transpose=True
        )
        mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    elif args.mode == "ring":
        plan = build_ring_sharded_plan(
            a.indptr, a.indices, n, ndev, cfg, with_transpose=True
        )
        mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("data",))
    elif args.mode == "grid2d":
        ncol = 4 if ndev % 4 == 0 else (2 if ndev % 2 == 0 else 1)
        nrow = ndev // ncol
        plan = build_grid2d_plan(
            a.indptr, a.indices, n, nrow, ncol, cfg, with_transpose=True
        )
        mesh = Mesh(
            np.asarray(jax.devices()[:ndev]).reshape(nrow, ncol),
            ("row", "col"),
        )
    else:
        raise SystemExit(f"unknown --mode {args.mode}")
    n_pad = plan.num_nodes
    deg = np.maximum(np.asarray(a.sum(1)).ravel(), 1.0)
    inv_deg = np.zeros(n_pad, np.float32)
    inv_deg[:n] = 1.0 / deg
    x = np.zeros((n_pad, args.feat_dim), np.float32)
    x[:n] = rng.standard_normal((n, args.feat_dim))
    y = np.full(n_pad, -100, np.int32)
    y[:n] = np.arange(n) // comm

    params = init_gcn(jax.random.PRNGKey(args.seed), args.feat_dim, args.hidden, classes)
    makers = {
        "row": make_row_sharded_train_step,
        "ring": make_ring_train_step,
        "grid2d": make_grid2d_train_step,
    }
    step = makers[args.mode](plan, mesh, inv_deg, lr=args.lr)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    for i in range(args.steps):
        params, loss = step(params, xj, yj)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")
    print(f"mode={args.mode} devices={ndev} final loss {float(loss):.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=4096)
    p.add_argument("--communities", type=int, default=8)
    p.add_argument("--feat-dim", type=int, default=32)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--lr", type=float, default=5e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", choices=("row", "ring", "grid2d"), default="row")
    p.add_argument("--cpu", action="store_true", default=True)
    main(p.parse_args())
