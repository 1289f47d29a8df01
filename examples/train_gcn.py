#!/usr/bin/env python
"""End-to-end example: node classification with a 2-layer GCN on the
Pallas SpMM kernels — planted-community graph, so the labels are
actually learnable. Runs on TPU (fast) or CPU (interpret, slow).

    python examples/train_gcn.py [--steps 100] [--communities 8]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    import jax.numpy as jnp
    import optax

    from voltrix_spmm_tpu.models import (
        build_graph,
        gcn_forward,
        init_gcn,
        make_train_step,
    )
    from voltrix_spmm_tpu.models.checkpoint import save_checkpoint

    rng = np.random.default_rng(args.seed)
    n, c = args.nodes, args.communities
    comm = n // c
    # planted partition: mostly intra-community edges
    labels = np.arange(n) // comm
    src = rng.integers(0, n, size=n * 8)
    dst = np.where(
        rng.random(n * 8) < 0.9,
        (src // comm) * comm + rng.integers(0, comm, size=n * 8),
        rng.integers(0, n, size=n * 8),
    )
    import scipy.sparse as sp

    a = sp.csr_matrix(
        (np.ones(src.shape[0], np.float32), (src, dst)), shape=(n, n)
    )
    a = ((a + a.T) != 0).astype(np.float32).tocsr()

    g = build_graph(a.indptr, a.indices, n, config="auto", symmetric=True)
    d = args.feat_dim
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(labels)

    params = init_gcn(jax.random.PRNGKey(args.seed), d, args.hidden, c)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(tx))

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, g, x, y)
        if i % 10 == 0 or i == args.steps - 1:
            logits = gcn_forward(params, g, x)
            acc = float((jnp.argmax(logits, -1) == y).mean())
            print(f"step {i:4d}  loss {float(loss):.4f}  acc {acc:.3f}")

    if args.checkpoint:
        path = save_checkpoint(args.checkpoint, params)
        print(f"checkpoint -> {path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=4096)
    p.add_argument("--communities", type=int, default=8)
    p.add_argument("--feat-dim", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default="")
    main(p.parse_args())
