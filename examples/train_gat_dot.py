#!/usr/bin/env python
"""End-to-end example: node classification with a 2-layer multi-head
DOT-PRODUCT-attention GAT on the edge-per-lane (ELL) plan — attention
scores come from the differentiable SDDMM (an MXU pass), so value
memory is 4 bytes/edge and the model scales to any graph the binary
SpMM handles. Planted-community graph so labels are learnable.

    python examples/train_gat_dot.py [--steps 60] [--heads 4]
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
    import scipy.sparse as sp

    from voltrix_spmm_tpu.format import PlanConfig
    from voltrix_spmm_tpu.models import (
        build_ell_graph,
        gat_dot_forward,
        gat_dot_loss,
        init_gat_dot,
    )

    rng = np.random.default_rng(args.seed)
    n, c = args.nodes, args.communities
    comm = -(-n // c)  # ceil: tail nodes join the last community so
    # every label stays < c even when n % c != 0
    labels = np.arange(n) // comm
    src = rng.integers(0, n, size=n * 8)
    dst = np.where(
        rng.random(n * 8) < 0.9,
        # clip: the last community is partial when n % comm != 0
        np.minimum(
            (src // comm) * comm + rng.integers(0, comm, size=n * 8), n - 1
        ),
        rng.integers(0, n, size=n * 8),
    )
    a = sp.csr_matrix(
        (np.ones(src.shape[0], np.float32), (src, dst)), shape=(n, n)
    )
    a = ((a + a.T + sp.eye(n, format="csr")) != 0).astype(np.float32).tocsr()

    g = build_ell_graph(
        a.indptr, a.indices, n, PlanConfig(128, 128, block_unroll=4)
    )
    d = args.feat_dim
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(labels)

    params = init_gat_dot(
        jax.random.PRNGKey(args.seed), d, args.hidden, c, num_heads=args.heads
    )
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, g, x, y):
        loss, grads = jax.value_and_grad(gat_dot_loss)(params, g, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, g, x, y)
        if i % 10 == 0 or i == args.steps - 1:
            logits = gat_dot_forward(params, g, x)
            acc = float((jnp.argmax(logits, -1) == y).mean())
            print(f"step {i:4d}  loss {float(loss):.4f}  acc {acc:.3f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=4096)
    p.add_argument("--communities", type=int, default=8)
    p.add_argument("--feat-dim", type=int, default=64)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
