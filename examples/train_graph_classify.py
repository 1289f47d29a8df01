#!/usr/bin/env python
"""End-to-end example: GRAPH classification with the GIN classifier —
the workload of the reference's DD/protein/YeastH/Yeast datasets
(many small graphs, one label each). A batch of graphs becomes one
block-diagonal adjacency, so each GNN layer is a single SpMM launch;
per-graph logits come from a segment readout.

Two planted classes that sum-readout GIN can separate: dense
Erdős–Rényi graphs vs sparse ring-like graphs.

    python examples/train_graph_classify.py [--steps 60] [--graphs 32]
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

    from voltrix_spmm_tpu.data import block_diagonal, node_graph_ids
    from voltrix_spmm_tpu.models import (
        build_graph,
        gin_classifier_forward,
        init_gin_classifier,
        make_classifier_train_step,
    )

    rng = np.random.default_rng(args.seed)
    graphs, labels = [], []
    for i in range(args.graphs):
        n = int(rng.integers(30, 80))
        dense = i % 2 == 0
        if dense:
            a = sp.random(n, n, density=0.25, format="csr", random_state=rng)
        else:  # ring + a few chords
            ii = np.arange(n)
            a = sp.csr_matrix(
                (np.ones(n, np.float32), (ii, (ii + 1) % n)), shape=(n, n)
            )
        a = ((a + a.T) != 0).astype(np.float32).tocsr()
        graphs.append(a)
        labels.append(0 if dense else 1)

    big, offs = block_diagonal(graphs)
    ids = jnp.asarray(node_graph_ids(offs))
    y = jnp.asarray(np.asarray(labels, np.int32))
    g = build_graph(big.indptr, big.indices, big.shape[0], symmetric=True)

    d, hidden = args.feat_dim, args.hidden
    x = jnp.asarray(
        rng.standard_normal((big.shape[0], d)).astype(np.float32)
    )
    params = init_gin_classifier(jax.random.PRNGKey(args.seed), d, hidden, 2)
    opt = optax.adam(1e-2)
    step = jax.jit(make_classifier_train_step(opt))
    state = opt.init(params)
    for s in range(args.steps):
        params, state, loss = step(params, state, g, x, ids, y)
        if s % 10 == 0 or s == args.steps - 1:
            logits = gin_classifier_forward(params, g, x, ids, y.shape[0])
            acc = float(jnp.mean(jnp.argmax(logits, 1) == y))
            print(f"step {s:3d}  loss {float(loss):.4f}  acc {acc:.2f}")
    assert acc == 1.0 or float(loss) < 0.2, "did not learn the planted classes"
    print("graph classification example ok")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--graphs", type=int, default=32)
    p.add_argument("--feat-dim", type=int, default=16)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    main(args)
