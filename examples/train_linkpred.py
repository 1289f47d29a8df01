#!/usr/bin/env python
"""End-to-end example: link prediction — GCN encoder + differentiable
SDDMM dot-product decoder over candidate edges (positives + sampled
negatives), reported as ROC-AUC.

    python examples/train_linkpred.py [--steps 80] [--nodes 600]
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

    from voltrix_spmm_tpu.models import (
        build_graph,
        build_link_candidates,
        gcn_forward,
        init_link_predictor,
        link_auc,
        link_pred_loss,
        link_scores,
        make_link_pred_step,
    )

    rng = np.random.default_rng(args.seed)
    n, c = args.nodes, args.communities
    size = n // c
    comm_ids = np.arange(n) // size
    src = np.repeat(np.arange(n), 10)
    intra = ((src // size) * size + rng.integers(0, size, size=src.shape[0])) % n
    rand = rng.integers(0, n, size=src.shape[0])
    dst = np.where(rng.random(src.shape[0]) < 0.92, intra, rand)
    a = sp.csr_matrix(
        (np.ones(src.shape[0], np.float32), (src, dst)), shape=(n, n)
    )
    a = ((a + a.T) != 0).astype(np.float32).tocsr()

    g = build_graph(a.indptr, a.indices, n, symmetric=True)
    plan, plan_t, labels = build_link_candidates(
        a.indptr, a.indices, n, rng, neg_ratio=1.0
    )
    d = args.feat_dim
    x = np.concatenate(
        [
            np.eye(c, dtype=np.float32)[comm_ids]
            + 0.3 * rng.standard_normal((n, c)).astype(np.float32),
            np.zeros((n, d - c), np.float32),
        ],
        axis=1,
    )
    x = jnp.asarray(x)

    params = init_link_predictor(jax.random.PRNGKey(args.seed), d, 32, 16)
    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = jax.jit(make_link_pred_step(opt))
    for s in range(args.steps):
        params, state, loss = step(params, state, g, plan, plan_t, x, labels)
        if s % 20 == 0 or s == args.steps - 1:
            h = gcn_forward(params, g, x)
            auc = link_auc(
                np.asarray(link_scores(plan, plan_t, h)), np.asarray(labels)
            )
            print(f"step {s:3d}  loss {float(loss):.4f}  AUC {auc:.3f}")
    assert auc > 0.85, f"did not separate edges (AUC {auc})"
    print("link prediction example ok")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--nodes", type=int, default=600)
    p.add_argument("--communities", type=int, default=6)
    p.add_argument("--feat-dim", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    main(args)
