#!/usr/bin/env python
"""End-to-end example: neighbor-sampled mini-batch GraphSAGE training,
then exact full-graph inference — the production GraphSAGE split.
Every mini-batch reuses ONE jitted step (static-shape padded blocks).

    python examples/train_sage_minibatch.py [--steps 60] [--batch 128]
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

    from voltrix_spmm_tpu.data import gather_features, sample_blocks
    from voltrix_spmm_tpu.format import PlanConfig
    from voltrix_spmm_tpu.models import (
        blocks_args,
        build_graph,
        init_sage_minibatch,
        make_sage_minibatch_step,
        sage_inference,
    )

    rng = np.random.default_rng(args.seed)
    n, c = args.nodes, args.communities
    size = n // c
    labels = (np.arange(n) // size).astype(np.int32)
    src = np.repeat(np.arange(n), 10)
    intra = (src // size) * size + rng.integers(0, size, size=src.shape[0])
    rand = rng.integers(0, n, size=src.shape[0])
    dst = np.where(rng.random(src.shape[0]) < 0.9, intra, rand)
    a = sp.csr_matrix(
        (np.ones(src.shape[0], np.float32), (src, dst)), shape=(n, n)
    )
    a = ((a + a.T) != 0).astype(np.float32).tocsr()

    d, hidden = args.feat_dim, args.hidden
    x = np.concatenate(
        [
            np.eye(c, dtype=np.float32)[labels]
            + 0.5 * rng.standard_normal((n, c)).astype(np.float32),
            np.zeros((n, d - c), np.float32),
        ],
        axis=1,
    )

    cfg = PlanConfig(32, 128)
    params = init_sage_minibatch(jax.random.PRNGKey(args.seed), [d, hidden, c])
    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = make_sage_minibatch_step(opt)
    for s in range(args.steps):
        seeds = rng.choice(n, size=args.batch, replace=False)
        blocks = sample_blocks(
            a.indptr, a.indices, seeds, fanouts=[args.fanout] * 2,
            rng=rng, config=cfg,
        )
        plans, inv_degs = blocks_args(blocks)
        x_src = jnp.asarray(gather_features(x, blocks[0].src_ids))
        params, state, loss = step(
            params, state, plans, inv_degs, x_src, jnp.asarray(labels[seeds])
        )
        if s % 10 == 0 or s == args.steps - 1:
            print(f"step {s:3d}  batch loss {float(loss):.4f}")
    print(f"jit traces of the train step: {step._cache_size()} (must be 1)")

    # deploy: exact full-neighborhood aggregation over the whole graph
    g = build_graph(a.indptr, a.indices, n, cfg, symmetric=True)
    logits = np.asarray(sage_inference(params, g, jnp.asarray(x)))
    acc = float((logits.argmax(1) == labels).mean())
    print(f"full-graph inference accuracy: {acc:.3f}")
    assert acc > 0.8 and step._cache_size() == 1
    print("mini-batch SAGE example ok")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--fanout", type=int, default=5)
    p.add_argument("--nodes", type=int, default=2000)
    p.add_argument("--communities", type=int, default=4)
    p.add_argument("--feat-dim", type=int, default=16)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    main(args)
