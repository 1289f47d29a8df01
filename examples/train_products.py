#!/usr/bin/env python
"""Full-graph GCN training at ogbn-products scale on ONE TPU chip.

Demonstrates the streamed-training path (round 3): `build_graph("auto")`
picks h512 clustered-subtile geometry under the bitmask budget and
window-chunk streaming past the gather budget, and `spmm_ad` streams
BOTH training directions, so a 2.45M-node / 83M-edge graph trains on a
single v5e without ever materializing the full gather.

    python examples/train_products.py            # small smoke (no TPU needed)
    python examples/train_products.py --full     # the real 2.45M-node proxy

Drop the genuine `ogbn-products.npz` (TC-GNN format) in
$VOLTRIX_TPU_DATASETS to train the real graph instead of the proxy.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="the 2.45M-node products proxy (needs a TPU)")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--classes", type=int, default=47)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from voltrix_spmm_tpu.models import build_graph, gcn_forward, init_gcn

    if args.full:
        from voltrix_spmm_tpu.data import symmetrize
        from voltrix_spmm_tpu.data.real import load_graph

        a, label = load_graph("ogbn-products")
        a = symmetrize(a)
        print(f"[{label}] {a.shape[0]} nodes, {a.nnz} edges")
    else:
        import scipy.sparse as sp

        from voltrix_spmm_tpu.data import symmetrize

        a = symmetrize(sp.random(4096, 4096, density=0.005, format="csr",
                                 random_state=np.random.default_rng(0)))
        print(f"[smoke] {a.shape[0]} nodes, {a.nnz} edges")

    n = a.shape[0]
    t0 = time.time()
    g = build_graph(a.indptr, a.indices, n, "auto", symmetric=True)
    plans = g.plan if isinstance(g.plan, list) else [g.plan]
    print(
        f"plan: h{plans[0].config.block_h} clustered="
        f"{plans[0].config.cluster_cols} chunks={len(plans)} "
        f"({time.time() - t0:.0f}s preprocess)"
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, args.d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, args.classes, size=n).astype(np.int32))
    params = init_gcn(jax.random.PRNGKey(0), args.d, args.hidden, args.classes)

    def loss_fn(p, gg, xx, yy):
        logits = gcn_forward(p, gg, xx)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yy
        ).mean()

    @jax.jit
    def train_step(p, gg, xx, yy):
        l, grads = jax.value_and_grad(loss_fn)(p, gg, xx, yy)
        return jax.tree.map(lambda w, gr: w - 1e-2 * gr, p, grads), l

    for step in range(args.steps):
        t0 = time.time()
        params, l = train_step(params, g, x, y)
        jax.block_until_ready(l)
        print(f"step {step}: loss {float(l):.4f} ({time.time() - t0:.2f}s)")
    assert np.isfinite(float(l)), "training diverged"
    print("ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
