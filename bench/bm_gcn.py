#!/usr/bin/env python
"""End-to-end 2-layer GCN forward benchmark (BASELINE.md config #5:
bf16/fp32 feature sweep inside a GCN forward — the TC-GNN-style
workload the reference's kernels serve)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    import jax.numpy as jnp

    import graph_gen
    from voltrix_spmm_tpu.models import build_graph, gcn_forward, init_gcn
    from voltrix_spmm_tpu.format import PlanConfig
    from voltrix_spmm_tpu.utils import device_loop_bench

    a = graph_gen.load(args.graph)
    n = a.shape[0]
    cfg = (
        "auto" if args.block_h == 0 else PlanConfig(args.block_h, 128)
    )  # --block-h 0 -> coverage-gated regime selection
    g = build_graph(a.indptr, a.indices, n, cfg, symmetric=None)
    rng = np.random.default_rng(0)
    for d in [int(x) for x in args.dims.split(",")]:
        params = init_gcn(jax.random.PRNGKey(0), d, args.hidden, args.classes)
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

        def step(c, params=params):
            out = gcn_forward(params, g, c)
            # keep carry shape: fold logits back into a feature-shaped dep
            return c + 1e-38 * jnp.sum(out)

        t = device_loop_bench(lambda c: step(c), x, iters=args.iters)
        print(f"[GCN-2L] n={n} d={d} hidden={args.hidden}: {t:.3f} ms/forward")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("graph")
    p.add_argument("--dims", default="32,64,128,256,512")
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--classes", type=int, default=32)
    p.add_argument("--block-h", type=int, default=0)  # 0 = auto
    p.add_argument("--iters", type=int, default=10)
    main(p.parse_args())
