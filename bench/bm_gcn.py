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


def main_train(args):
    """Full TRAINING-step benchmark (fwd + bwd + SGD) — the reference
    kernels' stated target workload (bmat_kernels.cuh:16-20) made
    measurable end to end: Voltrix (plan aggregation with the spmm_ad
    custom VJP) vs pure-XLA Dense and BCOO GCNs. Appends rows
    (dataset, GCN-train-<method>, featdim, time_ms) to --csv."""
    import csv

    import jax
    import jax.numpy as jnp
    import optax

    import graph_gen
    from voltrix_spmm_tpu.models import build_graph, init_gcn
    from voltrix_spmm_tpu.utils import device_loop_bench

    a = graph_gen.load(args.graph)
    n = a.shape[0]
    name = os.path.basename(args.graph).split(".")[0]
    rng = np.random.default_rng(0)
    invd = jnp.asarray(
        (1.0 / np.maximum(np.diff(a.indptr), 1.0))
        .astype(np.float32)
        .reshape(-1, 1)
    )
    y = jnp.asarray(rng.integers(0, args.classes, n), jnp.int32)

    def make_step(agg):
        # agg(x, opaque) -> A @ x; `opaque` travels as a traced argument
        # (plans/matrices as jit constants blow the remote compile, 413)
        def loss_fn(p, x, opaque):
            h = invd * agg(x, opaque)
            h = jax.nn.relu(h @ p["w1"] + p["b1"])
            h = invd * agg(h, opaque)
            logits = h @ p["w2"] + p["b2"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        def step(x, p, opaque):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, opaque)
            new_p = jax.tree.map(lambda q, g: q - 1e-2 * g, p, grads)
            return loss + sum(jnp.sum(l) for l in jax.tree.leaves(new_p))

        return step

    def voltrix(d):
        g = build_graph(a.indptr, a.indices, n, "auto", symmetric=None)
        from voltrix_spmm_tpu.models.graph import aggregate

        return make_step(lambda x, gg: aggregate(gg, x, mode="sum")), g

    def dense(d):
        if n > 16384:
            raise RuntimeError("skipped: dense A exceeds HBM budget")
        ad = jnp.asarray(a.toarray().astype(np.float32))
        return make_step(lambda x, m: m @ x), ad

    def bcoo(d):
        from jax.experimental import sparse as jsparse

        m = jsparse.BCOO.from_scipy_sparse(a)
        return make_step(lambda x, mm: mm @ x), m

    methods = {"Voltrix": voltrix, "Dense": dense, "BCOO": bcoo}
    if args.methods:
        methods = {k: methods[k] for k in args.methods.split(",")}
    rows = []
    for d in [int(s) for s in args.dims.split(",")]:
        params = init_gcn(jax.random.PRNGKey(0), d, args.hidden, args.classes)
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        for mname, build in methods.items():
            try:
                step, opaque = build(d)
                t = device_loop_bench(
                    step, x, params, opaque, iters=args.iters, trials=2
                )
            except Exception as e:
                print(f"[GCN-train-{mname}] {name} d={d}: FAILED ({e})")
                rows.append([name, f"GCN-train-{mname}", d, float("nan")])
                continue
            print(f"[GCN-train-{mname}] {name} d={d}: {t:.3f} ms/step")
            rows.append([name, f"GCN-train-{mname}", d, round(t, 4)])
    if args.csv:
        exists = os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as f:
            w = csv.writer(f)
            if not exists:
                w.writerow(["dataset", "method", "featdim", "time_ms"])
            w.writerows(rows)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("graph")
    p.add_argument("--dims", default="32,64,128,256,512")
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--classes", type=int, default=32)
    p.add_argument("--block-h", type=int, default=0)  # 0 = auto
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--train", action="store_true")
    p.add_argument("--methods", default="")
    p.add_argument("--csv", default="")
    args = p.parse_args()
    main_train(args) if args.train else main(args)
