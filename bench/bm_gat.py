#!/usr/bin/env python
"""GAT benchmark: fused flash-attention formulation (binned plan, one
Pallas launch per head, O(n) residuals) vs the three-pass ELL pipeline
(SDDMM kernel -> O(nnz) segment softmax -> lane-weighted ELL SpMM).

Both models share the identical parameter tree (models/gat_flash.py),
so cells differ only by the attention formulation. Run ONE method per
process (CLAUDE.md bench pathology: cross-program re-measures inflate
through kept-alive device buffers):

    python bench/bm_gat.py data/rmat-17.npz --method flash --mode train
    python bench/bm_gat.py data/rmat-17.npz --method ell   --mode train

Model family beyond the reference (its kernels serve binary GCN
aggregation only — bmat_kernels.cuh:16-20); timing protocol mirrors
bm_gcn.py so rows merge into the same results.csv.
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    import jax.numpy as jnp

    import graph_gen
    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.models import (
        build_ell_graph,
        gat_dot_forward,
        gat_dot_loss,
        gat_flash_forward,
        gat_flash_loss,
        init_gat_flash,
    )
    from voltrix_spmm_tpu.utils import device_loop_bench

    a = graph_gen.load(args.graph)
    n = a.shape[0]
    name = os.path.basename(args.graph).split(".")[0]
    # seg=1 is the flash default on purpose: attention gathers (k || v)
    # super-rows, so at dk+dv >= 256 lanes the fetch is already past the
    # per-row-cost knee where seg-coverage stops paying (gather law,
    # docs/DESIGN.md); --seg exposes the lever for measurement anyway
    cfg = PlanConfig(
        args.block_h, 128,
        gather_segment=args.seg, block_unroll=args.unroll,
    )

    if args.method == "flash" and args.tune:
        # measured-race geometry + plane dtype (tuner/attention.py); the
        # bench graphs are symmetrized so the forward plan doubles as
        # the transpose plan inside the tuner (at_indptr=None)
        from voltrix_spmm_tpu.tuner import tune_attention

        tuned = tune_attention(
            a.indptr, a.indices, n,
            heads=args.heads, dk=args.hidden, dv=args.hidden,
            mode="train" if args.mode == "train" else "fwd",
            hash_tag=f"{name}-gat",
        )
        print(f"[tune_attention] winner: {tuned.variant.key()} "
              f"({tuned.time_ms:.3f} ms) candidates: {tuned.candidates}")
        import jax.numpy as _jnp

        pdt = (
            _jnp.dtype(tuned.variant.plane_dtype)
            if tuned.variant.plane_dtype
            else _jnp.float32
        )
        # the plane dtype must stay STATIC (a traced graph tuple would
        # hand jit a dtype leaf) — close it over the model fns instead
        graph = (tuned.plan, tuned.plan_t)

        def fwd(p, g, x, _d=pdt):
            return gat_flash_forward(p, (g[0], g[1], _d), x)

        def loss_fn(p, g, x, y, _d=pdt):
            return gat_flash_loss(p, (g[0], g[1], _d), x, y)
    elif args.method == "flash":
        plan = csr_preprocess(a.indptr, a.indices, n, cfg).device()
        if args.no_split:
            graph = plan  # per-lane fallback backward (segment-sum scatter)
        else:
            # split backward: dK/dV ride the transpose plan. The bench
            # graphs are symmetrized, so A^T = A and the pair shares one
            # device plan; asymmetric inputs get their own A^T plan.
            at = a.T.tocsr()
            if (a != at).nnz == 0:
                graph = (plan, plan)
            else:
                graph = (
                    plan,
                    csr_preprocess(at.indptr, at.indices, n, cfg).device(),
                )
        fwd, loss_fn = gat_flash_forward, gat_flash_loss
    elif args.method == "ell":
        graph = build_ell_graph(a.indptr, a.indices, n, cfg)
        fwd, loss_fn = gat_dot_forward, gat_dot_loss
    else:
        raise SystemExit(f"unknown --method {args.method!r}")

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, args.classes, n), jnp.int32)
    rows = []
    for d in [int(s) for s in args.dims.split(",")]:
        params = init_gat_flash(
            jax.random.PRNGKey(0),
            d,
            args.hidden,
            args.classes,
            num_heads=args.heads,
        )
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

        if args.mode == "fwd":

            def step(c, p, g):
                return c + 1e-38 * jnp.sum(fwd(p, g, c))

        else:

            def step(c, p, g):
                loss, grads = jax.value_and_grad(loss_fn)(p, g, c, y)
                new_p = jax.tree.map(lambda q, gr: q - 1e-2 * gr, p, grads)
                return loss + sum(
                    jnp.sum(l) for l in jax.tree.leaves(new_p)
                )

        label = f"GAT-{args.mode}-{args.method}" + (
            "-tuned" if args.tune else ""
        )
        try:
            t = device_loop_bench(
                step, x, params, graph, iters=args.iters, trials=2
            )
        except Exception as e:
            # persist the failure REASON, not just nan — committed nan
            # cells were undiagnosable after the fact (ADVICE r3)
            err = f"{type(e).__name__}: {e}"
            print(f"[{label}] {name} d={d}: FAILED ({err})")
            rows.append([name, label, d, float("nan"), err[:240]])
            continue
        print(
            f"[{label}] {name} d={d} hidden={args.hidden} "
            f"heads={args.heads}: {t:.3f} ms/{args.mode}"
        )
        rows.append([name, label, d, round(t, 4), ""])

    if args.csv:
        exists = os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as f:
            w = csv.writer(f)
            if not exists:
                w.writerow(["dataset", "method", "featdim", "time_ms", "error"])
            w.writerows(rows)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("graph")
    p.add_argument("--method", default="flash", choices=["flash", "ell"])
    p.add_argument("--mode", default="fwd", choices=["fwd", "train"])
    p.add_argument("--dims", default="64,256")
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--classes", type=int, default=32)
    p.add_argument("--block-h", type=int, default=128)
    p.add_argument("--seg", type=int, default=1)
    p.add_argument("--unroll", type=int, default=4)
    p.add_argument(
        "--no-split", action="store_true",
        help="use the per-lane fallback backward (no transpose plan)",
    )
    p.add_argument(
        "--tune", action="store_true",
        help="race attention variants first (tuner/attention.py) and "
        "bench the measured winner; label gains a '-tuned' suffix",
    )
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--csv", default="")
    args = p.parse_args()
    main(args)
