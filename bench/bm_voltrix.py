#!/usr/bin/env python
"""Single-method driver (reference: bench/bm_voltrix.py) — runs the
autotuned Voltrix-TPU SpMM on one dataset, validates vs the scipy
golden output, prints `[Voltrix] ... time: X ms`."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax.numpy as jnp

    import graph_gen
    from voltrix_spmm_tpu.tuner import tune_spmm
    from voltrix_spmm_tpu.ops import spmm_scipy
    from voltrix_spmm_tpu.utils import calc_diff, device_loop_bench

    a = graph_gen.load(args.graph)
    n = a.shape[0]
    rng = np.random.default_rng(0)
    feat_np = rng.standard_normal((n, args.dim)).astype(np.float32)
    feat = jnp.asarray(feat_np)

    tuned = tune_spmm(
        a.indptr, a.indices, n, feat_np, hash_tag=args.tag or None
    )
    out = np.asarray(tuned(feat))
    diff = calc_diff(out, spmm_scipy(a.indptr, a.indices, n, feat_np))
    # pass the plan as a jit ARGUMENT — closing large plans over jit blows
    # the remote-compile payload (HTTP 413) on big graphs
    from voltrix_spmm_tpu.tuner.tuner import _run_variant

    t = device_loop_bench(
        lambda c, p, v=tuned.variant, pe=tuned.perm, ip=tuned.inv_perm:
            _run_variant(v, p, c, pe, ip),
        feat,
        tuned.plan,
        iters=args.iters,
    )
    print(f"[Voltrix] variant: {tuned.variant.key()}")
    print(f"[Voltrix] difference rate: {diff * 100:.4f}%")
    print(f"[Voltrix] n={n} nnz={a.nnz} dim={args.dim} time: {t:.3f} ms")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("graph", help="path to .npz from graph_gen.py")
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument(
        "--tag", default="",
        help="tune-cache hash_tag (use '<dataset>-sweep' to share the "
        "bench_all cache on huge graphs instead of rehashing/retuning)",
    )
    main(p.parse_args())
