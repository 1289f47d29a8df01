#!/usr/bin/env python
"""Baseline driver (reference: bench/bm_sparse.py et al.) — runs a
baseline method (bcoo / xla-gather / dense) on one dataset and prints
`[<method>] ... time: X ms`."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax.numpy as jnp

    import graph_gen
    from voltrix_spmm_tpu.ops import spmm_scipy
    from voltrix_spmm_tpu.ops.baselines import (
        make_bcoo_spmm,
        make_dense_spmm,
        make_gather_segment_spmm,
    )
    from voltrix_spmm_tpu.utils import calc_diff, device_loop_bench

    a = graph_gen.load(args.graph)
    n = a.shape[0]
    rng = np.random.default_rng(0)
    feat_np = rng.standard_normal((n, args.dim)).astype(np.float32)
    feat = jnp.asarray(feat_np)

    maker = {
        "bcoo": make_bcoo_spmm,
        "xla-gather": make_gather_segment_spmm,
        "dense": make_dense_spmm,
    }[args.method]
    made = maker(a)
    # dense returns (fn, dense-array): the array travels as a traced
    # ARGUMENT — closing hundreds of MB over jit blows the
    # remote-compile request (HTTP 413)
    fn, rest = (made[0], (made[1],)) if isinstance(made, tuple) else (made, ())
    out = np.asarray(fn(feat, *rest))
    diff = calc_diff(out, spmm_scipy(a.indptr, a.indices, n, feat_np))
    t = device_loop_bench(lambda c, *r: fn(c, *r), feat, *rest, iters=10)
    print(f"[{args.method}] difference rate: {diff * 100:.4f}%")
    print(f"[{args.method}] n={n} nnz={a.nnz} dim={args.dim} time: {t:.3f} ms")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("graph")
    p.add_argument("--method", default="bcoo", choices=["bcoo", "xla-gather", "dense"])
    p.add_argument("--dim", type=int, default=256)
    main(p.parse_args())
