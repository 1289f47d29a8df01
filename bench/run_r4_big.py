#!/usr/bin/env python
"""Round-4 big-graph grid cells (reddit-proxy, ogbn-products-proxy).

The VM rotation wiped the round-3 tune cache; a full default-space
re-tune at 100M-nnz scale costs hours of isolated probes (each probe
re-preprocesses the graph). This runner instead races a SMALL explicit
candidate space seeded from the round-3 probe tables recorded in
docs/RESULTS.md (reddit: pregather h2048/u4 clustered-subtile bf16;
products: h512st/c32 bf16 + neighbors), through the same tune_spmm
machinery (isolated probes, validity filter, persistent cache under the
same `{name}-sweep` hash_tag so later runs — antidrift, bm_voltrix —
disk-hit the winner).

One (dataset, dim, method) cell per PROCESS (CLAUDE.md bench
pathology); rows append to results_r4_<dataset>.csv in the shared
protocol (dataset, method, featdim, time_ms).

Usage: python bench/run_r4_big.py <dataset> <dim> <voltrix|bcoo|csrell>
Reference role: bench/bench_all.py sweep cells for its two largest
graphs (reference bench/bench_all.py:21, plot.py:8).
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))


def voltrix_space(name: str, dim: int):
    """Explicit per-(graph, dim) race seeded from the round-3 probe
    tables (docs/RESULTS.md): the recorded winner, its streamed/
    unstreamed twin, and the chunk-scaled neighbor that survives the
    wider rows at d512/d1024 (gather bytes scale with d; stream_chunks
    must scale to keep one chunk's gather ~1-2 GB)."""
    from voltrix_spmm_tpu.tuner import Variant

    def pre(h, st, chunks=None):
        return Variant(
            "pregather", block_h=h, block_unroll=4, subtile=st,
            feat_dtype="bfloat16", stream_chunks=chunks,
        )

    if name == "reddit":
        # round-5 challenger at d256: the density-split hybrid with the
        # interleaved dense side (census: gather law 58 -> 24 ms at
        # 1.22x slots, format.density_split_stats; no flatten copy).
        # d512/d1024 stay off — the dense side's wide gather alone
        # (~9.3M lanes x 1-2 KB) exceeds HBM unstreamed.
        split = Variant(
            "hybrid", block_h=2048, gather_segment=8, block_unroll=8,
            subtile=True, hybrid_dense="pregather", ipack=True,
            feat_dtype="bfloat16",
        )
        return {
            256: [pre(2048, True), pre(2048, True, 8), pre(512, True, 32),
                  split],
            512: [pre(2048, True), pre(2048, True, 8), pre(2048, True, 16)],
            1024: [pre(2048, True, 8), pre(2048, True, 16), pre(2048, True, 32)],
        }[dim]
    if name == "ogbn-products":
        return {
            256: [pre(512, True, 32), pre(512, False, 32), pre(512, True, 64)],
            512: [pre(512, True, 32), pre(512, True, 64), pre(512, True, 128)],
            1024: [pre(512, True, 64), pre(512, True, 128), pre(512, True, 256)],
        }[dim]
    return None  # fall back to the full default space


def main(args):
    import jax.numpy as jnp

    import graph_gen
    from bench_all import methods_registry
    from voltrix_spmm_tpu.runtime import native_available, native_spmm_oracle
    from voltrix_spmm_tpu.ops import spmm_scipy
    from voltrix_spmm_tpu.utils import calc_diff, device_loop_bench

    name, d = args.dataset, args.dim
    path = os.path.join(HERE, "data", f"{name}.reorder.npz")
    if not os.path.exists(path):
        path = graph_gen.generate(name, os.path.join(HERE, "data"), reorder=True)
    a = graph_gen.load(path)
    n = a.shape[0]
    print(f"[{name}] n={n} nnz={a.nnz} d={d} method={args.method}")

    rng = np.random.default_rng(0)
    feat_np = rng.standard_normal((n, d)).astype(np.float32)
    oracle_fn = (
        native_spmm_oracle if native_available()
        else (lambda ip, ix, nn, f: spmm_scipy(ip, ix, nn, f))
    )

    label, t, err = args.method, None, ""
    try:
        feat = jnp.asarray(feat_np)
        feat.block_until_ready()
        oracle = oracle_fn(a.indptr, a.indices, n, feat_np)
        if args.method == "voltrix":
            label = "Voltrix"
            from voltrix_spmm_tpu.tuner import tune_spmm
            from voltrix_spmm_tpu.tuner.tuner import _run_variant

            tuned = tune_spmm(
                a.indptr, a.indices, n, feat_np,
                space=voltrix_space(name, d), hash_tag=f"{name}-sweep",
            )
            print(f"[tune] winner: {tuned.variant.key()} "
                  f"({tuned.time_ms:.3f} ms)")
            fn = lambda x, p, v=tuned.variant: _run_variant(v, p, x)
            rest = (tuned.plan,)
        else:
            label = {"bcoo": "BCOO", "csrell": "CSR-ELL"}[args.method]
            fn, plan = methods_registry()[label](a, feat_np)
            rest = () if plan is None else (plan,)
        out = np.asarray(fn(feat, *rest))
        diff = calc_diff(out, oracle)
        assert diff < 1e-4, f"accuracy failure: {diff}"
        del out
        try:
            t = device_loop_bench(
                lambda c, *r, fn=fn: fn(c, *r), feat, *rest,
                iters=args.iters, trials=2,
            )
        except Exception as loop_err:
            if "RESOURCE_EXHAUSTED" not in str(loop_err):
                raise
            from voltrix_spmm_tpu.utils import device_trace_bench

            t = device_trace_bench(
                lambda c, *r, fn=fn: fn(c, *r), feat, *rest, iters=3
            )
            print(f"[{label}] {name} d={d}: loop harness OOM'd; "
                  "timed via device_trace_bench")
        print(f"[{label}] {name} d={d}: {t:.3f} ms (diff {diff*100:.4f}%)")
    except Exception as e:
        err = f"{type(e).__name__}: {e}"
        print(f"[{label}] {name} d={d}: FAILED ({err})")

    out_csv = os.path.join(HERE, args.csv or f"results_r4_{name}.csv")
    exists = os.path.exists(out_csv)
    with open(out_csv, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(["dataset", "method", "featdim", "time_ms"])
        w.writerow([name, label, d,
                    round(t, 4) if t is not None else float("nan")])
    print(f"row -> {out_csv}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("dataset")
    p.add_argument("dim", type=int)
    p.add_argument("method", choices=["voltrix", "bcoo", "csrell"])
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--csv", default="")
    main(p.parse_args())
