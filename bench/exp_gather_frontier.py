#!/usr/bin/env python
"""Gather-frontier experiment (round-4 verdict item #5).

The reddit-proxy d256 tuned cell (100.65 ms) is gather-dominated: the
clustered h2048 plan issues 10.2M dynamic-slice rows at the v5e per-row
law (~175 Mrows/s, order/dtype-independent under ~1-2 KB rows —
docs/DESIGN.md). The verdict asks whether BUILD-TIME ROW PACKING or a
HIERARCHICAL TWO-LEVEL GATHER can beat that floor. This script makes
the decisive measurements; each runs under `device_loop_bench` and
prints one line. Run ONE graph per process (CLAUDE.md bench pathology).

Measurements:
  raw       — jnp.take of the plan's hind rows (the isolated gather)
  wide2     — same row count, 2x-wide rows ([x||x]): if ~equal time,
              the gather is row-ISSUE-bound at this width and batching
              independent planes through one gather is free bandwidth
              (the lever the mh attention op exploits)
  small-src — same hind modulo a 65536-row source: if ~equal time,
              source size/locality is irrelevant and a two-level
              gather's level-2 (window rows from packed superblock
              unions) pays the SAME per-row floor as the direct
              gather — i.e. level 1 is pure overhead
  union census (host) — per-superblock (S consecutive windows) union
              row counts: the level-1 row count a two-level scheme
              would add on top of level-2's full row count

Together these compose the verdict: two-level = raw + L1 > raw, and
the only way past the row floor at fixed row count is wider rows —
available only when the WORKLOAD has multiple planes to batch
(attention q/k/v/dO; multi-feature inference), not for single-plane
SpMM. Reference role: spmm_kernels.cuh:1563-1570 bulk-copies gathered
rows per TMA transaction — the TPU analogue of "fewer, wider fetches".

Usage: python bench/exp_gather_frontier.py [rmat-17|reddit|path.npz]
       [--block-h 2048] [--d 256] [--super 16]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(args):
    import jax.numpy as jnp

    import graph_gen
    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.utils import device_loop_bench

    if os.path.exists(args.graph):
        a = graph_gen.load(args.graph)
        name = os.path.basename(args.graph).split(".")[0]
    else:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "data",
            f"{args.graph}.reorder.npz",
        )
        if not os.path.exists(path):
            path = graph_gen.generate(
                args.graph,
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "data"),
                reorder=True,
            )
        a = graph_gen.load(path)
        name = args.graph
    n = a.shape[0]
    cfg = PlanConfig(
        args.block_h, 128, 1, block_unroll=4, cluster_cols=True
    )
    plan = csr_preprocess(a.indptr, a.indices, n, cfg)
    hind = np.asarray(plan.hind).reshape(-1)
    rows = hind.shape[0]
    print(
        f"[{name}] n={n} nnz={a.nnz} block_h={args.block_h} "
        f"gather rows={rows/1e6:.2f}M ({rows/a.nnz:.3f} rows/nnz)"
    )

    # host census: two-level superblock union sizes (level-1 rows)
    blocks_per_window = np.diff(np.asarray(plan.block_ptr))
    window_of_block = np.repeat(
        np.arange(blocks_per_window.shape[0]), blocks_per_window
    )
    sb_of_block = window_of_block // args.super
    hind2d = np.asarray(plan.hind)  # (TB, K)
    l1_rows = 0
    for sb in range(int(sb_of_block.max()) + 1 if rows else 0):
        sel = hind2d[sb_of_block == sb]
        l1_rows += np.unique(sel).shape[0]
    print(
        f"[{name}] two-level census (S={args.super} windows/superblock): "
        f"level-1 union rows={l1_rows/1e6:.2f}M "
        f"(+{100.0 * l1_rows / max(rows, 1):.1f}% on top of level-2's "
        f"{rows/1e6:.2f}M) -> two-level total "
        f"{(l1_rows + rows)/1e6:.2f}M rows vs direct {rows/1e6:.2f}M"
    )

    rng = np.random.default_rng(0)
    feat = jnp.asarray(
        rng.standard_normal((n, args.d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    hind_dev = jnp.asarray(hind)

    def bench(label, fn, *xs):
        try:
            t = device_loop_bench(fn, *xs, iters=args.iters, trials=2)
        except Exception as e:
            print(f"[{name}] {label}: FAILED ({type(e).__name__}: {e})")
            return None
        mrows = rows / (t * 1e-3) / 1e6
        print(f"[{name}] {label}: {t:.3f} ms ({mrows:.0f} Mrows/s)")
        return t

    # raw: the production gather (bf16 rows, d lanes)
    bench(
        "raw gather (bf16 d%d)" % args.d,
        lambda c, h: jnp.take(c, h, axis=0, mode="clip").sum(axis=0)[None]
        * 0.0 + c[:1],
        feat, hind_dev,
    )
    # wideN: identical row count, N x bytes — row-bound if ~equal.
    # Round-5 rmat-17 result: wide2 measured 4x SLOWER per row (2.66 ->
    # 11.0 ms), overturning the flat-to-1KB row law and dead-ending the
    # packed super-row designs; wide4/wide8 chart where (if anywhere)
    # the wide fetch becomes bandwidth-efficient again.
    for w in (2, 4, 8):
        if rows * w * args.d * 2 > 8 * 2**30:
            print(f"[{name}] wide{w}: skipped (materialized gather "
                  f"{rows * w * args.d * 2 / 2**30:.1f} GiB exceeds HBM)")
            continue
        featw = jnp.concatenate([feat] * w, axis=1)
        bench(
            "wide%d gather (bf16 %dx%d)" % (w, w, args.d),
            lambda c, h: jnp.take(c, h, axis=0, mode="clip").sum(axis=0)[
                None
            ]
            * 0.0 + c[:1],
            featw, hind_dev,
        )
        del featw
    # f32 control at the same BYTE width as wide2-bf16: distinguishes a
    # genuine byte-width penalty from a bf16 (16,128)-tiling artifact
    featf32 = feat.astype(jnp.float32)
    bench(
        "wide1-f32 gather (f32 %d = wide2-bf16 bytes)" % args.d,
        lambda c, h: jnp.take(c, h, axis=0, mode="clip").sum(axis=0)[None]
        * 0.0 + c[:1],
        featf32, hind_dev,
    )
    del featf32
    # small-src: same rows from a 64k source — locality-irrelevance probe
    small = feat[: min(n, 65536)]
    hs = jnp.asarray(hind % small.shape[0])
    bench(
        "small-src gather (64k rows)",
        lambda c, h: jnp.take(c, h, axis=0, mode="clip").sum(axis=0)[None]
        * 0.0 + c[:1],
        small, hs,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("graph", nargs="?", default="rmat-17")
    p.add_argument("--block-h", type=int, default=2048)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--super", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    main(args)
