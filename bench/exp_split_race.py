#!/usr/bin/env python
"""Race the round-5 gather-frontier designs against the round-4
champion on one graph (default rmat-17 d256).

Candidates: the reigning packed-q2 clustered-subtile pregather, the
density-split hybrid (packed >= q/2-full runs + exact tail,
ops/hybrid.py dense_impl='pregather'), and pure incidence-packed q4/q8
(format.preprocess.incidence_order). Uses the production tuner so
timing protocol and validity filtering match the headline
(bench.py). Prints one JSON line with every candidate's ms.

Usage: python bench/exp_split_race.py [graph] [--d 256]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(args):
    import graph_gen
    from voltrix_spmm_tpu.tuner import Variant, tune_spmm

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
    n = a.shape[0]
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((n, args.d)).astype(np.float32)

    space = [
        # round-4 headline champion (s1 u8) + its u4 twin
        Variant(
            "pregather", block_h=2048, block_unroll=8, subtile=True,
            feat_dtype="bfloat16",
        ),
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16",
        ),
        # round-5 interleaved packed (no flatten copy): pure q2/q4
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16", gather_segment=2, ipack=True,
        ),
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16", gather_segment=4, ipack=True,
        ),
        # round-5 density split (q8 t4), interleaved dense side
        Variant(
            "hybrid", block_h=2048, gather_segment=8, block_unroll=8,
            subtile=True, feat_dtype="bfloat16",
            hybrid_dense="pregather", ipack=True,
        ),
        # incidence ordering composed with the interleaved pack
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16", gather_segment=4,
            pack_order="incidence", ipack=True,
        ),
    ]
    tuned = tune_spmm(
        a.indptr, a.indices, n, feat, space=space,
        hash_tag=f"exp-split-{args.graph}",
    )
    print(
        json.dumps(
            {
                "metric": f"split_race_{args.graph}_d{args.d}",
                "winner": tuned.variant.key(),
                "winner_ms": round(tuned.time_ms, 4),
                "candidates_ms": {
                    k: round(v, 4) for k, v in tuned.candidates.items()
                },
            }
        )
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("graph", nargs="?", default="rmat-17")
    p.add_argument("--d", type=int, default=256)
    args = p.parse_args()
    main(args)
