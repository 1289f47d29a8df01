#!/usr/bin/env python
"""Plot speedup-over-baseline bars from results.csv (reference:
bench/plot.py renders the paper's Figure-9 grid — per-dataset bars of
speedup over cuSPARSE; here the baseline is BCOO)."""

from __future__ import annotations

import argparse
import os


def main(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(args.results)
    # per-dataset baseline: the requested one where it ran; else the
    # strongest independent fallback (reddit-class graphs have no BCOO
    # cell — every edge-parallel BCOO formulation exceeds HBM — so
    # CSR-ELL plays the baseline role there, annotated in the title)
    fallbacks = [args.baseline, "CSR-ELL", "XLA-gather"]
    base_rows = []
    base_name = {}
    for ds, sub in df.groupby("dataset"):
        for cand in fallbacks:
            cells = sub[(sub.method == cand) & sub.time_ms.notna()]
            if len(cells):
                base_name[ds] = cand
                base_rows.append(
                    cells.set_index(["dataset", "featdim"])["time_ms"]
                )
                break
    base = pd.concat(base_rows).rename("base_ms") if base_rows else None
    df = df.join(base, on=["dataset", "featdim"])
    df["speedup"] = df.base_ms / df.time_ms
    df = df[
        df.apply(
            lambda r: r.method != base_name.get(r.dataset, args.baseline),
            axis=1,
        )
    ]

    datasets = sorted(df.dataset.unique())
    dims = sorted(df.featdim.unique())
    ncols = min(4, len(datasets))
    nrows = -(-len(datasets) // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False
    )
    methods = sorted(df.method.unique())
    width = 0.8 / max(len(methods), 1)
    for i, ds in enumerate(datasets):
        ax = axes[i // ncols][i % ncols]
        sub = df[df.dataset == ds]
        for j, m in enumerate(methods):
            mm = sub[sub.method == m].sort_values("featdim")
            xs = [dims.index(v) + j * width for v in mm.featdim]
            ax.bar(xs, mm.speedup, width=width, label=m)
        ax.axhline(1.0, color="k", lw=0.8, ls="--")
        ax.set_xticks([k + width * (len(methods) - 1) / 2 for k in range(len(dims))])
        ax.set_xticklabels([str(v) for v in dims])
        bn = base_name.get(ds, args.baseline)
        ax.set_title(ds if bn == args.baseline else f"{ds} (vs {bn})")
        ax.set_ylabel(f"speedup vs {bn}")
    axes[0][0].legend(fontsize=7)
    for k in range(len(datasets), nrows * ncols):
        axes[k // ncols][k % ncols].axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"plot -> {args.out}")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    p = argparse.ArgumentParser()
    p.add_argument("--results", default=os.path.join(here, "results.csv"))
    p.add_argument("--baseline", default="BCOO")
    p.add_argument("--out", default=os.path.join(here, "results.png"))
    main(p.parse_args())
