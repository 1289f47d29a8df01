#!/usr/bin/env python
"""Render markdown summary tables from the merged grid CSV so the
README / RESULTS refresh is mechanical and always agrees with the
freshest data (round-4 verdict weak #4: the repo's public face must
match its CSVs).

Usage: python bench/render_tables.py [--results results_real_all.csv]
       [--dim 256]
Prints: per-dataset best-Voltrix vs best-baseline speedup table
(markdown) + a coverage summary of the reference 12x3 grid.
"""

from __future__ import annotations

import argparse
import csv
import math
import os

REF_DATASETS = [
    "amazon0505", "DD", "ppi", "reddit", "amazon0601", "com-amazon",
    "ddi", "FraudYelp-RSR", "web-BerkStan", "protein", "YeastH", "Yeast",
]
BASELINES = ["BCOO", "CSR-ELL", "XLA-gather", "Dense"]


def load(path):
    cells = {}
    with open(path) as f:
        for r in csv.reader(f):
            if not r or r[0] == "dataset":
                continue
            try:
                t = float(r[3])
            except (IndexError, ValueError):
                continue
            if math.isnan(t):
                continue
            key = (r[0], r[1], int(r[2]))
            floor = r[5] if len(r) > 5 and r[5] else ""
            cells[key] = (t, floor)
    return cells


def main(args):
    cells = load(args.results)
    dims = (
        [args.dim] if args.dim else [256, 512, 1024]
    )
    print(f"| dataset | d | Voltrix | baseline | speedup | %-of-floor |")
    print("|---|---|---|---|---|---|")
    for ds in REF_DATASETS:
        for dim in dims:
            vx = cells.get((ds, "Voltrix", dim))
            base = None
            for b in BASELINES:
                if (ds, b, dim) in cells:
                    t = cells[(ds, b, dim)][0]
                    if base is None or t < base[1]:
                        base = (b, t)
            if vx and base:
                fl = f"{vx[1]}%" if vx[1] else "—"
                print(
                    f"| {ds}-proxy | {dim} | {vx[0]:.3f} ms | "
                    f"{base[1]:.1f} ms ({base[0]}) | "
                    f"**{base[1] / vx[0]:.1f}×** | {fl} |"
                )
            else:
                missing = []
                if not vx:
                    missing.append("Voltrix")
                if not base:
                    missing.append("baseline")
                print(f"| {ds}-proxy | {dim} | — | — | missing: "
                      f"{','.join(missing)} | — |")
    # coverage summary
    total = have = 0
    holes = []
    for ds in REF_DATASETS:
        for d in (256, 512, 1024):
            total += 1
            vx = (ds, "Voltrix", d) in cells
            bl = any((ds, b, d) in cells for b in BASELINES)
            if vx and bl:
                have += 1
            else:
                holes.append(f"{ds}/d{d}" + ("" if vx else "[no vx]")
                             + ("" if bl else "[no base]"))
    print(f"\ngrid coverage: {have}/{total} cells with Voltrix + >=1 "
          f"baseline; holes: {', '.join(holes) if holes else 'none'}")


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    p = argparse.ArgumentParser()
    p.add_argument(
        "--results", default=os.path.join(here, "results_real_all.csv")
    )
    p.add_argument(
        "--dim", type=int, default=0,
        help="single featdim to render (default: all of 256/512/1024)",
    )
    args = p.parse_args()
    main(args)
