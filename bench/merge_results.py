#!/usr/bin/env python
"""Merge per-cell re-runs into results.csv (later files win per
(dataset, method, featdim) key)."""
import csv
import sys


def main(out, paths):
    rows = {}
    order = []
    for p in paths:
        with open(p) as f:
            for r in csv.reader(f):
                if not r or r[0] == "dataset":
                    continue
                key = (r[0], r[1], r[2])
                if key not in rows:
                    order.append(key)
                # a later nan must not clobber an earlier measured cell
                # (stall-killed re-runs write nan rows for cells an
                # earlier pass already landed)
                try:
                    new_nan = r[3] == "" or float(r[3]) != float(r[3])
                except (IndexError, ValueError):
                    new_nan = True
                if new_nan and key in rows:
                    continue
                rows[key] = (list(r) + ["", ""])[:6]
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["dataset", "method", "featdim", "time_ms", "floor_ms", "floor_pct"]
        )
        for key in order:
            w.writerow(rows[key])
    print(f"{out}: {len(order)} rows from {len(paths)} file(s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
