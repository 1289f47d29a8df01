#!/usr/bin/env python
"""Anti-drift measurement protocol for headline benchmark cells.

Round-3 history: two headline cells (rmat-17 training 9.25/11.48 ms,
web-BerkStan d256) were later corrected because a single-session
measurement had absorbed a session-local artifact (plan re-upload /
device-buffer fragmentation). The protocol that caught it — median of
>=3 FRESH-PROCESS sessions with an er-8k control run in each session —
is made repeatable here (VERDICT round-3 item #6).

Each session is one subprocess per cell (the CLAUDE.md bench pathology:
back-to-back benches of different programs in one process can read
30-50x inflated). The er-8k control validates the box/relay itself:
if the control drifts >20% from its reference value the session is
marked suspect and re-run once.

Usage: python bench/antidrift.py [--sessions 3] [--cells a,b,...]
Writes results_antidrift.csv: cell, sessions..., median, spread_pct,
controls. Reference role: voltrix/utils.py:324-350 (warmup+iters
timing protocol) taken to the cross-process level the TPU relay needs.
"""

import argparse
import csv
import os
import re
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# cell -> (argv relative to bench/, regex with one float group for ms)
TIME_RE = r"time: ([0-9.]+) ms"
TRAIN_RE = r"GCN-train-Voltrix.*?([0-9.]+) ms"
CELLS = {
    "er8k-control": (
        ["python", "bm_voltrix.py", "data/er-8k.reorder.npz",
         "--dim", "256"],
        TIME_RE,
    ),
    "rmat17-d256": (
        ["python", "bm_voltrix.py", "data/rmat-17.reorder.npz",
         "--dim", "256", "--tag", "rmat-17-sweep"],
        TIME_RE,
    ),
    "reddit-d256": (
        ["python", "bm_voltrix.py", "data/reddit.reorder.npz",
         "--dim", "256", "--tag", "reddit-sweep"],
        TIME_RE,
    ),
    "products-d256": (
        ["python", "bm_voltrix.py", "data/ogbn-products.reorder.npz",
         "--dim", "256", "--tag", "ogbn-products-sweep"],
        TIME_RE,
    ),
    "rmat17-train-d64": (
        ["python", "bm_gcn.py", "data/rmat-17.reorder.npz", "--train",
         "--dims", "64", "--methods", "Voltrix"],
        TRAIN_RE,
    ),
    "rmat17-train-d256": (
        ["python", "bm_gcn.py", "data/rmat-17.reorder.npz", "--train",
         "--dims", "256", "--methods", "Voltrix"],
        TRAIN_RE,
    ),
}
CONTROL = "er8k-control"
CONTROL_REF_MS = 0.199  # round-2 verified er-8k d256 cell
CONTROL_TOL = 0.20


def run_cell(argv, pattern, timeout):
    try:
        p = subprocess.run(
            argv, cwd=HERE, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return None, "timeout"
    m = re.search(pattern, p.stdout, re.S)
    if not m:
        tail = (p.stdout + p.stderr)[-300:].replace("\n", " | ")
        return None, f"no-match rc={p.returncode}: {tail}"
    return float(m.group(1)), ""


def main(args):
    names = args.cells.split(",") if args.cells else [
        c for c in CELLS if c != CONTROL
    ]
    results = {c: [] for c in names}
    controls = []
    session = 0
    retried = False
    while session < args.sessions:
        ctl, err = run_cell(*CELLS[CONTROL], timeout=args.timeout)
        ok = ctl is not None and (
            abs(ctl - CONTROL_REF_MS) / CONTROL_REF_MS <= CONTROL_TOL
        )
        print(f"[session {session + 1}] control er-8k: "
              f"{ctl if ctl is not None else err} ms "
              f"({'ok' if ok else 'SUSPECT'})", flush=True)
        if not ok and not retried:
            retried = True  # one free re-roll: relay blip, not a session
            continue
        retried = False
        controls.append(ctl if ctl is not None else float("nan"))
        for c in names:
            t, err = run_cell(*CELLS[c], timeout=args.timeout)
            results[c].append(t if t is not None else float("nan"))
            print(f"[session {session + 1}] {c}: "
                  f"{t if t is not None else 'FAILED ' + err} ms",
                  flush=True)
        session += 1

    out = os.path.join(HERE, "results_antidrift.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["cell"]
            + [f"s{i + 1}_ms" for i in range(args.sessions)]
            + ["median_ms", "spread_pct", "controls_ms"]
        )
        for c in names:
            vals = [v for v in results[c] if v == v]  # drop nan
            med = statistics.median(vals) if vals else float("nan")
            spread = (
                100.0 * (max(vals) - min(vals)) / med if vals else
                float("nan")
            )
            w.writerow(
                [c]
                + [f"{v:.3f}" for v in results[c]]
                + [f"{med:.3f}", f"{spread:.1f}",
                   "/".join(f"{x:.3f}" for x in controls)]
            )
            print(f"[median] {c}: {med:.3f} ms (spread {spread:.1f}%)")
    print(f"wrote {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sessions", type=int, default=3)
    p.add_argument("--cells", default="")
    p.add_argument("--timeout", type=int, default=2400)
    main(p.parse_args())
