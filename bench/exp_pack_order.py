#!/usr/bin/env python
"""Build-time source-packing census (round-5, VERDICT r4 item #2).

The v5e gather law is per-ROW bound under ~1 KB rows, so the only lever
at fixed workload is FEWER, WIDER fetches: the packed gather
(gather_segment=q) fetches one (q*d)-wide super-row per q-aligned run
of needed columns, paying `ratio` (covered/needed lane inflation) in
kernel slots and gather bytes. Today runs are q-aligned in the NATURAL
column order (format/preprocess.py pack_ratios); the ratio gates q at
{2,4} and blocks reddit-class graphs entirely (ratio 1.47 at q=2).

This census asks: how much does a BUILD-TIME source permutation improve
the ratio? A permuted feature copy costs one n-row gather per call
(n/175e6 s — trivial next to the 10M-row plan gather), so any ratio
drop is nearly free. Orders tested:

  natural   — the file's (auto-reordered) ids, today's behavior
  freq      — columns sorted by how many windows reference them
              (hub columns co-occur in most windows -> their lanes
              pack into dense aligned runs in EVERY window)
  freq+tail — freq order, plus a hybrid split at the rank where
              window-frequency falls below q/2: packed plan for the
              dense head, seg=1 lanes for the scattered tail

For each (order, q): ratio, gather rows, gather-law ms, and the slot
inflation the kernel pays. Host-only (numpy) — no TPU needed.

Usage: python bench/exp_pack_order.py [rmat-17|reddit|path.npz]
       [--block-h 2048] [--d 256] [--qs 2,4,8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def census(win, col, n, qs, rank=None, label="natural", d=256, fb=2):
    """win/col: unique (window, col) lane pairs, sorted by (win, col).
    rank: optional permutation rank per column id (col -> position)."""
    u = win.shape[0]
    c = rank[col] if rank is not None else col
    order = np.lexsort((c, win))
    ws, cs = win[order], c[order]
    print(f"  [{label}] needed lanes u={u/1e6:.2f}M")
    for q in qs:
        gkey = ws * ((n // q) + 1) + cs // q
        groups = int(np.count_nonzero(np.diff(gkey))) + 1
        ratio = q * groups / u
        rows = groups  # one super-row fetch per q-group
        t_rows = rows / 175e6 * 1e3
        t_bytes = rows * q * d * fb / 340e9 * 1e3
        print(
            f"  [{label}] q={q}: ratio {ratio:.3f}  gather "
            f"{rows/1e6:.2f}M rows -> law max({t_rows:.2f}, "
            f"{t_bytes:.2f}) = {max(t_rows, t_bytes):.2f} ms  "
            f"(slot inflation x{ratio:.2f})"
        )


def hybrid_census(win, col, n, freq, qs, d=256, fb=2):
    """freq order + split: head (window-frequency >= thresh) packed at
    q, tail seg=1. Reports combined gather rows + slot inflation."""
    u = win.shape[0]
    order = np.argsort(-freq, kind="stable")
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    c = rank[col]
    f = freq[col]
    for q in qs:
        for thresh in (max(2, q // 2), q, 2 * q):
            head = f >= thresh
            uh = int(head.sum())
            ut = u - uh
            if uh == 0:
                continue
            wsh = win[head]
            csh = c[head]
            o = np.lexsort((csh, wsh))
            gkey = wsh[o] * ((n // q) + 1) + csh[o] // q
            groups = int(np.count_nonzero(np.diff(gkey))) + 1 if uh else 0
            head_ratio = q * groups / max(uh, 1)
            rows = groups + ut
            t_rows = rows / 175e6 * 1e3
            t_bytes = (groups * q + ut) * d * fb / 340e9 * 1e3
            slots = groups * q + ut
            print(
                f"  [freq+tail] q={q} fmin={thresh}: head {uh/1e6:.2f}M "
                f"lanes ratio {head_ratio:.3f} + tail {ut/1e6:.2f}M -> "
                f"gather {rows/1e6:.2f}M rows, law max({t_rows:.2f}, "
                f"{t_bytes:.2f}) = {max(t_rows, t_bytes):.2f} ms, "
                f"slots x{slots / u:.2f}"
            )


def main(args):
    import graph_gen

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
    qs = [int(x) for x in args.qs.split(",")]
    rows = np.repeat(
        np.arange(n, dtype=np.int64), np.diff(a.indptr.astype(np.int64))
    )
    uniq = np.unique((rows // args.block_h) * n + a.indices.astype(np.int64))
    win = uniq // n
    col = uniq % n
    u = uniq.shape[0]
    print(
        f"[{name}] n={n} nnz={a.nnz} block_h={args.block_h}: "
        f"{u/1e6:.2f}M needed lanes "
        f"(seg1 law {u/175e6*1e3:.2f} ms @175Mrows/s)"
    )
    census(win, col, n, qs, None, "natural", args.d)
    freq = np.bincount(col, minlength=n)  # windows referencing each col
    order = np.argsort(-freq, kind="stable")
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    census(win, col, n, qs, rank, "freq", args.d)
    hybrid_census(win, col, n, freq, qs, args.d)

    # incidence-mask order: sort columns by their exact window-incidence
    # bitset (lexicographic, window 0 most significant). Columns with
    # IDENTICAL incidence pack perfectly (all-or-none per window);
    # similar masks land adjacent. This keys on co-occurrence directly,
    # which frequency order only proxies.
    nw = int(win.max()) + 1 if win.size else 1
    nwords = _cdiv(nw, 64)
    masks = np.zeros((n, nwords), np.uint64)
    np.bitwise_or.at(
        masks,
        (col, (win // 64).astype(np.int64)),
        np.uint64(1) << ((63 - win % 64).astype(np.uint64)),
    )
    order = np.lexsort(tuple(masks[:, w] for w in range(nwords - 1, -1, -1)))
    # keep ordering stable among identical masks by natural id (locality)
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    census(win, col, n, qs, rank, "incidence", args.d)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("graph", nargs="?", default="rmat-17")
    p.add_argument("--block-h", type=int, default=2048)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--qs", default="2,4,8")
    args = p.parse_args()
    main(args)
