#!/usr/bin/env python
"""Benchmark dataset generation (reference: bench/graph_gen.py).

The reference loads 12 downloaded GNN datasets (.npz via TC-GNN) and
dumps a CSV protocol + cuSPARSE golden output. This environment has no
network egress, so seeded synthetic stand-ins covering the same regimes
(uniform, power-law/skewed, community-clustered, small-diameter) are
generated instead, with the scipy oracle as the golden output protocol.

Usage: python bench/graph_gen.py [--out DIR] [--datasets a,b,c] [--reorder]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voltrix_spmm_tpu.data import (
    erdos_renyi_csr,
    reorder_auto,
    reorder_rcm,
    rmat_csr,
    symmetrize,
)


def sbm_csr(n, comm, in_deg=12, out_deg=4, seed=0) -> sp.csr_matrix:
    """Community-clustered graph (stochastic-block-model-like)."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=n * in_deg)
    dst = (src // comm) * comm + rng.integers(0, comm, size=src.shape[0])
    src2 = rng.integers(0, n, size=n * out_deg)
    dst2 = rng.integers(0, n, size=src2.shape[0])
    rows = np.concatenate([src, src2])
    cols = np.concatenate([dst, dst2])
    m = sp.csr_matrix(
        (np.ones(rows.shape[0], np.float32), (rows, cols)), shape=(n, n)
    )
    m.sum_duplicates()
    m.data[:] = 1.0
    return m


DATASETS = {
    # name -> builder; regimes match the reference's dataset families
    # (uniform test config, power-law reddit-like, clustered community,
    # small dense protein-like)
    "er-8k": lambda: symmetrize(erdos_renyi_csr(8192, 0.01, seed=0)),
    "er-32k": lambda: symmetrize(erdos_renyi_csr(32768, 0.003, seed=1)),
    "rmat-17": lambda: symmetrize(rmat_csr(17, 16, seed=0)),
    "sbm-131k": lambda: symmetrize(sbm_csr(131072, 512, seed=0)),
    "dense-4k": lambda: symmetrize(erdos_renyi_csr(4096, 0.08, seed=2)),
}


def generate(name: str, out_dir: str, reorder: bool = False) -> str:
    if name in DATASETS:
        a = DATASETS[name]()
    else:
        # reference dataset names (bench/plot.py:8, BASELINE.json): the
        # real TC-GNN .npz when $VOLTRIX_TPU_DATASETS provides it, else
        # the published-stats proxy (voltrix_spmm_tpu/data/real.py);
        # symmetrized per GNN adjacency convention
        from voltrix_spmm_tpu.data import load_graph
        from voltrix_spmm_tpu.data import symmetrize as _sym

        a, label = load_graph(name)
        a = _sym(a)
        print(f"[graph_gen] {name}: source = {label}")
    if reorder:
        # pick identity/RCM/degree by window gather volume: a graph whose
        # natural ids are already community-contiguous (SBM) is KEPT —
        # RCM measured 2.3x slower than identity on sbm-131k
        a, _, order = reorder_auto(a)
        print(f"[graph_gen] {name}: ordering = {order}")
    path = os.path.join(out_dir, f"{name}{'.reorder' if reorder else ''}.npz")
    np.savez_compressed(
        path,
        indptr=a.indptr.astype(np.int32),
        indices=a.indices.astype(np.int32),
        num_nodes=np.int64(a.shape[0]),
        nnz=np.int64(a.nnz),
    )
    print(f"[graph_gen] {name}: n={a.shape[0]} nnz={a.nnz} -> {path}")
    return path


def load(path: str):
    z = np.load(path)
    a = sp.csr_matrix(
        (
            np.ones(int(z["nnz"]), np.float32),
            z["indices"],
            z["indptr"],
        ),
        shape=(int(z["num_nodes"]), int(z["num_nodes"])),
    )
    return a


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "data"))
    p.add_argument("--datasets", default=",".join(DATASETS))
    p.add_argument("--reorder", action="store_true")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in args.datasets.split(","):
        generate(name, args.out, args.reorder)
