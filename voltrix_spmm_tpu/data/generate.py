"""Synthetic graph generators + locality reordering.

The reference benchmarks on 12 downloaded GNN datasets after a Rabbit
reorder (bench/graph_gen.py loads TC-GNN .npz files; the Voltrix/DTC
rows run on `--reorder`ed graphs). This environment has no network
egress, so the bench suite uses seeded synthetic stand-ins:

- `erdos_renyi_csr`: uniform random (the reference's own test config,
  tests/test_spmm.py: `sp.random(n, density)`),
- `rmat_csr`: R-MAT power-law graphs (Graph500-style) approximating the
  skewed degree distributions of reddit/ogbn-products,
- `reorder_rcm`: reverse Cuthill-McKee bandwidth reduction — the
  stand-in for the reference's Rabbit community reordering, which is
  what makes window-level column dedup effective.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def erdos_renyi_csr(num_nodes: int, density: float, seed: int = 0) -> sp.csr_matrix:
    rng = np.random.default_rng(seed)
    a = sp.random(
        num_nodes, num_nodes, density=density, format="csr", random_state=rng
    )
    a.data[:] = 1.0
    return a


def rmat_csr(
    scale: int,
    avg_degree: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
) -> sp.csr_matrix:
    """R-MAT graph with 2**scale nodes and ~avg_degree edges per node."""
    n = 1 << scale
    nnz = n * avg_degree
    rng = np.random.default_rng(seed)
    rows = np.zeros(nnz, dtype=np.int64)
    cols = np.zeros(nnz, dtype=np.int64)
    for _ in range(scale):
        p = rng.random(nnz)
        # quadrant probabilities (a | b / c | d)
        rbit = (p >= a + b).astype(np.int64)
        cbit = (((p >= a) & (p < a + b)) | (p >= a + b + c)).astype(np.int64)
        rows = rows * 2 + rbit
        cols = cols * 2 + cbit
    m = sp.csr_matrix(
        (np.ones(nnz, dtype=np.float32), (rows, cols)), shape=(n, n)
    )
    m.sum_duplicates()
    m.data[:] = 1.0
    return m


def symmetrize(a: sp.csr_matrix) -> sp.csr_matrix:
    s = ((a + a.T) != 0).astype(np.float32).tocsr()
    s.sum_duplicates()
    return s


def save_npz_graph(path: str, a: sp.csr_matrix) -> str:
    """Persist a graph in the bench .npz protocol (indptr/indices/
    num_nodes/nnz) — the stand-in for the reference's CSV dump protocol
    (bench/graph_gen.py:60-121)."""
    np.savez_compressed(
        path,
        indptr=a.indptr.astype(np.int32),
        indices=a.indices.astype(np.int32),
        num_nodes=np.int64(a.shape[0]),
        nnz=np.int64(a.nnz),
    )
    return path


def load_npz_graph(path: str) -> sp.csr_matrix:
    z = np.load(path)
    return sp.csr_matrix(
        (np.ones(int(z["nnz"]), np.float32), z["indices"], z["indptr"]),
        shape=(int(z["num_nodes"]), int(z["num_nodes"])),
    )


def reorder_rcm(a: sp.csr_matrix) -> tuple[sp.csr_matrix, np.ndarray]:
    """Reverse Cuthill-McKee reorder; returns (reordered csr, permutation)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    perm = reverse_cuthill_mckee(a, symmetric_mode=False)
    a2 = a[perm][:, perm].tocsr()
    a2.sort_indices()
    return a2, perm


def reorder_degree(a: sp.csr_matrix) -> tuple[sp.csr_matrix, np.ndarray]:
    """Degree-descending reorder — groups hub neighbors so window-level
    dedup collapses them; the strongest ordering for power-law graphs
    without community structure (beats RCM by ~20% gather volume on
    R-MAT in our measurements)."""
    deg = np.asarray(a.sum(axis=1)).ravel()
    perm = np.argsort(-deg, kind="stable")
    a2 = a[perm][:, perm].tocsr()
    a2.sort_indices()
    return a2, perm


def window_gather_volume(a: sp.csr_matrix, block_h: int = 1024) -> int:
    """Sum over row windows of distinct neighbor counts — the exact
    number of X rows an SpMM plan with this window height gathers
    (cheap proxy used to select an ordering)."""
    n = a.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(a.indptr))
    key = (rows // block_h) * n + a.indices.astype(np.int64)
    return int(np.unique(key).shape[0])


def reorder_auto(
    a: sp.csr_matrix,
    block_h: int = 1024,
    candidates: tuple[str, ...] = ("rcm",),
) -> tuple[sp.csr_matrix, np.ndarray, str]:
    """Pick the ordering (identity / RCM / degree) that minimizes window
    gather volume — the role the reference delegates to Rabbit
    reordering (its bench runs on `--reorder`ed graphs,
    bench/bench_all.py:121-129), made self-tuning.

    Note: gather volume is a proxy; measured kernel time can disagree
    (degree order gathered ~19% less than RCM on R-MAT yet ran ~25%
    slower end-to-end). For final selection, time candidates with the
    autotuner; this picker is for cheap preprocessing-time decisions."""
    n = a.shape[0]
    fns = {"rcm": reorder_rcm, "degree": reorder_degree}
    best = (window_gather_volume(a, block_h), a, np.arange(n), "identity")
    for name in candidates:
        a2, perm = fns[name](a)
        vol = window_gather_volume(a2, block_h)
        if vol < best[0]:
            best = (vol, a2, perm, name)
    return best[1], best[2], best[3]
