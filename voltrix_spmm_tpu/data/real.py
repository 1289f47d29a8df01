"""Real-dataset loading (reference protocol) + stat-matched proxies.

The reference evaluates on 12 downloaded GNN graphs in TC-GNN `.npz`
format (`/root/reference/bench/graph_gen.py:47` loads via
`TCGNN_dataset(path.npz, ...)`; the file carries `src_li`/`dst_li` edge
lists and `num_nodes`; dataset names at `/root/reference/bench/plot.py:8`).

Acquisition status in this environment (documented per BASELINE.md):
no network egress exists — `pip download` reaches no index, raw sockets
are refused, and no graph files ship in the image — so the real files
cannot be fetched here. This module therefore provides BOTH:

1. `load_tcgnn_npz` / `load_graph`: the reference's exact on-disk
   protocol. Drop the real `reddit.npz` etc. into
   `$VOLTRIX_TPU_DATASETS` (default `./datasets`) and every bench runs
   on the genuine graphs unchanged.
2. `proxy_csr`: seeded Chung-Lu + community generators matched to each
   dataset's PUBLISHED node/edge counts and degree-distribution family,
   used (and clearly labeled `<name>-proxy`) when the real file is
   absent. A proxy matches scale and skew, not the exact adjacency —
   speedups on it are indicative, not citable as the real graph.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

logger = logging.getLogger("voltrix_tpu")

DATASETS_DIR_FLAG = "VOLTRIX_TPU_DATASETS"


def load_tcgnn_npz(path: str) -> sp.csr_matrix:
    """Load a TC-GNN-format graph: npz with `src_li`, `dst_li`,
    `num_nodes` (the reference's dataset container,
    bench/graph_gen.py:47). Returns binary CSR with duplicate edges
    collapsed. Also accepts this repo's indptr/indices protocol
    (data/generate.py:67 save_npz_graph)."""
    z = np.load(path, allow_pickle=True)
    keys = set(z.files)
    if {"src_li", "dst_li"} <= keys:
        src = np.asarray(z["src_li"]).reshape(-1).astype(np.int64)
        dst = np.asarray(z["dst_li"]).reshape(-1).astype(np.int64)
        n = int(z["num_nodes"]) if "num_nodes" in keys else int(
            max(src.max(), dst.max()) + 1
        )
        a = sp.csr_matrix(
            (np.ones(src.shape[0], np.float32), (src, dst)), shape=(n, n)
        )
        a.sum_duplicates()
        a.data[:] = 1.0
        return a
    if {"indptr", "indices"} <= keys:
        from .generate import load_npz_graph

        return load_npz_graph(path)
    raise ValueError(
        f"{path}: unrecognized graph npz (keys {sorted(keys)}); expected "
        "TC-GNN src_li/dst_li or indptr/indices"
    )


@dataclass(frozen=True)
class PublishedStats:
    num_nodes: int
    num_edges: int  # directed edge count as published
    kind: str  # "powerlaw" | "community" | "dense" | "mesh"
    note: str = ""


# Published sizes for the reference's evaluation set (bench/plot.py:8)
# and the BASELINE.json perf targets. Sources: GraphSAGE paper (reddit),
# OGB paper (ogbn-*, ddi), SNAP (amazon0505/0601, com-amazon,
# web-BerkStan), TC-GNN dataset table (DD, ppi, YeastH, Yeast).
PUBLISHED: dict[str, PublishedStats] = {
    "reddit": PublishedStats(232965, 114615892, "community",
                             "GraphSAGE; avg deg ~492, strong subreddit locality"),
    "ogbn-arxiv": PublishedStats(169343, 1166243, "powerlaw", "citation"),
    "ogbn-products": PublishedStats(2449029, 61859140, "community",
                                    "co-purchase; avg deg ~50"),
    "ddi": PublishedStats(4267, 1334889, "dense", "ogbl-ddi; ~7% density"),
    "amazon0505": PublishedStats(410236, 3356824, "powerlaw", "SNAP"),
    "amazon0601": PublishedStats(403394, 3387388, "powerlaw", "SNAP"),
    "com-amazon": PublishedStats(334863, 925872, "community", "SNAP"),
    "web-BerkStan": PublishedStats(685230, 7600595, "powerlaw", "SNAP web"),
    "ppi": PublishedStats(56944, 818716, "community", "GraphSAGE PPI"),
    "DD": PublishedStats(334925, 1686092, "mesh", "TC-GNN graph-kernel batch"),
    # remaining names from the reference's 12-dataset list (bench/plot.py:8)
    "YeastH": PublishedStats(3139988, 6487230, "mesh",
                             "TC-GNN graph-kernel batch (molecule components)"),
    "Yeast": PublishedStats(1714644, 3636546, "mesh",
                            "TC-GNN graph-kernel batch (molecule components)"),
    "FraudYelp-RSR": PublishedStats(45954, 7693958, "dense",
                                    "DGL FraudYelpDataset, R-S-R relation"),
    # the reference's "protein" name is ambiguous offline; proxied with
    # ogbn-proteins stats (OGB paper: dense protein-association rows),
    # the same workload family. Drop the real TC-GNN npz in
    # $VOLTRIX_TPU_DATASETS/protein.npz to bench the genuine graph.
    "protein": PublishedStats(132534, 39561252, "dense",
                              "proxied from ogbn-proteins (name ambiguous)"),
}


def chung_lu_csr(
    num_nodes: int,
    num_edges: int,
    alpha: float = 2.1,
    community: int | None = None,
    local_frac: float = 0.0,
    seed: int = 0,
) -> sp.csr_matrix:
    """Chung-Lu power-law graph: endpoints drawn with probability
    proportional to a Zipf(alpha) weight sequence, so the degree
    distribution matches the target skew; optionally a `local_frac`
    of edges is rewired inside `community`-sized node blocks to model
    community locality (subreddits / co-purchase clusters)."""
    rng = np.random.default_rng(seed)
    w = (np.arange(1, num_nodes + 1, dtype=np.float64)) ** (
        -1.0 / (alpha - 1.0)
    )
    p = w / w.sum()
    # draw in chunks to bound memory at products scale
    src = rng.choice(num_nodes, size=num_edges, p=p)
    dst = rng.choice(num_nodes, size=num_edges, p=p)
    if community and local_frac > 0:
        k = int(num_edges * local_frac)
        loc = rng.integers(0, num_edges, size=k)
        dst[loc] = (
            (src[loc] // community) * community
            + rng.integers(0, community, size=k)
        ) % num_nodes
    a = sp.csr_matrix(
        (np.ones(num_edges, np.float32), (src, dst)),
        shape=(num_nodes, num_nodes),
    )
    a.sum_duplicates()
    a.data[:] = 1.0
    return a


def proxy_csr(name: str, seed: int = 0) -> sp.csr_matrix:
    """Seeded stand-in matched to `PUBLISHED[name]` node/edge counts and
    degree family. NOT the real graph — see module docstring."""
    import zlib

    st = PUBLISHED[name]
    rng_seed = seed + (zlib.crc32(name.encode()) % 1000)  # stable across runs
    if st.kind == "dense":
        density = st.num_edges / (st.num_nodes**2)
        a = sp.random(
            st.num_nodes,
            st.num_nodes,
            density=density,
            format="csr",
            random_state=np.random.default_rng(rng_seed),
        )
        a.data[:] = 1.0
        return a
    if st.kind == "mesh":
        # graph-kernel batches (DD): many small near-regular components
        comp = 300
        return chung_lu_csr(
            st.num_nodes, st.num_edges, alpha=6.0,
            community=comp, local_frac=0.95, seed=rng_seed,
        )
    local = 0.8 if st.kind == "community" else 0.0
    comm = 512 if st.kind == "community" else None
    return chung_lu_csr(
        st.num_nodes, st.num_edges, alpha=2.1,
        community=comm, local_frac=local, seed=rng_seed,
    )


_user_stats_loaded = False


def _load_user_stats() -> None:
    """Merge user-supplied dataset stats (JSON at $VOLTRIX_TPU_PROXY_STATS)
    into PUBLISHED so any named graph can be proxied once its size is
    known — the honest fallback for names whose published stats we
    cannot verify offline."""
    global _user_stats_loaded
    if _user_stats_loaded:
        return
    _user_stats_loaded = True
    path = os.environ.get("VOLTRIX_TPU_PROXY_STATS", "")
    if not path:
        return
    if not os.path.exists(path):
        logger.warning(
            "$VOLTRIX_TPU_PROXY_STATS=%s does not exist; ignoring", path
        )
        return
    import json

    with open(path) as f:
        for name, d in json.load(f).items():
            PUBLISHED.setdefault(
                name,
                PublishedStats(
                    int(d["num_nodes"]),
                    int(d["num_edges"]),
                    d.get("family", "powerlaw"),
                    d.get("note", "user-supplied stats"),
                ),
            )


def load_graph(name: str, data_dir: str | None = None) -> tuple[sp.csr_matrix, str]:
    """Real graph if `<data_dir>/<name>.npz` exists, else the published-
    stats proxy. Returns (csr, label) where label is `name` for the real
    file and `<name>-proxy` otherwise."""
    data_dir = data_dir or os.environ.get(DATASETS_DIR_FLAG, "datasets")
    path = os.path.join(data_dir, f"{name}.npz")
    if os.path.exists(path):
        return load_tcgnn_npz(path), name
    _load_user_stats()
    if name not in PUBLISHED:
        # The reference's remaining names (FraudYelp-RSR, protein,
        # YeastH, Yeast) have no size citation we can verify offline —
        # we do not fabricate stats. Supply them via a JSON file:
        #   {"protein": {"num_nodes": N, "num_edges": E,
        #                "family": "powerlaw|community|dense|mesh"}}
        # pointed to by $VOLTRIX_TPU_PROXY_STATS, or drop the genuine
        # .npz in $VOLTRIX_TPU_DATASETS.
        raise FileNotFoundError(
            f"{path} not found and no published stats for {name!r} "
            f"(provide the .npz via ${DATASETS_DIR_FLAG} or stats via "
            "$VOLTRIX_TPU_PROXY_STATS)"
        )
    logger.warning(
        "%s: real dataset file %s not found; using a published-stats "
        "proxy (set $%s to a directory of TC-GNN .npz files for the "
        "genuine graphs)",
        name, path, DATASETS_DIR_FLAG,
    )
    return proxy_csr(name), f"{name}-proxy"
