"""Block-diagonal batching of many small graphs.

The reference's dataset families include many-small-graph corpora
(DD, protein, Yeast/YeastH — bench/plot.py:8); GNN frameworks batch
those as one block-diagonal adjacency so a single SpMM serves the whole
batch. `block_diagonal` builds that adjacency + node offsets;
`split_nodes` undoes it for per-graph readout.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def block_diagonal(graphs: list[sp.csr_matrix]):
    """Returns (big_csr, node_offsets) with node_offsets[i] the first
    node id of graph i (length len(graphs)+1)."""
    assert graphs, "need at least one graph"
    offsets = np.zeros(len(graphs) + 1, dtype=np.int64)
    for i, g in enumerate(graphs):
        assert g.shape[0] == g.shape[1], "graphs must be square"
        offsets[i + 1] = offsets[i] + g.shape[0]
    big = sp.block_diag(graphs, format="csr")
    big.sum_duplicates()
    return big, offsets


def split_nodes(x, node_offsets):
    """Split a stacked node array back into per-graph arrays."""
    return [
        x[node_offsets[i] : node_offsets[i + 1]]
        for i in range(len(node_offsets) - 1)
    ]


def node_graph_ids(node_offsets) -> np.ndarray:
    """Per-node graph id (int32, shape (total_nodes,)) for a batch built
    by `block_diagonal` — the segment-id array jittable readouts key on
    (`models.graph_readout`)."""
    offsets = np.asarray(node_offsets)
    sizes = np.diff(offsets).astype(np.int64)
    return np.repeat(
        np.arange(len(sizes), dtype=np.int32), sizes
    )
