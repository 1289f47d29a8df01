from .generate import (
    erdos_renyi_csr,
    rmat_csr,
    reorder_rcm,
    reorder_degree,
    reorder_auto,
    window_gather_volume,
    symmetrize,
    save_npz_graph,
    load_npz_graph,
)
from .batching import (
    block_diagonal,
    node_graph_ids,
    split_nodes,
)
from .sampling import (
    SampleBlock,
    sample_block,
    sample_blocks,
    gather_features,
    block_caps,
)
from .real import (
    PUBLISHED,
    chung_lu_csr,
    load_graph,
    load_tcgnn_npz,
    proxy_csr,
)

__all__ = [
    "erdos_renyi_csr",
    "rmat_csr",
    "reorder_rcm",
    "reorder_degree",
    "reorder_auto",
    "window_gather_volume",
    "symmetrize",
    "save_npz_graph",
    "load_npz_graph",
    "SampleBlock",
    "sample_block",
    "sample_blocks",
    "gather_features",
    "block_caps",
    "block_diagonal",
    "node_graph_ids",
    "split_nodes",
    "PUBLISHED",
    "chung_lu_csr",
    "load_graph",
    "load_tcgnn_npz",
    "proxy_csr",
]
