from .graph import GraphData, build_graph, aggregate
from .gcn import init_gcn, gcn_forward, gcn_loss, make_train_step
from .sage import init_sage, sage_forward
from .sage_minibatch import (
    init_sage_minibatch,
    sage_minibatch_forward,
    sage_minibatch_loss,
    make_sage_minibatch_step,
    blocks_args,
    sage_inference,
)
from .gin import init_gin, gin_forward
from .linkpred import (
    build_link_candidates,
    sample_negative_edges,
    link_scores,
    init_link_predictor,
    link_pred_loss,
    make_link_pred_step,
    link_auc,
)
from .rgcn import (
    init_rgcn,
    rgcn_forward,
    rgcn_loss,
    make_rgcn_train_step,
)
from .deep_gcn import (
    init_deep_gcn,
    deep_gcn_forward,
    deep_gcn_loss,
    make_deep_train_step,
)
from .appnp import init_appnp, appnp_forward, appnp_loss
from .dropedge import (
    DropEdgeGraph,
    build_dropedge_graph,
    dropedge_aggregate,
)
from .gat_ell import (
    EllGraph,
    build_ell_graph,
    dot_attention_aggregate,
    init_gat_dot,
    gat_dot_forward,
    gat_dot_loss,
)
from .readout import (
    graph_readout,
    init_gin_classifier,
    gin_classifier_forward,
    gin_classifier_loss,
    make_classifier_train_step,
)
from .gat_flash import (
    flash_attention_aggregate,
    init_gat_flash,
    gat_flash_forward,
    gat_flash_loss,
    make_gat_flash_train_step,
)
from .gat import (
    GatGraph,
    build_gat_graph,
    init_gat,
    gat_forward,
    gat_loss,
    gat_attention_aggregate,
    edge_softmax,
)

__all__ = [
    "GraphData",
    "build_graph",
    "aggregate",
    "init_deep_gcn",
    "deep_gcn_forward",
    "deep_gcn_loss",
    "make_deep_train_step",
    "init_gcn",
    "gcn_forward",
    "gcn_loss",
    "make_train_step",
    "init_sage",
    "sage_forward",
    "init_sage_minibatch",
    "sage_minibatch_forward",
    "sage_minibatch_loss",
    "make_sage_minibatch_step",
    "blocks_args",
    "sage_inference",
    "init_gin",
    "gin_forward",
    "graph_readout",
    "init_gin_classifier",
    "gin_classifier_forward",
    "gin_classifier_loss",
    "make_classifier_train_step",
    "build_link_candidates",
    "sample_negative_edges",
    "link_scores",
    "init_link_predictor",
    "link_pred_loss",
    "make_link_pred_step",
    "link_auc",
    "init_rgcn",
    "rgcn_forward",
    "rgcn_loss",
    "make_rgcn_train_step",
    "init_appnp",
    "appnp_forward",
    "appnp_loss",
    "DropEdgeGraph",
    "build_dropedge_graph",
    "dropedge_aggregate",
    "GatGraph",
    "EllGraph",
    "build_ell_graph",
    "dot_attention_aggregate",
    "init_gat_dot",
    "gat_dot_forward",
    "gat_dot_loss",
    "flash_attention_aggregate",
    "init_gat_flash",
    "gat_flash_forward",
    "gat_flash_loss",
    "make_gat_flash_train_step",
    "build_gat_graph",
    "init_gat",
    "gat_forward",
    "gat_loss",
    "gat_attention_aggregate",
    "edge_softmax",
]
