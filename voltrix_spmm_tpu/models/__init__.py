from .graph import GraphData, build_graph, aggregate
from .gcn import init_gcn, gcn_forward, gcn_loss, make_train_step
from .sage import init_sage, sage_forward
from .gin import init_gin, gin_forward

__all__ = [
    "GraphData",
    "build_graph",
    "aggregate",
    "init_gcn",
    "gcn_forward",
    "gcn_loss",
    "make_train_step",
    "init_sage",
    "sage_forward",
    "init_gin",
    "gin_forward",
]
