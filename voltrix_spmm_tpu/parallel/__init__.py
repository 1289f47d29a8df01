from .sharded import (
    make_mesh,
    sharded_spmm,
    sharded_gcn_forward,
    make_sharded_train_step,
    gcn_param_specs,
)

__all__ = [
    "make_mesh",
    "sharded_spmm",
    "sharded_gcn_forward",
    "make_sharded_train_step",
    "gcn_param_specs",
]
