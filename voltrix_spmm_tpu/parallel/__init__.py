from .sharded import (
    make_mesh,
    sharded_spmm,
    sharded_gcn_forward,
    make_sharded_train_step,
    gcn_param_specs,
)
from .row_sharded import (
    RowShardedPlan,
    build_row_sharded_plan,
    row_sharded_spmm,
)
from .row_sharded_gcn import make_row_sharded_train_step
from .ring import (
    RingShardedPlan,
    build_ring_sharded_plan,
    ring_sharded_spmm,
    make_ring_train_step,
)
from .hybrid import (
    hybrid_sharded_spmm,
    make_hybrid_train_step,
)
from .grid2d import (
    Grid2DPlan,
    build_grid2d_plan,
    grid2d_spmm,
    make_grid2d_train_step,
)

__all__ = [
    "Grid2DPlan",
    "build_grid2d_plan",
    "grid2d_spmm",
    "make_grid2d_train_step",
    "RingShardedPlan",
    "build_ring_sharded_plan",
    "ring_sharded_spmm",
    "make_ring_train_step",
    "hybrid_sharded_spmm",
    "make_hybrid_train_step",
    "make_mesh",
    "sharded_spmm",
    "sharded_gcn_forward",
    "make_sharded_train_step",
    "gcn_param_specs",
    "RowShardedPlan",
    "build_row_sharded_plan",
    "row_sharded_spmm",
    "make_row_sharded_train_step",
]
