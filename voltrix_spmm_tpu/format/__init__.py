from .plan import SpmmPlan, PlanConfig
from .preprocess import (
    csr_preprocess,
    csr_transpose,
    edge_slot_map,
    plan_to_dense,
    expand_bitmask_np,
    plan_stats,
)
from .hybrid import HybridPlan, csr_preprocess_hybrid, hybrid_stats
from .ell import (
    EllPlan,
    build_ell_pair,
    csr_preprocess_ell,
    edge_values,
    ell_stats,
    ell_transpose,
    lane_values,
    slice_ell_windows,
)
from .stream import csr_preprocess_streamed, slice_plan_windows

__all__ = [
    "SpmmPlan",
    "PlanConfig",
    "csr_preprocess",
    "csr_transpose",
    "edge_slot_map",
    "plan_to_dense",
    "expand_bitmask_np",
    "plan_stats",
    "EllPlan",
    "build_ell_pair",
    "csr_preprocess_ell",
    "edge_values",
    "ell_stats",
    "ell_transpose",
    "lane_values",
    "slice_ell_windows",
    "HybridPlan",
    "csr_preprocess_hybrid",
    "hybrid_stats",
    "csr_preprocess_streamed",
    "slice_plan_windows",
]
