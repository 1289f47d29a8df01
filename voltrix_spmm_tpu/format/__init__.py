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
    "HybridPlan",
    "csr_preprocess_hybrid",
    "hybrid_stats",
    "csr_preprocess_streamed",
    "slice_plan_windows",
]
