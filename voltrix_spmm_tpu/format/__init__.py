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
]
