from .plan import SpmmPlan, PlanConfig
from .preprocess import csr_preprocess, plan_to_dense, expand_bitmask_np, plan_stats
from .hybrid import HybridPlan, csr_preprocess_hybrid, hybrid_stats

__all__ = [
    "SpmmPlan",
    "PlanConfig",
    "csr_preprocess",
    "plan_to_dense",
    "expand_bitmask_np",
    "plan_stats",
    "HybridPlan",
    "csr_preprocess_hybrid",
    "hybrid_stats",
]
