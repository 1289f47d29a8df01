from .tuner import (
    SpmmTuner,
    TunedSpmm,
    Variant,
    default_space,
    tune_spmm,
    weighted_default_space,
)

__all__ = [
    "SpmmTuner",
    "TunedSpmm",
    "tune_spmm",
    "default_space",
    "weighted_default_space",
    "Variant",
]
