from .tuner import SpmmTuner, TunedSpmm, tune_spmm, default_space, Variant

__all__ = ["SpmmTuner", "TunedSpmm", "tune_spmm", "default_space", "Variant"]
