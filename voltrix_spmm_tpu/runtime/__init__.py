"""Native (C++/OpenMP) preprocessing runtime, built lazily by the JIT layer.

The reference implements window preprocessing natively (OpenMP +
thrust, bmat_kernels.cuh:264-320) behind an nvcc JIT build/cache layer
(voltrix/jit/). Here the native side is a C++/OpenMP shared library
compiled on demand by `voltrix_spmm_tpu.jit` (g++ instead of nvcc) and
called through ctypes.
"""

from .native import (
    native_available,
    native_cluster,
    native_preprocess,
    native_spmm_oracle,
)

__all__ = [
    "native_available",
    "native_cluster",
    "native_preprocess",
    "native_spmm_oracle",
]
