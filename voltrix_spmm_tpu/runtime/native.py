"""ctypes bridge to the C++/OpenMP preprocessing runtime (stub until the
JIT layer lands; `native_available()` gates callers to the numpy path)."""

from __future__ import annotations

import numpy as np

from ..format.plan import PlanConfig, SpmmPlan


def native_available() -> bool:
    return False


def native_preprocess(
    indptr: np.ndarray,
    indices: np.ndarray,
    num_nodes: int,
    config: PlanConfig,
) -> SpmmPlan:
    raise NotImplementedError("native runtime not built yet")
