"""voltrix_spmm_tpu — a TPU-native SpMM framework.

A from-scratch JAX/Pallas rebuild of the capabilities of Voltrix-SpMM
(USENIX ATC '25, reference: YaqiXia/Voltrix-SpMM): balanced row-window
preprocessing of a binary sparse matrix (graph adjacency) into
bitmask-compressed block tiles, an MXU-driven Pallas SpMM kernel with
double-buffered HBM->VMEM streaming, a kernel-variant autotuner with a
persistent cache, a C++ (OpenMP) preprocessing runtime behind a JIT
build/cache layer, accuracy + benchmark harnesses, and GNN model layers
on top.

Public API parity (reference: voltrix/spmm/spmm.py:16-114):
  - ``csr_preprocess(indptr, indices, num_nodes) -> SpmmPlan``
  - ``spmm(plan, feat) -> out``  with ``out = A @ feat``
plus the tuple-style compatibility wrappers in ``voltrix_spmm_tpu.spmm``.
"""

from . import project
from . import serve
from .format import csr_preprocess, SpmmPlan, PlanConfig
from .ops import spmm, spmm_attention, spmm_attention_ad, spmm_reference
from .tuner import tune_spmm, TunedSpmm, Variant, tune_attention, TunedAttention, AttnVariant
from .utils import calc_diff, relative_error, TPU_bench, CPU_bench

# Reference geometry constants (voltrix/spmm/spmm.py:12-13 uses 16x8 GPU
# tensor-core tiles; on TPU the natural tile is MXU-sized and configurable —
# these are the *defaults* used by PlanConfig).
BLK_H = 128  # row-window height (rows of A per window)
BLK_W = 128  # column-block width (gathered source rows per block)

__version__ = "0.1.0"

__all__ = [
    "csr_preprocess",
    "spmm",
    "spmm_attention",
    "spmm_attention_ad",
    "tune_spmm",
    "tune_attention",
    "TunedAttention",
    "AttnVariant",
    "TunedSpmm",
    "Variant",
    "spmm_reference",
    "SpmmPlan",
    "PlanConfig",
    "calc_diff",
    "relative_error",
    "TPU_bench",
    "CPU_bench",
    "BLK_H",
    "BLK_W",
    "project",
    "serve",
]
