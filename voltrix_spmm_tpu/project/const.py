"""Project constants and environment-variable flag names.

Mirrors the reference's centralized env-flag registry
(reference: voltrix/project/const.py:1-14) with TPU-appropriate names.
"""

PROJECT_NAME_FULL = "Voltrix-SpMM-TPU"
PROJECT_NAME_ABBR = "VoltrixTPU"
PROJECT_NAME_FULL_LOWER = "voltrix-spmm-tpu"
PROJECT_NAME_ABBR_LOWER = "voltrix_tpu"

# Environment variables (all optional):
#   VOLTRIX_TPU_JIT_DEBUG          : "1" -> keep generated C++ sources, verbose build logs
#   VOLTRIX_TPU_CXX                : override the C++ compiler used for the native runtime
#   VOLTRIX_TPU_CACHE_DIR          : override the persistent JIT/autotune cache directory
#   VOLTRIX_TPU_PRINT_CXX_COMMAND  : "1" -> print g++ command lines
#   VOLTRIX_TPU_PRINT_AUTO_TUNE    : "1" -> print autotuner decisions and timings
#   VOLTRIX_TPU_DISABLE_NATIVE     : "1" -> force the pure-numpy preprocessing path
#   VOLTRIX_TPU_INTERPRET          : "1" -> run Pallas kernels in interpreter mode
#   VOLTRIX_TPU_TUNE_BUDGET_S      : soft autotune time budget in seconds
#   VOLTRIX_TPU_DEVICE_MEM_GB      : device HBM budget (GB) the tuner may
#                                    plan against (default: 80% of the
#                                    device's reported limit, else 12)
DEBUG_FLAG = "VOLTRIX_TPU_JIT_DEBUG"
CXX_COMPILER_FLAG = "VOLTRIX_TPU_CXX"
CACHE_DIR_FLAG = "VOLTRIX_TPU_CACHE_DIR"
PRINT_CXX_COMMAND_FLAG = "VOLTRIX_TPU_PRINT_CXX_COMMAND"
PRINT_AUTOTUNE_FLAG = "VOLTRIX_TPU_PRINT_AUTO_TUNE"
DISABLE_NATIVE_FLAG = "VOLTRIX_TPU_DISABLE_NATIVE"
INTERPRET_FLAG = "VOLTRIX_TPU_INTERPRET"
TUNE_BUDGET_FLAG = "VOLTRIX_TPU_TUNE_BUDGET_S"
DEVICE_MEM_FLAG = "VOLTRIX_TPU_DEVICE_MEM_GB"
