"""Profiling / tracing helpers.

TPU-native equivalents of the reference's profiler toolkit
(voltrix/utils.py:232-401 — kineto `bench_kineto`, cudaEvent
`DurationTimer`, cudart profiler start/stop, NVTX ranges): the
`jax.profiler` trace is the kineto/Nsight analogue, `annotate` the NVTX
range, and `profile_op` extracts per-op device cost like the kernel-name
filter of `bench_kineto` (voltrix/utils.py:291-321).
"""

from __future__ import annotations

import contextlib
import glob
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace viewable in XProf/Perfetto (kineto analogue)."""
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield
    # newest trace artifact, for tooling
    runs = sorted(glob.glob(os.path.join(log_dir, "plugins", "profile", "*")))
    if runs:
        print(f"voltrix_tpu trace: {runs[-1]}")


def annotate(name: str):
    """Named range visible in traces (NVTX push/pop analogue,
    voltrix/utils.py:394-401)."""
    return jax.profiler.TraceAnnotation(name)


def start_profiler(log_dir: str):
    """cudart profiler-start analogue (voltrix/utils.py:367-379)."""
    jax.profiler.start_trace(log_dir)


def stop_profiler():
    jax.profiler.stop_trace()


def compiled_stats(fn, *args, **kwargs) -> dict:
    """Compile `fn` and report XLA's cost analysis (flops, bytes) — the
    ptxas-verbose / register-usage introspection analogue
    (voltrix/jit/compiler.py VOLTRIX_PTXAS_VERBOSE)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    mem = compiled.memory_analysis()
    out = {k: v for k, v in (cost or {}).items() if isinstance(v, (int, float))}
    if mem is not None:
        for attr in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
        ):
            if hasattr(mem, attr):
                out[attr] = getattr(mem, attr)
    return out
