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


def profile_op(fn, *args, iters: int = 3, warmup: int = 2, log_dir=None):
    """Run `fn(*args)` under a device trace and return the per-op device
    time table: [{"op", "ms_per_iter", "count"}] sorted by cost.

    This is the kernel-name time extraction role of the reference's
    `bench_kineto` (voltrix/utils.py:291-321): kineto's profiler table
    becomes the XLA-Ops line of the xplane trace, parsed with
    `jax.profiler.ProfileData` (works through the axon relay)."""
    import tempfile

    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    tmp = log_dir or tempfile.mkdtemp(prefix="voltrix_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    files = sorted(
        glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    )
    assert files, f"no xplane trace produced under {tmp}"
    with open(files[-1], "rb") as f:
        data = jax.profiler.ProfileData.from_serialized_xspace(f.read())
    rows: dict[str, list] = {}
    for plane in data.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                r = rows.setdefault(e.name, [0.0, 0])
                r[0] += e.duration_ns
                r[1] += 1
    table = [
        {"op": k, "ms_per_iter": v[0] / iters / 1e6, "count": v[1]}
        for k, v in rows.items()
    ]
    table.sort(key=lambda r: -r["ms_per_iter"])
    return table


def attribute_spmm(table, plan) -> dict:
    """Bucket a `profile_op` table for an SpMM dispatch into
    gather / pallas-kernel / other device milliseconds.

    The gather is recognized by its result shape (leading dim ==
    plan.gather_rows — XLA fuses the row gather into one fusion op);
    the masked-matmul Pallas kernel by its custom-call. Regression
    target for the gather-vs-matmul split that drives kernel work
    (reference role: bench_kineto's kernel-name filter)."""
    import re

    # packed-gather plans (gather_segment=q > 1) fetch one (q*d)-wide
    # super-row per lane run, so the gather fusion's leading dim is
    # gather_rows / q
    q = plan.config.gather_segment
    gather_dims = {plan.gather_rows, plan.gather_rows // max(q, 1)}
    out = {"gather_ms": 0.0, "kernel_ms": 0.0, "other_ms": 0.0}
    for row in table:
        name, ms = row["op"], row["ms_per_iter"]
        shape = re.search(r"=\s*\w+\[(\d+)[,\]]", name)
        if "custom-call" in name:
            out["kernel_ms"] += ms
        elif shape is not None and int(shape.group(1)) in gather_dims:
            out["gather_ms"] += ms
        else:
            out["other_ms"] += ms
    tot = sum(out.values())
    out["total_ms"] = tot
    if tot > 0:
        out["gather_frac"] = out["gather_ms"] / tot
        out["kernel_frac"] = out["kernel_ms"] / tot
    return out


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
