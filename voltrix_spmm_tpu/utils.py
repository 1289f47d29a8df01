"""Benchmark, timing, and accuracy utilities.

TPU-native equivalents of the reference's utils (reference:
voltrix/utils.py — `calc_diff`:38-42, `relative_error`:45-49,
`GPU_bench`:324-350, `CPU_bench`, `bench_kineto`:232-321). CUDA events /
kineto profiling are replaced by `jax.block_until_ready` dispatch-loop
timing with warmup, and an optional `jax.profiler` trace export.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Callable

import jax
import numpy as np

logger = logging.getLogger("voltrix_tpu")


def _to_numpy(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float64)


def calc_diff(x, y) -> float:
    """Cosine-style "difference rate" metric.

    Same formula as the reference (voltrix/utils.py:38-42):
    ``1 - sim`` where ``sim = 2 x·y / (|x|^2 + |y|^2)``. 0.0 means identical.
    """
    x, y = _to_numpy(x), _to_numpy(y)
    if not (np.isfinite(x).all() and np.isfinite(y).all()):
        logger.warning("calc_diff: non-finite values present")
    denom = (x * x).sum() + (y * y).sum()
    if denom == 0.0:
        return 0.0
    sim = 2.0 * (x * y).sum() / denom
    return float(1.0 - sim)


def relative_error(ref, out, eps: float = 1e-12) -> float:
    """Frobenius relative error |out - ref| / |ref| (voltrix/utils.py:45-49)."""
    ref, out = _to_numpy(ref), _to_numpy(out)
    return float(np.linalg.norm(out - ref) / (np.linalg.norm(ref) + eps))


def TPU_bench(
    fn: Callable[[], object],
    iters: int = 10,
    warmup: int = 10,
    trace_dir: str | None = None,
) -> float:
    """Time `fn` on-device, returning milliseconds per iteration.

    Device-time analogue of the reference's `GPU_bench`
    (voltrix/utils.py:324-350): warmup runs, then a timed dispatch loop
    closed by `block_until_ready` (the TPU stand-in for cudaEvent /
    kineto kernel timing). Optionally wraps the timed region in a
    `jax.profiler` trace for kernel-level inspection.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn()
    jax.block_until_ready(out)

    ctx = (
        jax.profiler.trace(trace_dir)
        if trace_dir is not None
        else contextlib.nullcontext()
    )
    with ctx:
        start = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        end = time.perf_counter()
    return (end - start) / iters * 1e3


# GPU_bench alias for drop-in parity with reference call sites.
GPU_bench = TPU_bench


def CPU_bench(fn: Callable[[], object], iters: int = 10, warmup: int = 2) -> float:
    """Wall-clock host timing in ms/iter (voltrix/utils.py CPU_bench)."""
    for _ in range(warmup):
        fn()
    start = time.perf_counter()
    for _ in range(iters):
        fn()
    end = time.perf_counter()
    return (end - start) / iters * 1e3


def device_loop_prepare(step_fn: Callable, carry, *args):
    """AOT-compile the `device_loop_bench` timing loop for `step_fn` and
    return the compiled executable (pass it back via `compiled=`).

    Splitting compile from timing lets the autotuner overlap candidate
    compilation (slow through the remote-compile link) with on-device
    timing of earlier candidates — the TPU answer to the reference's
    concurrent candidate builds (jit_kernels/tuner.py:84-102 mp.Pool).
    The loop bound is a traced argument, so one executable serves every
    loop length."""
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(c0, rest, n_iter):
        def body(_, c):
            out = step_fn(c, *rest)
            if getattr(out, "shape", None) == c.shape:
                return c + (1e-38 * out).astype(c.dtype)
            # shape-changing ops (e.g. a model forward): chain through a
            # scalar reduction instead — still data-dependent, so no
            # iteration can be elided; the extra reduce is negligible
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in leaves)
            return c + (1e-38 * s).astype(c.dtype)

        return jnp.sum(lax.fori_loop(0, n_iter, body, c0, unroll=False))

    return run.lower(carry, args, jnp.int32(0)).compile()


def device_loop_bench(
    step_fn: Callable,
    carry,
    *args,
    iters: int = 20,
    trials: int = 3,
    compiled=None,
    min_window_ms: float | None = None,
) -> float:
    """Robust device time in ms/iter for `step_fn(carry, *args) -> out`.
    When `out` matches the carry's shape it chains directly; any other
    output (including pytrees, e.g. a whole model forward) chains
    through a scalar reduction — either way every iteration stays
    data-dependent on the last.

    Runs the op in an on-device `fori_loop`, chaining iterations through a
    negligible perturbation (`carry + 1e-38 * out`) so no iteration can be
    cached, hoisted, or elided, then differences the wall time of a 1x and
    2x loop inside single dispatches. This replaces kineto kernel timing
    (reference voltrix/utils.py:232-350) and is reliable even when the
    device sits behind an async RPC relay where `block_until_ready`
    semantics are weak.

    The loop length is auto-scaled so each dispatch does >= min_window_ms
    of device work (relay round-trip jitter is tens of ms; a short loop
    lets one hiccup poison the slope) and the per-trial slopes are
    MEDIAN-combined — min-combining was observed to latch a single
    jitter-deflated slope at ~0.6x the true op time and persist it into
    the tune cache.
    """
    import jax.numpy as jnp

    if min_window_ms is None:
        # $VOLTRIX_TPU_BENCH_WINDOW_MS: tests shrink it (CPU interpret
        # mode is slow and needs no timing fidelity)
        min_window_ms = float(
            os.environ.get("VOLTRIX_TPU_BENCH_WINDOW_MS", "400")
        )

    # n_iter is traced (dynamic while-loop bound) so ALL loop lengths
    # share one compilation — compile time matters when autotuning many
    # variants over a slow remote-compile link.
    if compiled is None:
        compiled = device_loop_prepare(step_fn, carry, *args)

    def run(n: int) -> float:
        return float(compiled(carry, args, jnp.int32(n)))

    run(min(iters, 4))  # warm

    # escalate the loop length until the *measured slope window* (the
    # real device work separating the 1x and 2x dispatches) is at least
    # min_window_ms — sizing from a wall-clock probe alone undersizes n
    # for fast ops because relay dispatch overhead inflates the estimate
    n = iters
    for _ in range(4):
        t0 = time.perf_counter()
        run(n)
        t1 = time.perf_counter()
        run(2 * n)
        t2 = time.perf_counter()
        window_ms = ((t2 - t1) - (t1 - t0)) * 1e3
        if window_ms >= min_window_ms or n >= (1 << 17):
            break
        growth = min_window_ms / max(window_ms, 1.0)
        n = min(int(n * max(2.0, growth)) + 1, 1 << 17)

    slopes = []
    uppers = []
    for _ in range(max(trials, 2)):
        t0 = time.perf_counter()
        run(n)
        t1 = time.perf_counter()
        run(2 * n)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / n * 1e3)
        uppers.append((t2 - t1) / (2 * n) * 1e3)
    slopes = [s for s in slopes if s > 0]
    if not slopes:
        # dispatch jitter swamped the slope (sub-us work): fall back to
        # the per-iteration upper bound (includes constant overhead)
        return max(min(uppers), 1e-6)
    return float(np.median(slopes))


def device_trace_bench(
    step_fn: Callable, carry, *args, iters: int = 3, warmup: int = 1
) -> float:
    """Memory-lean device time in ms/iter: per-iteration-blocking runs
    under a `jax.profiler` trace, summing the XLA-Ops device events.

    `device_loop_bench`'s on-device fori_loop needs the output AND the
    chained carry resident simultaneously (plus the loop's double
    buffer) — at reddit/products scale that extra residency OOMs even
    when a single dispatch fits. Here every iteration blocks and frees
    its output before the next starts, so peak memory equals one
    dispatch; timing fidelity comes from the device trace (relay
    round-trip jitter never enters the numbers, unlike wall-clock
    timing, where `block_until_ready` is unreliable through the relay).
    Slightly optimistic vs the loop harness (inter-op gaps inside one
    iteration are not counted between ops that don't overlap), so the
    tuner prefers the loop and falls back here only on RESOURCE_EXHAUSTED.
    """
    import glob
    import tempfile

    import jax

    out = None
    for _ in range(max(warmup, 1)):
        out = step_fn(carry, *args)
        jax.block_until_ready(out)
        del out
    tmp = tempfile.mkdtemp(prefix="voltrix_trace_bench_")
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            out = step_fn(carry, *args)
            jax.block_until_ready(out)
            del out
    files = sorted(
        glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    )
    assert files, f"no xplane trace produced under {tmp}"
    with open(files[-1], "rb") as f:
        data = jax.profiler.ProfileData.from_serialized_xspace(f.read())
    total_ns = 0.0
    for plane in data.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                total_ns += e.duration_ns
    return total_ns / iters / 1e6


class DurationTimer:
    """Context-manager timer returning elapsed ms (voltrix/utils.py:146-186).

    Uses host wall clock around a `block_until_ready` barrier; on TPU the
    dispatch queue makes this equivalent to device-event timing for
    synchronous regions.
    """

    def __init__(self):
        self._start = None
        self._elapsed_ms = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._elapsed_ms = (time.perf_counter() - self._start) * 1e3
        return False

    def get_duration(self) -> float:
        assert self._elapsed_ms is not None, "timer not finished"
        return self._elapsed_ms


def gen_outlier_normal(
    shape, outlier_frac: float = 0.01, outlier_scale: float = 50.0, seed: int = 0
) -> np.ndarray:
    """Gaussian data with a heavy-outlier fraction — the reference's
    quantization-test data generator (voltrix/utils.py outlier Gaussian
    gen); stresses per-row scaling in the int8 path."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape).astype(np.float32)
    mask = rng.random(shape) < outlier_frac
    x = np.where(mask, x * outlier_scale, x)
    return x


def env_flag(name: str) -> bool:
    return os.environ.get(name, "0") not in ("", "0", "false", "False")


# --- fp8 quantization helpers -------------------------------------------
# Role parity with the reference's fp8 utilities (voltrix/utils.py:45-115
# round_quant / per_tensor_quant / block_quant — carried by the reference
# but unused by its SpMM path; same standing here). E4M3 max-normal is
# 448, the scale denominator the reference uses.

_FP8_MAX = 448.0  # float8_e4m3fn max normal


def round_quant_fp8(x, lfp_t=None):
    """Plain cast to fp8 (reference round_quant)."""
    import jax.numpy as jnp

    return jnp.asarray(x).astype(lfp_t or jnp.float8_e4m3fn)


def per_tensor_quant_fp8(x, lfp_t=None):
    """(x_fp8, scale): one absmax/448 scale for the whole tensor."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    scale = jnp.maximum(jnp.max(jnp.abs(x)) / _FP8_MAX, 1e-30)
    q = (x / scale).astype(lfp_t or jnp.float8_e4m3fn)
    return q, scale.astype(jnp.float32)


def per_tensor_dequant_fp8(q, scale, hfp_t=None):
    import jax.numpy as jnp

    return q.astype(hfp_t or jnp.float32) * scale


def block_quant_fp8(x, blk_shape=(128, 128), lfp_t=None):
    """(x_fp8, scales (M/bm, N/bn)): per-tile absmax/448 scaling, values
    clamped to the E4M3 range (reference block_quant semantics, tiles
    MXU-sized by default)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    m, n = x.shape
    bm, bn = blk_shape
    assert m % bm == 0 and n % bn == 0, (x.shape, blk_shape)
    qm, qn = m // bm, n // bn
    t = x.reshape(qm, bm, qn, bn)
    scales = jnp.max(jnp.abs(t), axis=(1, 3)) / _FP8_MAX  # (qm, qn)
    scales = jnp.where(scales == 0, 1.0, scales)
    q = jnp.clip(
        t / scales[:, None, :, None], -_FP8_MAX, _FP8_MAX
    ).reshape(m, n).astype(lfp_t or jnp.float8_e4m3fn)
    return q, scales.astype(jnp.float32)


def block_dequant_fp8(q, scales, blk_shape=(128, 128), hfp_t=None):
    import jax.numpy as jnp

    m, n = q.shape
    bm, bn = blk_shape
    qm, qn = scales.shape
    assert m == qm * bm and n == qn * bn
    t = q.astype(hfp_t or jnp.float32).reshape(qm, bm, qn, bn)
    return (t * scales[:, None, :, None]).reshape(m, n)
