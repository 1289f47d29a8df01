"""Deployment layer: AOT compilation and serialized servable export.

Reference role: none — the reference (YaqiXia/Voltrix-SpMM) stops at a
JIT-compiled kernel library; its deployment story is "import voltrix and
call spmm" (voltrix/spmm/spmm.py:92), recompiling kernels per process
from the on-disk nvcc cache. On TPU the natural production artifact is
different: everything under `jax.jit` is a single XLA program, so the
whole serving graph (gather + Pallas SpMM + dense layers) can be

  1. AOT-compiled in-process (`aot_compile`) — pays the 20-40 s Mosaic
     compile once at deploy time, not on the first request; exposes the
     compiler's own cost/memory analyses for capacity planning; or
  2. exported to a self-contained StableHLO artifact (`export_servable`
     / `load_servable`) that a serving binary reloads WITHOUT the model
     code, the preprocessing pipeline, or the tuner — only the plan
     arrays fed as inputs. Artifacts are versioned by jax.export's
     calling-convention contract and validated on load.

The SpmmPlan rides alongside the artifact via its own npz serialization
(`SpmmPlan.save(packed=True)`, format/plan.py) — plans are inputs, not
baked constants, so one exported program serves every graph that shares
its geometry (same block counts/unroll/dtype), matching the tuner's
cache-key identity.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Sequence

import jax
from jax import export as jax_export


def aot_compile(
    fn: Callable,
    *example_args,
    static_argnums: Sequence[int] = (),
    donate_argnums: Sequence[int] = (),
):
    """Ahead-of-time compile `fn` for the example args' shapes/dtypes.

    Returns the `jax.stages.Compiled` executable: call it with real
    arrays of the same shapes. Compilation (the expensive Mosaic/XLA
    step) happens HERE — a serving process does this at startup so the
    first request runs at steady-state latency.
    """
    jitted = jax.jit(
        fn, static_argnums=static_argnums, donate_argnums=donate_argnums
    )
    return jitted.lower(*example_args).compile()


def compiled_stats(compiled) -> dict:
    """Capacity-planning numbers from the compiled executable.

    flops/bytes from XLA's cost analysis and the generated-code memory
    footprint in bytes (the number that must fit next to the plan and
    features in HBM).
    """
    stats: dict[str, Any] = {}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        stats["flops"] = cost.get("flops")
        stats["bytes_accessed"] = cost.get("bytes accessed")
    except Exception:  # pragma: no cover - backend-dependent
        pass
    try:
        mem = compiled.memory_analysis()
        for k in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            stats[k] = getattr(mem, k, None)
    except Exception:  # pragma: no cover
        pass
    return stats


def export_servable(
    fn: Callable,
    *example_args,
    polymorphic_shapes=None,
    platforms: Sequence[str] | None = None,
) -> bytes:
    """Serialize jit(fn) at the example args' specs to a StableHLO blob.

    polymorphic_shapes: optional jax.export polymorphic spec (e.g.
    `("b, _", ...)`) making named axes symbolic, so one artifact serves
    any batch size. platforms: lowering targets (default: current
    backend); pass ("tpu",) when exporting from a CPU build host for
    TPU serving.
    """
    jitted = jax.jit(fn)
    if polymorphic_shapes is not None:
        args_spec = jax_export.symbolic_args_specs(
            example_args, polymorphic_shapes
        )
    else:
        args_spec = example_args
    exp = jax_export.export(
        jitted, platforms=list(platforms) if platforms else None
    )(*args_spec)
    return bytes(exp.serialize())


def load_servable(blob: bytes) -> Callable:
    """Rehydrate an exported artifact into a jitted callable.

    The result re-traces nothing: calls dispatch straight into the
    deserialized StableHLO program (compiled on first call for the
    running backend).
    """
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call)


# --- on-disk service bundle ------------------------------------------------

_BUNDLE_META = "servable.json"
_BUNDLE_BLOB = "servable.stablehlo"
_BUNDLE_PLAN = "plan.npz"


@dataclasses.dataclass
class ServiceBundle:
    """A directory artifact: exported program + plan + metadata.

    Layout:
      <dir>/servable.stablehlo  — jax.export blob (program only)
      <dir>/plan.npz            — SpmmPlan.save(packed=...) plan arrays
      <dir>/servable.json       — metadata (arg specs, notes, versions)
    """

    fn: Callable
    plan: Any  # SpmmPlan | None
    meta: dict

    def __call__(self, *args):
        return self.fn(*args)


def save_bundle(
    path: str,
    blob: bytes,
    plan=None,
    meta: dict | None = None,
    packed: bool = True,
) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".{_BUNDLE_BLOB}.tmp.{os.getpid()}")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(path, _BUNDLE_BLOB))
    if plan is not None:
        plan.save(os.path.join(path, _BUNDLE_PLAN), packed=packed)
    meta = dict(meta or {})
    meta.setdefault("jax_version", jax.__version__)
    tmpm = os.path.join(path, f".{_BUNDLE_META}.tmp.{os.getpid()}")
    with open(tmpm, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    os.replace(tmpm, os.path.join(path, _BUNDLE_META))


def load_bundle(path: str) -> ServiceBundle:
    with open(os.path.join(path, _BUNDLE_BLOB), "rb") as f:
        fn = load_servable(f.read())
    plan = None
    plan_path = os.path.join(path, _BUNDLE_PLAN)
    if os.path.exists(plan_path):
        from .format.plan import SpmmPlan

        plan = SpmmPlan.load(plan_path)
    with open(os.path.join(path, _BUNDLE_META)) as f:
        meta = json.load(f)
    return ServiceBundle(fn=fn, plan=plan, meta=meta)
