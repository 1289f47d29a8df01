"""Kernel-variant autotuner with persistent cache.

Role-parity with the reference's JIT tuner (voltrix/jit_kernels/
tuner.py:46-165 `JITTuner.compile_and_tune` + the tuning space of
`spmm_kernel`, voltrix/jit_kernels/spmm.py:72-76 `{model: 0,1,2}`):

- the tuning space is a list of `Variant`s — plan geometry (window
  height, block width, gather segment), kernel impl (pregather/fused),
  feature chunk and MXU dtype — the TPU translation of the reference's
  template-parameter models;
- validity filtering: a candidate that fails to compile/run (VMEM
  exhaustion etc.) is skipped, mirroring the return-code filter
  (tuner.py:108-116);
- timing via `device_loop_bench` (the `GPU_bench` analogue,
  tuner.py:135-141);
- results cached in memory and on disk keyed by (matrix hash, feature
  shape/dtype, code version) — the `hash_tag` protocol of
  voltrix/jit_kernels/spmm.py:17-36 with the same "explicit tag beats
  content hash" semantics.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..format.hybrid import HybridPlan
from ..format.plan import PlanConfig, SpmmPlan
from ..format.preprocess import csr_preprocess
from ..project import const
from ..utils import device_loop_bench, env_flag


@dataclass(frozen=True)
class Variant:
    impl: str  # "pregather" | "fused" | "hybrid" | "int8"
    block_h: int = 128
    block_w: int = 128
    gather_segment: int = 1
    block_d: int | None = None
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    precision: str | None = None
    threshold: int | None = None  # hybrid: min neighbors per dense run
    block_unroll: int = 1
    subtile: bool = False  # pregather: skip empty 128-row sub-tiles

    @property
    def plan_config(self) -> PlanConfig:
        return PlanConfig(
            self.block_h, self.block_w, self.gather_segment, self.block_unroll
        )

    def key(self) -> str:
        return (
            f"{self.impl}/h{self.block_h}w{self.block_w}s{self.gather_segment}"
            f"u{self.block_unroll}{'st' if self.subtile else ''}"
            f"/d{self.block_d}/{self.compute_dtype}"
            f"/{self.precision}/t{self.threshold}"
        )


def default_space(accurate: bool = False) -> list[Variant]:
    """The standard tuning space (the reference's models 0/1/2 analogue).

    accurate=True keeps fp32 MXU inputs only; otherwise bf16 variants
    (tf32-class accuracy, same class as the reference tensor cores)
    join the space.
    """
    space = [
        Variant("pregather", block_h=512, block_unroll=4),
        Variant("pregather", block_h=1024, block_unroll=4),
        Variant("pregather", block_h=2048, block_unroll=4),
        Variant("fused", block_h=128, gather_segment=8),
        Variant("hybrid", block_h=128, gather_segment=8),
    ]
    if not accurate:
        space += [
            Variant(
                "pregather",
                block_h=2048,
                block_unroll=4,
                compute_dtype="bfloat16",
            ),
            Variant("int8", block_h=1024, block_unroll=4),
        ]
    return space


@dataclass
class TunedSpmm:
    """Best (plan, kernel) pair for one matrix — call it like `spmm`."""

    plan: SpmmPlan
    variant: Variant
    time_ms: float
    candidates: dict = field(default_factory=dict)

    def __call__(self, feat):
        return _run_variant(self.variant, self.plan, feat)


def _run_variant(variant: Variant, plan, feat):
    import jax.numpy as jnp

    from ..ops import (
        spmm_pallas,
        spmm_pallas_fused,
        spmm_pallas_hybrid,
        spmm_pallas_int8,
    )

    kwargs = dict(
        block_d=variant.block_d,
        compute_dtype=jnp.dtype(variant.compute_dtype),
        precision=variant.precision,
    )
    if variant.impl == "fused":
        return spmm_pallas_fused(plan, feat, **kwargs)
    if variant.impl == "hybrid":
        return spmm_pallas_hybrid(plan, feat, **kwargs)
    if variant.impl == "int8":
        return spmm_pallas_int8(plan, feat, block_d=variant.block_d)
    assert variant.impl == "pregather", variant.impl
    return spmm_pallas(plan, feat, subtile=variant.subtile, **kwargs)


def _matrix_hash(indptr, indices, num_nodes: int) -> str:
    md5 = hashlib.md5()
    md5.update(np.int64(num_nodes).tobytes())
    md5.update(np.ascontiguousarray(indptr).tobytes())
    md5.update(np.ascontiguousarray(indices).tobytes())
    return md5.hexdigest()[:16]


def _code_version() -> str:
    """Hash of the kernel/tuner sources so cache entries invalidate on
    code change (reference compiler.py:45-59 get_repo_version)."""
    root = os.path.dirname(os.path.dirname(__file__))
    md5 = hashlib.md5()
    for rel in ("ops", "format", "tuner"):
        d = os.path.join(root, rel)
        for fname in sorted(os.listdir(d)):
            if fname.endswith(".py"):
                with open(os.path.join(d, fname), "rb") as f:
                    md5.update(f.read())
    return md5.hexdigest()[:12]


class SpmmTuner:
    def __init__(self, cache_dir: str | None = None):
        self._mem: dict[str, TunedSpmm] = {}
        self._cache_dir = cache_dir

    def cache_dir(self) -> str:
        if self._cache_dir is not None:
            return self._cache_dir
        return os.environ.get(
            const.CACHE_DIR_FLAG,
            os.path.join(os.path.expanduser("~"), ".voltrix_spmm_tpu", "cache"),
        )

    def _disk_path(self, signature: str) -> str:
        return os.path.join(self.cache_dir(), f"tune.{signature}.json")

    def compile_and_tune(
        self,
        indptr,
        indices,
        num_nodes: int,
        feat,
        space: list[Variant] | None = None,
        hash_tag: str | None = None,
        iters: int = 8,
        backend: str = "auto",
    ) -> TunedSpmm:
        """Pick the fastest variant for this (matrix, feature-shape) pair.

        `feat` is a representative feature array (shape/dtype matter).
        """
        import jax.numpy as jnp

        if space is None:
            space = default_space()
        verbose = env_flag(const.PRINT_AUTOTUNE_FLAG)

        tag = hash_tag or _matrix_hash(indptr, indices, num_nodes)
        signature = (
            f"{tag}.n{num_nodes}.d{feat.shape[1]}.{np.dtype(feat.dtype).name}"
            f".{_code_version()}"
        )

        if signature in self._mem:
            if verbose:
                print(f"voltrix_tpu tune: memory hit for {signature}")
            return self._mem[signature]

        plans: dict = {}

        def plan_for_variant(variant: Variant):
            cfg = variant.plan_config
            if variant.impl == "hybrid":
                key = ("hybrid", cfg, variant.threshold)
                if key not in plans:
                    from ..format.hybrid import csr_preprocess_hybrid

                    hp = csr_preprocess_hybrid(
                        indptr,
                        indices,
                        num_nodes,
                        dense_config=cfg,
                        threshold=variant.threshold,
                        backend=backend,
                    )
                    plans[key] = HybridPlan(
                        hp.dense.device(), hp.sparse.device(),
                        hp.num_nodes, hp.num_edges,
                    )
                return plans[key]
            if cfg not in plans:
                plans[cfg] = csr_preprocess(
                    indptr, indices, num_nodes, cfg, backend=backend
                ).device()
            return plans[cfg]

        # on-disk hit: re-instantiate the recorded winner (plan rebuilt
        # from the matrix; cheap relative to tuning every variant)
        disk = self._disk_path(signature)
        if os.path.exists(disk):
            with open(disk) as f:
                entry = json.load(f)
            variant = Variant(**entry["variant"])
            tuned = TunedSpmm(
                plan=plan_for_variant(variant),
                variant=variant,
                time_ms=entry["time_ms"],
                candidates=entry.get("candidates", {}),
            )
            self._mem[signature] = tuned
            if verbose:
                print(f"voltrix_tpu tune: disk hit for {signature}: {variant.key()}")
            return tuned

        feat = jnp.asarray(feat)
        results: dict[str, float] = {}
        best: tuple[float, Variant, SpmmPlan] | None = None
        for variant in space:
            try:
                plan = plan_for_variant(variant)
                t = device_loop_bench(
                    lambda c, p, v=variant: _run_variant(v, p, c),
                    feat,
                    plan,
                    iters=iters,
                    trials=2,
                )
                if t < 0.5:  # sub-ms kernels: dispatch jitter dominates,
                    # re-time with a longer loop for a stable ranking
                    t = device_loop_bench(
                        lambda c, p, v=variant: _run_variant(v, p, c),
                        feat,
                        plan,
                        iters=max(iters * 8, 64),
                        trials=2,
                    )
            except Exception as e:  # invalid candidate -> skip, like the
                # reference's nonzero-return-code filter (tuner.py:108-116)
                if verbose:
                    print(f"voltrix_tpu tune: {variant.key()} invalid: {e}")
                results[variant.key()] = float("inf")
                continue
            results[variant.key()] = t
            if verbose:
                print(f"voltrix_tpu tune: {variant.key()} -> {t:.3f} ms")
            if best is None or t < best[0]:
                best = (t, variant, plan)

        assert best is not None, "no valid tuning candidate"
        tuned = TunedSpmm(
            plan=best[2], variant=best[1], time_ms=best[0], candidates=results
        )
        self._mem[signature] = tuned

        os.makedirs(self.cache_dir(), exist_ok=True)
        tmp = disk + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "variant": dataclasses.asdict(best[1]),
                    "time_ms": best[0],
                    "candidates": results,
                },
                f,
                indent=2,
            )
        os.replace(tmp, disk)
        if verbose:
            print(
                f"voltrix_tpu tune: best for {signature}: "
                f"{best[1].key()} @ {best[0]:.3f} ms"
            )
        return tuned


# module-level tuner (the reference exposes a singleton `jit_tuner`,
# voltrix/jit_kernels/tuner.py:168)
spmm_tuner = SpmmTuner()


def tune_spmm(indptr, indices, num_nodes: int, feat, **kwargs) -> TunedSpmm:
    return spmm_tuner.compile_and_tune(indptr, indices, num_nodes, feat, **kwargs)
