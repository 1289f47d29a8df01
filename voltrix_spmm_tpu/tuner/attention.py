"""Attention-variant autotuner: plan geometry + plane dtype for the
batched multi-head flash-attention op (`ops.spmm_attention_mh_ad`).

The SpMM tuner races kernel IMPLEMENTATIONS because binary aggregation
has many formulations; attention has one (the online-softmax flash
kernel over the binned plan — `ops/attention_mh.py`), so its tuning
space is the plan geometry (window height and unroll of BOTH the
forward and transpose plans) and the gathered-plane storage dtype
(f32 vs bf16 — halves gather traffic, softmax statistics keep f32 via
hi/lo splitting inside the op).

What the window height trades (measured on v5e, rmat-17 d64 H4):
- taller windows dedup the neighbor gather more (each distinct source
  row is fetched once per WINDOW), shrinking the dominant gathered
  kv/qdO planes, but
- the online-softmax walk revisits the (block_h, pair_w) output tile
  once per block, so tall windows on scattered graphs re-stream large
  output tiles through VMEM for mostly-masked score tiles.

Timing is the full train-step shape — value_and_grad through the op
(fwd + dQ + dK/dV kernels + both gathers) — because that is what the
GAT models dispatch; `mode="fwd"` times inference instead.

Role-parity: the reference tuner races template models for its binary
SpMM only (voltrix/jit_kernels/tuner.py:46-165); attention is beyond
its scope (bmat_kernels.cuh:16-20) — this module applies the same
measured-race + persistent-cache protocol to the TPU framework's own
attention product.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..format.plan import PlanConfig, SpmmPlan
from ..format.preprocess import csr_preprocess
from ..project import const
from ..utils import device_loop_bench, env_flag
from .tuner import _code_version, _matrix_hash


@dataclass(frozen=True)
class AttnVariant:
    block_h: int = 128
    block_unroll: int = 4
    plane_dtype: str | None = None  # None (f32) | "bfloat16"
    subtile: bool = False  # skip fully-masked 128-row sub-windows in all
    # three kernels (cluster_cols plan + occupancy bitmap — the SpMM
    # trick applied to the online-softmax walk, VERDICT r4 #3)

    @property
    def plan_config(self) -> PlanConfig:
        return PlanConfig(
            self.block_h, 128, 1, self.block_unroll,
            cluster_cols=self.subtile,
        )

    def key(self) -> str:
        return (
            f"attn/h{self.block_h}u{self.block_unroll}"
            f"{'st' if self.subtile else ''}"
            f"/{self.plane_dtype or 'float32'}"
        )


def attention_default_space(
    accurate: bool = False,
    dk: int | None = None,
    dv: int | None = None,
    heads: int | None = None,
    nnz: int | None = None,
) -> list[AttnVariant]:
    """Window heights {128..1024} x plane dtype {f32, bf16}.

    Taller-than-1024 windows are out: the fwd/dQ kernels revisit a
    (block_h, pair_w) f32 output tile per block and at h2048 x pair_w
    512 the tile alone is 4 MB — with the kv tile and scratch that
    crowds the 16 MB VMEM budget for no measured win (the gather-dedup
    curve is nearly flat past h1024 on every bench graph)."""
    heights = [128, 256, 512, 1024]
    space = [AttnVariant(h, 4) for h in heights]
    if not accurate:
        space += [AttnVariant(h, 4, "bfloat16") for h in heights]
    # subtile twins at the tall windows, where the occupancy skip has
    # empty 128-row sub-products to elide (at h128 there is exactly one
    # sub-window — nothing to skip); the clustered plan costs one extra
    # host pass, shared across the dtype twins by plan-geometry key
    for h in (512, 1024):
        space.append(AttnVariant(h, 4, None, subtile=True))
        if not accurate:
            space.append(AttnVariant(h, 4, "bfloat16", subtile=True))
    # deeper group unroll at the round-5 winner heights: halves grid
    # steps / per-step softmax-state overheads (the SpMM headline's u8
    # lever applied to the attention walk)
    space.append(AttnVariant(256, 8))
    if not accurate:
        space.append(AttnVariant(256, 8, "bfloat16"))
        space.append(AttnVariant(512, 8, "bfloat16", subtile=True))
    return space


@dataclass
class TunedAttention:
    """Best (plan pair, variant) for one adjacency + head geometry —
    call it like `spmm_attention_mh_ad(q, k, v)`."""

    plan: SpmmPlan
    plan_t: SpmmPlan
    variant: AttnVariant
    time_ms: float
    negative_slope: float = 0.2
    candidates: dict = field(default_factory=dict)

    def __call__(self, q, k, v, **kw):
        import jax.numpy as jnp

        from ..ops.attention_mh import spmm_attention_mh_ad

        kw.setdefault("negative_slope", self.negative_slope)
        if self.variant.plane_dtype:
            kw.setdefault("plane_dtype", jnp.dtype(self.variant.plane_dtype))
        if self.variant.subtile:
            kw.setdefault("subtile", True)
        return spmm_attention_mh_ad(
            self.plan, q, k, v, plan_t=self.plan_t, **kw
        )


class AttentionTuner:
    def __init__(self, cache_dir: str | None = None):
        self._mem: dict[str, TunedAttention] = {}
        self._cache_dir = cache_dir

    def cache_dir(self) -> str:
        if self._cache_dir is not None:
            return self._cache_dir
        return os.environ.get(
            const.CACHE_DIR_FLAG,
            os.path.join(
                os.path.expanduser("~"), ".voltrix_spmm_tpu", "cache"
            ),
        )

    def _disk_path(self, signature: str) -> str:
        return os.path.join(self.cache_dir(), f"tune_attn.{signature}.json")

    def compile_and_tune(
        self,
        indptr,
        indices,
        num_nodes: int,
        *,
        heads: int,
        dk: int,
        dv: int,
        at_indptr=None,
        at_indices=None,
        mode: str = "train",
        space: list[AttnVariant] | None = None,
        hash_tag: str | None = None,
        iters: int = 8,
        negative_slope: float = 0.2,
        accurate: bool = False,
        seed: int = 0,
    ) -> TunedAttention:
        """Race attention variants on THIS adjacency and head geometry.

        at_indptr/at_indices: CSR of A^T for the scatter-free split
        backward. None => A is treated as symmetric and the forward
        plan doubles as the transpose plan (the GNN norm; asserted
        cheaply via nnz equality of A and A^T is the caller's job).
        mode: "train" times value_and_grad through the op (fwd + dQ +
        dK/dV); "fwd" times inference. Winner + per-candidate times are
        cached on disk keyed by (matrix hash | hash_tag, H/dk/dv, mode,
        code version)."""
        import jax
        import jax.numpy as jnp

        verbose = env_flag(const.PRINT_AUTOTUNE_FLAG)
        mat = hash_tag or _matrix_hash(indptr, indices, num_nodes)
        sig = (
            f"{mat}.H{heads}k{dk}v{dv}.{mode}"
            f"{'A' if accurate else ''}.{_code_version()}"
        )
        if sig in self._mem:
            return self._mem[sig]
        if space is None:
            space = attention_default_space(
                accurate=accurate, dk=dk, dv=dv, heads=heads,
                nnz=len(indices),
            )
        by_key = {v.key(): v for v in space}

        disk = self._disk_path(sig)
        cached = None
        if os.path.exists(disk):
            try:
                with open(disk) as f:
                    cached = json.load(f)
            except Exception:
                cached = None
        if cached is not None and cached.get("winner") in by_key:
            win = by_key[cached["winner"]]
            tuned = self._materialize(
                indptr, indices, num_nodes, at_indptr, at_indices, win,
                float(cached.get("time_ms", 0.0)),
                cached.get("candidates", {}), negative_slope,
            )
            self._mem[sig] = tuned
            return tuned

        rng = np.random.default_rng(seed)
        q = jnp.asarray(
            rng.standard_normal((heads, num_nodes, dk)).astype(np.float32)
        )
        k = jnp.asarray(
            rng.standard_normal((heads, num_nodes, dk)).astype(np.float32)
        )
        v = jnp.asarray(
            rng.standard_normal((heads, num_nodes, dv)).astype(np.float32)
        )

        from ..ops.attention_mh import spmm_attention_mh_ad

        results: dict[str, float] = {}
        plans: dict[int, tuple] = {}  # geometry-shared plan pairs
        best = None
        for var in space:
            geo = (var.block_h, var.block_unroll, var.subtile)
            try:
                if geo not in plans:
                    plan = csr_preprocess(
                        indptr, indices, num_nodes, var.plan_config
                    ).device()
                    if at_indptr is None:
                        plan_t = plan
                    else:
                        plan_t = csr_preprocess(
                            at_indptr, at_indices, num_nodes,
                            var.plan_config,
                        ).device()
                    plans[geo] = (plan, plan_t)
                plan, plan_t = plans[geo]
                pdt = (
                    jnp.dtype(var.plane_dtype) if var.plane_dtype else None
                )

                if mode == "train":

                    def step(c, k_, v_, p=plan, pt=plan_t, d=pdt,
                             st=var.subtile):
                        def loss(q2, k2, v2):
                            out = spmm_attention_mh_ad(
                                p, q2, k2, v2, plan_t=pt,
                                negative_slope=negative_slope,
                                plane_dtype=d, subtile=st,
                            )
                            return jnp.sum(out * (1.0 + 1e-6 * out))

                        l, (gq, gk, gv) = jax.value_and_grad(
                            loss, argnums=(0, 1, 2)
                        )(c, k_, v_)
                        return c + 1e-38 * (l + jnp.sum(gq) + jnp.sum(gk)
                                            + jnp.sum(gv))

                    t = device_loop_bench(
                        step, q, k, v, iters=iters, trials=2
                    )
                else:

                    def step(c, k_, v_, p=plan, pt=plan_t, d=pdt,
                             st=var.subtile):
                        out = spmm_attention_mh_ad(
                            p, c, k_, v_, plan_t=pt,
                            negative_slope=negative_slope, plane_dtype=d,
                            subtile=st,
                        )
                        return c + 1e-38 * jnp.sum(out)

                    t = device_loop_bench(step, q, k, v, iters=iters, trials=2)
            except Exception as e:  # VMEM/OOM/compile -> skip (validity
                # filter, same protocol as the SpMM tuner)
                if verbose:
                    print(f"[tune_attention] {var.key()}: invalid ({e})")
                results[var.key()] = float("nan")
                continue
            results[var.key()] = t
            if verbose:
                print(f"[tune_attention] {var.key()}: {t:.3f} ms")
            if best is None or t < best[1]:
                best = (var, t)
        if best is None:
            raise RuntimeError(
                f"tune_attention: no valid candidate (space={len(space)}, "
                f"results={results})"
            )

        os.makedirs(self.cache_dir(), exist_ok=True)
        tmp = disk + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "winner": best[0].key(),
                    "time_ms": best[1],
                    "candidates": {
                        kk: (None if np.isnan(tt) else tt)
                        for kk, tt in results.items()
                    },
                },
                f,
                indent=1,
            )
        os.replace(tmp, disk)

        win_geo = (best[0].block_h, best[0].block_unroll, best[0].subtile)
        plan, plan_t = plans[win_geo]
        tuned = TunedAttention(
            plan, plan_t, best[0], best[1], negative_slope,
            {kk: tt for kk, tt in results.items()},
        )
        self._mem[sig] = tuned
        return tuned

    def _materialize(
        self, indptr, indices, num_nodes, at_indptr, at_indices, var,
        time_ms, candidates, negative_slope,
    ) -> TunedAttention:
        plan = csr_preprocess(
            indptr, indices, num_nodes, var.plan_config
        ).device()
        if at_indptr is None:
            plan_t = plan
        else:
            plan_t = csr_preprocess(
                at_indptr, at_indices, num_nodes, var.plan_config
            ).device()
        return TunedAttention(
            plan, plan_t, var, time_ms, negative_slope, dict(candidates)
        )


attention_tuner = AttentionTuner()


def tune_attention(indptr, indices, num_nodes: int, **kw) -> TunedAttention:
    """Module-level convenience over a shared `AttentionTuner` (same
    pattern as `tune_spmm`)."""
    return attention_tuner.compile_and_tune(
        indptr, indices, num_nodes, **kw
    )
