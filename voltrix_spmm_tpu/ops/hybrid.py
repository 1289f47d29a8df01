"""Hybrid SpMM: dense-run part + scattered-exact tail (format/hybrid.py).

Two dense-side executions (raced by the tuner):

- dense_impl="fused": in-kernel bulk-DMA pipeline (spmm_pallas_fused) —
  wins when runs are long (seg >= 32) and coverage is tight.
- dense_impl="pregather": the PACKED XLA gather (one (q*d)-wide
  super-row per q-aligned run, ops/pallas_spmm._gather_rows) feeding
  the streaming masked-matmul kernel. This is the round-5 density-split
  design: the v5e gather law is per-ROW bound, so routing only
  >=threshold-full q-groups through the packed fetch cuts gather rows
  ~2.4x on reddit-class graphs while bounding slot inflation at
  seg/threshold (census: bench/exp_pack_order.py; reference role:
  spmm_kernels.cuh:1563-1570 bulk copies of gathered row sets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..format.hybrid import HybridPlan
from .pallas_spmm import spmm_pallas
from .pallas_spmm_fused import spmm_pallas_fused


def spmm_pallas_hybrid(
    plan: HybridPlan,
    feat: jax.Array,
    *,
    block_d: int | None = None,
    compute_dtype=jnp.float32,
    precision=None,
    interpret: bool | None = None,
    out_dtype=None,
    dense_impl: str = "auto",
    subtile: bool = False,
) -> jax.Array:
    kwargs = dict(
        block_d=block_d,
        compute_dtype=compute_dtype,
        precision=precision,
        interpret=interpret,
        out_dtype=out_dtype,
    )
    if dense_impl == "auto":
        # interleaved / incidence-packed dense sides are pregather-only
        # (fused assumes run-contiguous natural lanes); classic coverage
        # plans keep the fused bulk-DMA default
        cfg_d = plan.dense.config
        dense_impl = (
            "pregather"
            if cfg_d.seg_interleaved
            or getattr(plan.dense, "src_perm", None) is not None
            else "fused"
        )
    assert dense_impl in ("fused", "pregather"), dense_impl
    out = None
    if plan.dense.total_blocks > 0:
        if dense_impl == "pregather":
            out = spmm_pallas(plan.dense, feat, subtile=subtile, **kwargs)
        else:
            out = spmm_pallas_fused(plan.dense, feat, **kwargs)
    if plan.sparse.total_blocks > 0:
        sp = spmm_pallas(plan.sparse, feat, subtile=subtile, **kwargs)
        out = sp if out is None else out + sp
    if out is None:
        return jnp.zeros_like(
            feat, dtype=out_dtype if out_dtype is not None else feat.dtype
        )
    return out
