"""Window-range plan slicing for streamed (bounded-memory) dispatch.

Reddit-class graphs (~100M deduped edges, avg degree ~430 at n=233k)
saturate every row window: the pregather path's materialized gather is
30-60 GB — beyond one v5e's 16 GB HBM for every kernel AND the BCOO
baseline (the reference evaluates reddit on an 80 GB H100). Slicing the
plan into contiguous window ranges and dispatching them sequentially
inside one jit bounds peak HBM to one chunk's gather (XLA frees each
chunk's buffers before the next starts); outputs concatenate along
rows. This is the single-chip fallback — the multi-chip answer is
`parallel.row_sharded_spmm`, which shards the same structure over ICI.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .plan import SpmmPlan


def slice_plan_windows(plan: SpmmPlan, num_chunks: int) -> list[SpmmPlan]:
    """Split a (host-resident) plan into `num_chunks` contiguous window
    ranges. Each sub-plan is self-contained: block_ptr rebased, windows
    rebased, rows = its window span (the last chunk keeps the true row
    tail). Gather maps still index the FULL source-row space."""
    assert num_chunks >= 1
    nw = plan.num_windows
    num_chunks = min(num_chunks, nw)
    bp = np.asarray(plan.block_ptr).astype(np.int64)
    bm = np.asarray(plan.bitmask)
    hi = np.asarray(plan.hind)
    wob = np.asarray(plan.window_of_block)
    occ = None if plan.occ is None else np.asarray(plan.occ)
    vals = None if plan.values is None else np.asarray(plan.values)
    W = plan.config.block_h
    per = -(-nw // num_chunks)

    subs = []
    for c in range(num_chunks):
        w0, w1 = c * per, min((c + 1) * per, nw)
        if w0 >= nw:
            break
        b0, b1 = int(bp[w0]), int(bp[w1])
        rows = min(w1 * W, plan.num_nodes) - w0 * W
        sub_bpw = np.diff(bp[w0 : w1 + 1])
        subs.append(
            dataclasses.replace(
                plan,
                bitmask=bm[b0:b1],
                hind=hi[b0:b1],
                window_of_block=(wob[b0:b1] - w0).astype(np.int32),
                block_ptr=(bp[w0 : w1 + 1] - b0).astype(np.int32),
                occ=None if occ is None else occ[b0:b1],
                values=None if vals is None else vals[b0:b1],
                num_nodes=rows,
                num_edges=0,
                num_windows=w1 - w0,
                total_blocks=b1 - b0,
                has_empty_windows=bool((sub_bpw == 0).any()),
                num_cols=plan.source_rows,
            )
        )
    return subs


def csr_preprocess_streamed(
    indptr,
    indices,
    num_nodes: int,
    config,
    num_chunks: int = 8,
    backend: str = "auto",
    to_device: bool = True,
    num_cols: int | None = None,
) -> list[SpmmPlan]:
    """Build the plan chunk-by-chunk, overlapping CPU preprocessing with
    the HBM upload (ROADMAP #9: at rmat-19 scale the multi-GB plan
    transfer dominates cold start when it only starts after the full
    host build).

    Each chunk is a window-aligned row range preprocessed independently
    (windows never share state), `jax.device_put` is asynchronous, so
    chunk c uploads while chunk c+1 builds on the CPU. Returns the same
    list-of-sub-plans `ops.spmm_streamed` consumes; output equals
    `slice_plan_windows(csr_preprocess(...), num_chunks)` (parity
    tested)."""
    from .preprocess import csr_preprocess

    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    span = num_cols if num_cols is not None else num_nodes
    W = config.block_h
    nw = max(-(-num_nodes // W), 1)
    num_chunks = max(1, min(num_chunks, nw))
    per = -(-nw // num_chunks)

    subs: list[SpmmPlan] = []
    for c in range(num_chunks):
        r0 = c * per * W
        if r0 >= num_nodes:
            break
        r1 = min((c + 1) * per * W, num_nodes)
        local_ptr = indptr[r0 : r1 + 1] - indptr[r0]
        local_idx = indices[indptr[r0] : indptr[r1]]
        sub = csr_preprocess(
            local_ptr, local_idx, r1 - r0, config,
            backend=backend, num_cols=span,
        )
        subs.append(sub.device() if to_device else sub)
    return subs


def estimate_gather_bytes(plan_or_nnz, d: int, itemsize: int = 4) -> int:
    """Rough peak-gather estimate used to decide when streaming is
    needed: the materialized gather is gather_rows x d x itemsize."""
    if isinstance(plan_or_nnz, SpmmPlan):
        rows = plan_or_nnz.gather_rows
    else:
        rows = int(plan_or_nnz)
    return rows * d * itemsize
