"""ctypes bridge to the C++/OpenMP preprocessing runtime.

Builds (via the g++ JIT/cache layer, like the reference builds its
native preprocessing through the nvcc JIT, voltrix/jit_kernels/
preprocess.py:23 -> voltrix::preprocess) and calls the two-pass plan
construction in csrc/voltrix_preprocess.hpp. Falls back cleanly when no
compiler is available (`native_available()` gates callers).
"""

from __future__ import annotations

import functools
import logging
import os

import numpy as np

from ..format.plan import PlanConfig, SpmmPlan
from ..project import const

logger = logging.getLogger("voltrix_tpu")

_INCLUDES = ('"voltrix_preprocess.hpp"',)

_ANALYZE_ARGS = (
    ("indptr", np.int32),
    ("indices", np.int32),
    ("num_nodes", int),
    ("window_rows", int),
    ("seg", int),
    ("uniq_cols", np.int32),
    ("win_unique", np.int32),
)

_ANALYZE_BODY = """
    __return_code = voltrix_tpu::analyze_windows(
        indptr, indices, num_nodes, window_rows, seg, uniq_cols, win_unique);
"""

_FILL_ARGS = (
    ("indptr", np.int32),
    ("indices", np.int32),
    ("num_nodes", int),
    ("window_rows", int),
    ("block_cols", int),
    ("seg", int),
    ("uniq_cols", np.int32),
    ("win_unique", np.int32),
    ("block_ptr", np.int64),
    ("hind", np.int32),
    ("bitmask", np.uint32),
    ("words", int),
    ("nnz_out", np.int64),
)

_FILL_BODY = """
    __return_code = voltrix_tpu::fill_plan(
        indptr, indices, num_nodes, window_rows, block_cols, seg, uniq_cols,
        win_unique, block_ptr, hind, bitmask, words, nnz_out);
"""


_ORACLE_ARGS = (
    ("indptr", np.int32),
    ("indices", np.int32),
    ("num_rows", int),
    ("x", np.float32),
    ("d", int),
    ("out", np.float32),
)

_ORACLE_BODY = """
    __return_code = voltrix_tpu::csr_spmm_f32(
        indptr, indices, num_rows, x, d, out);
"""


@functools.cache
def _build_oracle():
    from .. import jit

    return jit.build(
        "csr_spmm_oracle",
        _ORACLE_ARGS,
        jit.generate(_INCLUDES, _ORACLE_ARGS, _ORACLE_BODY),
    )


def native_spmm_oracle(indptr, indices, num_nodes: int, feat) -> np.ndarray:
    """Host C++/OpenMP CSR @ feat golden oracle (binary values) —
    the cuSPARSE-oracle role of the reference's test protocol, ~5-10x
    faster than the scipy f64 path on large problems. Expects canonical
    CSR (no duplicate entries; duplicates would sum, unlike the
    binarizing scipy oracle); accumulates in f32."""
    fn = _build_oracle()
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    feat = np.ascontiguousarray(feat, np.float32)
    out = np.zeros((num_nodes, feat.shape[1]), np.float32)
    rc = fn(indptr, indices, num_nodes, feat, feat.shape[1], out)
    assert rc == 0, f"csr_spmm_f32 failed with code {rc}"
    return out


@functools.cache
def _build_kernels():
    from .. import jit

    analyze = jit.build(
        "preprocess_analyze",
        _ANALYZE_ARGS,
        jit.generate(_INCLUDES, _ANALYZE_ARGS, _ANALYZE_BODY),
    )
    fill = jit.build(
        "preprocess_fill", _FILL_ARGS, jit.generate(_INCLUDES, _FILL_ARGS, _FILL_BODY)
    )
    return analyze, fill


def native_available() -> bool:
    if os.environ.get(const.DISABLE_NATIVE_FLAG, "0") == "1":
        return False
    try:
        _build_kernels()
        return True
    except Exception as e:  # no compiler / build failure -> numpy path
        logger.warning("native preprocessing unavailable: %s", e)
        return False


def native_preprocess(
    indptr,
    indices,
    num_nodes: int,
    config: PlanConfig,
    num_cols: int | None = None,
) -> SpmmPlan:
    analyze, fill = _build_kernels()
    W, K, words = config.block_h, config.block_w, config.words_per_col
    num_windows = max(-(-num_nodes // W), 1)

    # the native kernels index with int32; a >=2^31 nnz or id space would
    # silently wrap after the cast (r1 advisor finding) -> numpy path,
    # which is int64 throughout
    indptr64 = np.asarray(indptr, dtype=np.int64)
    span = num_cols if num_cols is not None else num_nodes
    i32max = np.iinfo(np.int32).max
    if (
        (indptr64.shape[0] and int(indptr64[-1]) > i32max)
        or num_nodes > i32max
        or span > i32max
    ):
        from ..format.preprocess import _numpy_preprocess

        logger.warning(
            "native preprocessing: input exceeds int32 range "
            "(nnz=%s, num_nodes=%s, span=%s); using the numpy backend",
            int(indptr64[-1]) if indptr64.shape[0] else 0, num_nodes, span,
        )
        return _numpy_preprocess(
            indptr64, np.asarray(indices, np.int64), num_nodes, config, num_cols
        )

    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    nnz_in = int(indices.shape[0])
    assert indptr.shape[0] == num_nodes + 1

    if nnz_in == 0:
        return SpmmPlan(
            bitmask=np.zeros((0, words, K), np.uint32),
            hind=np.zeros((0, K), np.int32),
            window_of_block=np.zeros((0,), np.int32),
            block_ptr=np.zeros((num_windows + 1,), np.int32),
            config=config,
            num_nodes=num_nodes,
            num_edges=0,
            num_windows=num_windows,
            total_blocks=0,
            has_empty_windows=True,
            num_cols=num_cols,
        )

    seg = config.gather_segment
    uniq_cols = np.empty(nnz_in, dtype=np.int32)
    win_unique = np.zeros(num_windows, dtype=np.int32)
    rc = analyze(indptr, indices, num_nodes, W, seg, uniq_cols, win_unique)
    assert rc == 0, f"analyze_windows failed with code {rc}"

    blocks_per_window = -(-(win_unique.astype(np.int64) * seg) // K)
    if config.block_unroll > 1:
        u = config.block_unroll
        blocks_per_window = -(-blocks_per_window // u) * u
    from ..format.preprocess import pad_empty_windows

    blocks_per_window = pad_empty_windows(
        blocks_per_window, config.block_unroll
    )
    block_ptr = np.zeros(num_windows + 1, dtype=np.int64)
    np.cumsum(blocks_per_window, out=block_ptr[1:])
    total_blocks = int(block_ptr[-1])

    hind = np.zeros((total_blocks, K), dtype=np.int32)
    bitmask = np.zeros((total_blocks, words, K), dtype=np.uint32)
    nnz_out = np.zeros(1, dtype=np.int64)
    rc = fill(
        indptr,
        indices,
        num_nodes,
        W,
        K,
        seg,
        uniq_cols,
        win_unique,
        block_ptr,
        hind.reshape(-1),
        bitmask.reshape(-1),
        words,
        nnz_out,
    )
    assert rc == 0, f"fill_plan failed with code {rc}"

    window_of_block = np.repeat(
        np.arange(num_windows, dtype=np.int32), blocks_per_window
    )
    return SpmmPlan(
        bitmask=bitmask,
        hind=hind,
        window_of_block=window_of_block,
        block_ptr=block_ptr.astype(np.int32),
        config=config,
        num_nodes=num_nodes,
        num_edges=int(nnz_out[0]),
        num_windows=num_windows,
        total_blocks=total_blocks,
        has_empty_windows=bool((blocks_per_window == 0).any()),
        num_cols=num_cols,
    )


_CLUSTER_ARGS = (
    ("num_windows", int),
    ("words", int),
    ("block_cols", int),
    ("seg", int),
    ("block_ptr", np.int64),
    ("hind", np.int32),
    ("bitmask", np.uint32),
    ("occ", np.int32),
)

_CLUSTER_BODY = """
    __return_code = voltrix_tpu::cluster_windows(
        num_windows, words, block_cols, seg, block_ptr, hind, bitmask, occ);
"""


@functools.cache
def _build_cluster():
    from .. import jit

    return jit.build(
        "preprocess_cluster",
        _CLUSTER_ARGS,
        jit.generate(_INCLUDES, _CLUSTER_ARGS, _CLUSTER_BODY),
    )


def native_cluster(plan: SpmmPlan) -> SpmmPlan:
    """C++/OpenMP twin of `format.cluster.cluster_window_columns` +
    `block_occupancy` in one window-local pass (same output contract;
    parity-tested). The numpy path shuffles the full multi-GB bitmask
    through strided copies — measured 118 s at rmat-19 h2048 vs ~2 s
    here."""
    import dataclasses

    fn = _build_cluster()
    cfg = plan.config
    assert cfg.block_h % 128 == 0
    if plan.total_blocks == 0:
        return dataclasses.replace(
            plan, occ=np.zeros(0, np.int32)
        )
    # the C++ pass permutes lanes IN PLACE through these buffers — copy
    # unconditionally (ascontiguousarray is a no-copy passthrough on
    # already-contiguous arrays) so the caller's plan stays intact, the
    # same non-mutating contract as cluster_window_columns
    bm = np.array(plan.bitmask, copy=True)
    hind = np.array(plan.hind, copy=True)
    bp = np.ascontiguousarray(plan.block_ptr, dtype=np.int64)
    occ = np.zeros(plan.total_blocks, np.int32)
    rc = fn(
        plan.num_windows,
        cfg.words_per_col,
        cfg.block_w,
        cfg.gather_segment,
        bp,
        hind.reshape(-1),
        bm.reshape(-1),
        occ,
    )
    assert rc == 0, f"cluster_windows failed with code {rc}"
    return dataclasses.replace(plan, bitmask=bm, hind=hind, occ=occ)
