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
from ..format.preprocess import FUSED_COVERAGE_THRESHOLD, csr_preprocess
from ..project import const
from ..utils import device_loop_bench, env_flag


@dataclass(frozen=True)
class Variant:
    impl: str  # "pregather" | "fused" | "hybrid" | "int8" | "ell" | "weighted"
    block_h: int = 128
    block_w: int = 128
    gather_segment: int = 1
    block_d: int | None = None
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    precision: str | None = None
    threshold: int | None = None  # hybrid: min neighbors per dense run
    block_unroll: int = 1
    subtile: bool = False  # pregather: skip empty 128-row sub-tiles; the
    # plan is column-clustered (format/cluster.py) so skipping actually
    # fires — unclustered subtiling measured a loss in r1 (occupancy 14/16)
    feat_dtype: str | None = None  # storage dtype for the gathered X rows
    # ("bfloat16" halves the gather volume — measured 2.2-3.9x faster
    # gather on v5e; accumulation stays f32, accuracy class = bf16
    # storage, rel err <= 1e-2 per BASELINE). None = keep input dtype.
    slots: int | None = None  # fused only: pipeline buffer count (None=2;
    # 3 keeps one more group of gathered data in flight — the reference's
    # NUM_BUFFERS=4 class, spmm_kernels.cuh:2074-2108)
    stream_chunks: int | None = None  # pregather only: dispatch the plan
    # in this many window chunks so peak HBM is one chunk's gather
    # (reddit-class graphs exceed device memory otherwise; see
    # format/stream.py). None = single dispatch.
    pack_order: str = "natural"  # "incidence": build-time source
    # permutation that tightens seg-run coverage (see
    # format.preprocess.incidence_order); pregather seg>1 only
    hybrid_dense: str = "fused"  # hybrid only: kernel for the dense-run
    # side. "pregather" = the packed super-row XLA gather + streaming
    # masked matmul (the round-5 density-split design, ops/hybrid.py)
    ipack: bool = False  # seg>1 pregather: block-granular interleaved
    # layout — the kernel consumes the (q*d)-wide packed gather
    # directly (q accumulated dots), eliding the flatten copy that
    # dominated packed variants (PlanConfig.seg_interleaved). Needs
    # block_unroll % gather_segment == 0.

    @property
    def plan_config(self) -> PlanConfig:
        return PlanConfig(
            self.block_h,
            self.block_w,
            self.gather_segment,
            self.block_unroll,
            cluster_cols=self.subtile,
            pack_order=self.pack_order,
            seg_interleaved=self.ipack,
        )

    def key(self) -> str:
        return (
            f"{self.impl}/h{self.block_h}w{self.block_w}s{self.gather_segment}"
            f"u{self.block_unroll}{'st' if self.subtile else ''}"
            f"{'p' + str(self.slots) if self.slots else ''}"
            f"{'c' + str(self.stream_chunks) if self.stream_chunks else ''}"
            f"{'io' if self.pack_order == 'incidence' else ''}"
            f"{'hp' if self.hybrid_dense == 'pregather' else ''}"
            f"{'ik' if self.ipack else ''}"
            f"{'/x' + self.feat_dtype if self.feat_dtype else ''}"
            f"/d{self.block_d}/{self.compute_dtype}"
            f"/{self.precision}/t{self.threshold}"
        )


def weighted_default_space(
    d: int | None = None,
    nnz: int | None = None,
    accurate: bool = False,
    dense_slots_per_nnz: float | None = None,
) -> list[Variant]:
    """Tuning space for weighted SpMM (per-edge values).

    The workhorse is the edge-per-lane kernel (O(nnz) value memory,
    ops/ell.py) across window heights; bf16 feature storage halves its
    gather stream. The dense value-plane kernel ("weighted",
    ops/weighted.py) joins only when the expanded-slot plane stays
    within ~8 f32 slots per edge (dense-ish graphs / short windows) —
    beyond that its memory and stream volume are strictly worse.
    dense_slots_per_nnz: expanded slots per edge for an h128 dense plan
    (estimate via `coverage_expansion(..., 128, 1) * 128`)."""
    space = [
        Variant("ell", block_h=128, block_unroll=4),
        Variant("ell", block_h=256, block_unroll=4),
        Variant("ell", block_h=512, block_unroll=4),
    ]
    if not accurate:
        space += [
            Variant("ell", block_h=128, block_unroll=4,
                    feat_dtype="bfloat16"),
            Variant("ell", block_h=256, block_unroll=4,
                    feat_dtype="bfloat16"),
        ]
    huge = (
        nnz is not None and d is not None and nnz * d * 4 > 4 * 2**30
    )
    if huge:
        space = [
            Variant("ell", block_h=128, block_unroll=4, stream_chunks=16),
            Variant("ell", block_h=128, block_unroll=4, stream_chunks=16,
                    feat_dtype="bfloat16"),
            Variant("ell", block_h=256, block_unroll=4, stream_chunks=32,
                    feat_dtype="bfloat16"),
        ]
        if accurate:
            space = [v for v in space if v.feat_dtype is None]
    elif dense_slots_per_nnz is not None and dense_slots_per_nnz <= 8.0:
        space.append(Variant("weighted", block_h=128))
    return space


def _device_mem_budget() -> float:
    """HBM bytes the tuner may plan candidate residency against.

    $VOLTRIX_TPU_DEVICE_MEM_GB overrides; else 80% of the device's
    reported limit; else 12 GB (one v5e chip minus runtime headroom)."""
    env = os.environ.get(const.DEVICE_MEM_FLAG, "")
    if env:
        return float(env) * 2**30
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return float(stats["bytes_limit"]) * 0.8
    except Exception:
        pass
    return 12.0 * 2**30


def default_space(
    accurate: bool = False,
    d: int | None = None,
    nnz: int | None = None,
    coverage128: float | None = None,
    coverage32: float | None = None,
    gather_rows: int | None = None,
    num_nodes: int | None = None,
    gather_rows_2048: int | None = None,
    device_mem_bytes: float | None = None,
    pack_ratio2: float | None = None,
    pack_ratio4: float | None = None,
    split_rows8: float | None = None,
    split_slots8: float | None = None,
) -> list[Variant]:
    """The standard tuning space (the reference's models 0/1/2 analogue).

    accurate=True keeps fp32 MXU inputs only; otherwise bf16 variants
    (tf32-class accuracy, same class as the reference tensor cores)
    join the space.

    int8 is OUT of the default space at every d (measured r2: d=256 it
    is 3x slower — 256-byte rows collapse XLA gather efficiency — and at
    d=1024, where its 4x-thinner stream was expected to pay, it still
    loses 1.3-1.6x on every regime: rmat-17 61.2 vs 37.2 ms, sbm-131k
    50.3 vs 44.1, er-8k 2.21 vs 0.83). The kernel stays available
    explicitly (`Variant("int8", ...)` / `spmm_pallas_int8`) for
    memory-bound cases where even bf16 storage does not fit.

    nnz / gather_rows gate the streamed fallbacks: when the materialized
    gather approaches device memory, window-chunked streamed variants
    join the space — on reddit-class graphs they are the only pregather
    candidates that fit (see format/stream.py). gather_rows is the
    DEDUPED h512-window row count (`coverage_expansion(..., 512, 1) *
    nnz`); without it the gate falls back to raw nnz, which overcounts
    by the dedup factor (measured: er-8k d1024 misrouted to the streamed
    space at 1.44 ms when fused runs 0.83 ms). The fused kernel never
    materializes a gather, so it stays eligible in the huge regime
    whenever its coverage gate passes.

    coverage128 (gather rows per nnz of an h2048/seg128 coverage plan,
    `format.coverage_expansion`) gates the fused bulk-DMA candidates:
    at seg=128 every block is ONE 128-row DMA and the kernel reads X
    exactly once (pregather pays ~3x the volume: gather write + kernel
    re-read + source read), so it wins wherever coverage waste is low —
    measured on v5e d256: dense-4k 0.058 vs 0.078 ms, er-8k 0.225 vs
    0.403 ms. On scattered graphs coverage explodes (rmat-17: 1.75
    rows/nnz, 3.7x slower, GB-scale plan) — gated out at > 0.5."""
    rows_est = gather_rows if gather_rows is not None else nnz
    huge = rows_est is not None and d is not None and rows_est * d * 4 > 4 * 2**30
    if huge:
        # Memory-budgeted space: at this scale candidates die on device
        # residency, not speed, so build only geometries whose plan
        # (bitmask ~ rows_h*h/8 + hind) AND chunked gather fit the HBM
        # budget next to the f32 features/output (measured failure mode:
        # ogbn-products-class 2.4M-node/124M-nnz graphs reject every
        # fixed-chunk candidate — f32 16-chunk gathers alone are 8 GB).
        budget = (
            device_mem_bytes
            if device_mem_bytes is not None
            else _device_mem_budget()
        )
        n = num_nodes if num_nodes is not None else 0
        r512 = gather_rows if gather_rows is not None else nnz
        # h2048 dedup is the subtile geometry's whole case; when the
        # caller did not measure it, stay optimistic (None) and let the
        # tuner's validity filter drop the candidate at build time —
        # nnz as a stand-in would wrongly gate out reddit-class winners
        # whose 10x dedup is exactly what makes them fit
        r2048 = gather_rows_2048
        # static residency: f32 features + f32 output (+ bf16 feature
        # copy when the variant downcasts storage)
        static_f32 = 2 * n * d * 4

        def chunk_options(rows, plan_bytes, fdtype):
            """[None] / [c, 2c] stream_chunks choices that fit, else []."""
            esz = 2 if fdtype else 4
            free = (
                budget - static_f32 - (n * d * 2 if fdtype else 0)
                - plan_bytes
            )
            if free <= 2**28:
                return []
            full = rows * d * esz
            if full <= 0.6 * free:
                # full gather fits: race unstreamed vs a lightly-chunked
                # variant (chunking also shrinks XLA temp peaks)
                return [None, 16]
            # two chunks alive in the pipeline; cap one chunk at 1 GB
            target = min(free / 3, 2**30)
            c = 16
            while c < 1024 and full / c > target:
                c *= 2
            if full / c > target:
                return []
            return [c, min(2 * c, 1024)]

        space = []
        geometries = [
            # (block_h, rows_h estimate, subtile, gather_segment)
            (128, nnz, False, 1),  # ~no dedup at short windows
            (512, r512, False, 1),
            # h512 clustered-subtile: products-class graphs dedup to
            # ~0.35 rows/nnz at h512 with sub-window occupancy ~0.38 —
            # 35% less gather than h128 AND 62% of sub-products skipped,
            # at 1/3 the bitmask bytes of h2048
            (512, r512, True, 1),
            # tall clustered-subtile (unlocked by the native clustering
            # pass): community graphs dedup to ~0.1 rows/nnz at h2048
            # and skip ~72% of sub-tiles — 100.65 ms on reddit-proxy
            # d256 vs the fused kernel's 153.9 ms masked-dense floor
            (2048, r2048, True, 1),
        ]
        # packed gather (seg=q pregather): the v5e gather law is
        # per-ROW up to ~1-2 KB rows, so fetching one (q*d)-wide
        # super-row per q-aligned run cuts gather rows ~q/ratio while
        # the kernel pays `ratio` more covered slots. Huge-regime
        # candidates cost minutes to build+race, so the TIGHT gate
        # applies (reddit-proxy measured a net loss at ratio 1.47:
        # kernel +65% > gather -12%)
        from ..format.preprocess import PACK_RATIO_THRESHOLD_HUGE

        # packed candidates use the INTERLEAVED layout only at this
        # scale: the run-major flatten rewrites the whole gathered
        # array (~28 ms at reddit-proxy volumes) and is strictly
        # dominated (bench/exp_split_rmat17.txt)
        # round-5 width gate (exp_frontier_rmat-17.txt): the fetch rate
        # collapses past ~512 B rows, so packed candidates only join
        # while the q-super-row stays in the fast regime (bf16 storage
        # is the huge-regime default -> 2 bytes/lane)
        if (
            r2048 is not None
            and pack_ratio2 is not None
            and pack_ratio2 <= PACK_RATIO_THRESHOLD_HUGE
            and (d or 0) * 2 * 2 <= 512
        ):
            geometries.append((2048, int(r2048 * pack_ratio2), True, 2))
        if (
            r2048 is not None
            and pack_ratio4 is not None
            and pack_ratio4 <= PACK_RATIO_THRESHOLD_HUGE
            and (d or 0) * 4 * 2 <= 512
        ):
            geometries.append((2048, int(r2048 * pack_ratio4), True, 4))
        for h, rows_h, sub, seg in geometries:
            # bf16 storage is the huge-regime default (2.2-3.9x faster
            # gather, half the chunk residency); accurate=True keeps f32
            fdtype = None if accurate else "bfloat16"
            if rows_h is None:  # unmeasured dedup: offer optimistically
                opts = [None, 16]
            else:
                plan_bytes = rows_h * h / 8 + rows_h * 4  # bitmask + hind
                opts = chunk_options(rows_h, plan_bytes, fdtype)
            for c in opts:
                space.append(
                    Variant(
                        "pregather", block_h=h, block_unroll=4,
                        subtile=sub, stream_chunks=c,
                        feat_dtype=fdtype, gather_segment=seg,
                        ipack=seg > 1,
                    )
                )
        # density-split hybrid (round 5): >= q/2-full (window, q-run)
        # groups fetched as ONE (q*d)-wide super-row (interleaved, no
        # flatten), exact lanes for the scattered tail — cuts per-row
        # gather cost ~2.4x on reddit-class graphs at bounded slot
        # inflation (census: format.density_split_stats docstring).
        # Two dispatches, both clustered-subtile pregather; unroll 8 so
        # the q=8 interleave keeps whole-block j-planes.
        if (
            split_rows8 is not None
            and split_rows8 <= 0.75
            and (split_slots8 or 99.0) <= 1.35
            and (d or 0) * 8 * 2 <= 512  # fast-fetch width gate
        ):
            space.append(
                Variant(
                    "hybrid", block_h=2048, gather_segment=8,
                    block_unroll=8, subtile=True,
                    hybrid_dense="pregather", ipack=True,
                    feat_dtype=None if accurate else "bfloat16",
                )
            )
        # edge-per-lane (O(nnz) plan bytes, no bitmask): the scattered
        # ultra-sparse regime where even the h128 binned plan is heavy
        ell_rows = int(nnz * 1.05) if nnz else 0
        for fdtype in ([None] if accurate else ["bfloat16"]):
            for c in chunk_options(ell_rows, ell_rows * 12, fdtype):
                space.append(
                    Variant(
                        "ell", block_h=128, block_unroll=4,
                        stream_chunks=c, feat_dtype=fdtype,
                    )
                )
        if coverage128 is not None and coverage128 <= FUSED_COVERAGE_THRESHOLD:
            # fused streams X straight through VMEM — no materialized
            # gather, so it fits where pregather needs chunking (its
            # coverage plan is seg-run aligned: rows ~ cov128 * nnz)
            if chunk_options(0, (coverage128 * nnz) * 256, None):
                space.append(
                    Variant(
                        "fused", block_h=2048, gather_segment=128,
                        block_unroll=4,
                    )
                )
                if not accurate:
                    space.append(
                        Variant(
                            "fused", block_h=2048, gather_segment=128,
                            block_unroll=4, compute_dtype="bfloat16",
                        )
                    )
        return space
    space = [
        Variant("pregather", block_h=512, block_unroll=4),
        Variant("pregather", block_h=1024, block_unroll=4),
        Variant("pregather", block_h=2048, block_unroll=4),
        Variant("pregather", block_h=1024, block_unroll=4, subtile=True),
        Variant("pregather", block_h=2048, block_unroll=4, subtile=True),
        Variant("hybrid", block_h=128, gather_segment=8),
    ]
    # packed gather (seg=q pregather, clustered-subtile): one
    # (q*d)-wide super-row per q-aligned lane run — the v5e gather law
    # is per-ROW up to ~1-2 KB rows, so when run coverage is tight
    # (pack_ratio <= threshold) the gather gets ~q/ratio faster while
    # the kernel pays `ratio` more covered slots
    from ..format.preprocess import PACK_RATIO_THRESHOLD

    _esz = 2 if not accurate else 4
    # round-5 width gate: the v5e fetch rate COLLAPSES past ~512 B rows
    # (2x width measured 4x slower per row, exp_frontier_rmat-17.txt),
    # so packed q-runs only pay while the super-row stays in the fast
    # width regime — q*d*esz <= 512 B (d <= 128 bf16 at q2)
    _packed = []
    if (
        pack_ratio2 is not None
        and pack_ratio2 <= PACK_RATIO_THRESHOLD
        and (d or 0) * 2 * _esz <= 512
    ):
        _packed.append(2)
    if (
        pack_ratio4 is not None
        and pack_ratio4 <= PACK_RATIO_THRESHOLD
        and (d or 0) * 4 * _esz <= 512
    ):
        _packed.append(4)
    for _q in _packed:
        space.append(
            Variant(
                "pregather", block_h=2048, block_unroll=4,
                subtile=True, gather_segment=_q,
                feat_dtype=None if accurate else "bfloat16",
            )
        )
        # interleaved twin: same gather volume, no flatten copy
        space.append(
            Variant(
                "pregather", block_h=2048, block_unroll=4,
                subtile=True, gather_segment=_q, ipack=True,
                feat_dtype=None if accurate else "bfloat16",
            )
        )
    # density-split hybrid (round 5, see the huge-branch twin): packed
    # super-rows for dense q-runs (interleaved) + exact tail, no
    # all-or-nothing pack_ratio gate — the split bounds waste per
    # group by design. Width-gated like the packed candidates: the q=8
    # super-row must stay under the ~512 B fast-fetch regime
    if (
        split_rows8 is not None
        and split_rows8 <= 0.75
        and (split_slots8 or 99.0) <= 1.35
        and (d or 0) * 8 * _esz <= 512
    ):
        space.append(
            Variant(
                "hybrid", block_h=2048, gather_segment=8,
                block_unroll=8, subtile=True, hybrid_dense="pregather",
                ipack=True,
                feat_dtype=None if accurate else "bfloat16",
            )
        )
    fused_ok = coverage128 is None or coverage128 <= FUSED_COVERAGE_THRESHOLD
    if fused_ok:
        space.append(Variant("fused", block_h=2048, gather_segment=128, block_unroll=4))
    elif coverage32 is not None and coverage32 <= FUSED_COVERAGE_THRESHOLD:
        # mid-locality regime: 128-row runs too wasteful but 32-row runs
        # still cover cheaply (e.g. RCM-ordered community graphs)
        space.append(
            Variant("fused", block_h=2048, gather_segment=32, block_unroll=4)
        )
    if not accurate:
        # bf16 *storage* for the gathered rows (f32 accumulation) halves
        # gather volume; bf16 MXU compute_dtype measured strictly worse
        # (the in-kernel mask/stream conversions cost more than they save)
        space += [
            Variant(
                "pregather",
                block_h=2048,
                block_unroll=4,
                feat_dtype="bfloat16",
            ),
            Variant(
                "pregather",
                block_h=2048,
                block_unroll=4,
                subtile=True,
                feat_dtype="bfloat16",
            ),
        ]
        if fused_ok:
            # halves the in-kernel DMA stream (the dominant cost of the
            # fused path); measured 1.3x on er-8k d256, and the winner
            # at d512/d1024 (0.413/0.834 ms vs pregather 0.527/1.003)
            space.append(
                Variant(
                    "fused",
                    block_h=2048,
                    gather_segment=128,
                    block_unroll=4,
                    compute_dtype="bfloat16",
                )
            )
            # deeper pipeline (reference NUM_BUFFERS=4 class): one more
            # group of gathered data in flight
            space.append(
                Variant(
                    "fused",
                    block_h=2048,
                    gather_segment=128,
                    block_unroll=4,
                    compute_dtype="bfloat16",
                    slots=3,
                )
            )
    return space


@dataclass
class TunedSpmm:
    """Best (plan, kernel, ordering) for one matrix — call it like `spmm`.

    When an ordering other than "identity" won, `perm`/`inv_perm` hold
    the row permutation and `__call__` applies it transparently:
    out = (A x) reconstructed from spmm(A_perm, x[perm])[inv_perm]."""

    plan: SpmmPlan
    variant: Variant
    time_ms: float
    candidates: dict = field(default_factory=dict)
    ordering: str = "identity"
    perm: object = None  # int32 (N,) device array, None for identity
    inv_perm: object = None

    def __call__(self, feat):
        return _run_variant(
            self.variant, self.plan, feat, self.perm, self.inv_perm
        )


_REORDER_FNS = None


def _reorder(name: str, indptr, indices, num_nodes: int, values=None):
    """Returns (indptr2, indices2, values2|None, perm|None) for a named
    ordering; per-edge values ride along through the permutation."""
    global _REORDER_FNS
    if _REORDER_FNS is None:
        from ..data.generate import reorder_degree, reorder_rcm

        _REORDER_FNS = {"rcm": reorder_rcm, "degree": reorder_degree}
    if name == "identity":
        return indptr, indices, values, None
    import scipy.sparse as sp

    data = (
        np.ones(np.asarray(indices).shape[0], np.float32)
        if values is None
        else np.asarray(values, np.float32)
    )
    a = sp.csr_matrix(
        (data, np.asarray(indices), np.asarray(indptr)),
        shape=(num_nodes, num_nodes),
    )
    a2, perm = _REORDER_FNS[name](a)
    vals2 = None if values is None else a2.data
    return a2.indptr, a2.indices, vals2, np.asarray(perm, np.int32)


def _variant_plan_key(variant: Variant):
    """Plan-sharing key: variants that differ only in runtime knobs
    (compute dtype, feature chunk, ...) share one built plan."""
    cfg = variant.plan_config
    if variant.impl == "ell":
        return ("ell", cfg, variant.stream_chunks)
    if variant.impl == "weighted":
        return ("weighted", cfg)
    if variant.impl == "hybrid":
        return ("hybrid", cfg, variant.threshold)
    if variant.stream_chunks:
        return (cfg, variant.stream_chunks)
    return (cfg,)


def build_variant_plan(
    variant: Variant,
    indptr,
    indices,
    num_nodes: int,
    values,
    backend: str = "auto",
    weighted: bool | None = None,
):
    """Build this variant's DEVICE-resident plan (list for streamed
    variants). Shared by the in-process tuner and the isolated probe
    subprocess (tuner/probe.py)."""
    cfg = variant.plan_config
    if weighted is None:
        weighted = values is not None
    if weighted and variant.impl not in ("ell", "weighted"):
        # a binary variant would tune (and win with) the WRONG result —
        # same discipline as the kernel-level guards
        raise ValueError(
            f"variant {variant.key()} is binary; weighted tuning "
            "accepts impl='ell' or impl='weighted' only"
        )
    if variant.impl == "ell":
        from ..format.ell import csr_preprocess_ell, slice_ell_windows

        base = csr_preprocess_ell(
            indptr, indices, num_nodes, cfg, values=values
        )
        return (
            [
                s.device()
                for s in slice_ell_windows(base, variant.stream_chunks)
            ]
            if variant.stream_chunks
            else base.device()
        )
    if variant.impl == "weighted":
        return csr_preprocess(
            indptr, indices, num_nodes, cfg, values=values
        ).device()
    if variant.impl == "hybrid":
        from ..format.hybrid import csr_preprocess_hybrid

        hp = csr_preprocess_hybrid(
            indptr,
            indices,
            num_nodes,
            dense_config=cfg,
            threshold=variant.threshold,
            backend=backend,
        )
        return HybridPlan(
            hp.dense.device(), hp.sparse.device(),
            hp.num_nodes, hp.num_edges,
        )
    if variant.stream_chunks:
        from ..format.stream import slice_plan_windows

        base = csr_preprocess(
            indptr, indices, num_nodes, cfg, backend=backend
        )
        return [
            s.device()
            for s in slice_plan_windows(base, variant.stream_chunks)
        ]
    return csr_preprocess(
        indptr, indices, num_nodes, cfg, backend=backend
    ).device()


def _run_variant(variant: Variant, plan, feat, perm=None, inv_perm=None):
    import jax.numpy as jnp

    from ..ops import (
        spmm_pallas,
        spmm_pallas_fused,
        spmm_pallas_hybrid,
        spmm_pallas_int8,
    )

    out_dtype = feat.dtype
    if variant.feat_dtype is not None:
        # thinner gathered rows; f32 accumulation restores the output type
        feat = feat.astype(jnp.dtype(variant.feat_dtype))
    if perm is not None:
        feat = jnp.take(feat, perm, axis=0, mode="clip")
    kwargs = dict(
        block_d=variant.block_d,
        compute_dtype=jnp.dtype(variant.compute_dtype),
        precision=variant.precision,
        # kernels accumulate f32 and emit out_dtype directly: a bf16
        # feat_dtype variant would otherwise truncate the accumulators
        # through a bf16 round-trip (headline diff 2.8e-6 -> 1.4e-6;
        # time-neutral, XLA fuses the cast pair)
        out_dtype=out_dtype,
    )
    if variant.impl == "fused":
        if variant.slots:
            kwargs["slots"] = variant.slots
        out = spmm_pallas_fused(plan, feat, **kwargs)
    elif variant.impl == "hybrid":
        out = spmm_pallas_hybrid(
            plan, feat, dense_impl=variant.hybrid_dense,
            subtile=variant.subtile, **kwargs,
        )
    elif variant.impl == "int8":
        out = spmm_pallas_int8(plan, feat, block_d=variant.block_d)
    elif variant.impl == "ell":
        from ..ops import spmm_ell, spmm_ell_streamed

        if variant.stream_chunks:
            out = spmm_ell_streamed(
                plan, feat, num_chunks=variant.stream_chunks, **kwargs
            )
        else:
            out = spmm_ell(plan, feat, **kwargs)
    elif variant.impl == "weighted":
        from ..ops import spmm_pallas_weighted

        out = spmm_pallas_weighted(plan, feat, block_d=variant.block_d,
                                   precision=variant.precision)
    elif variant.stream_chunks:
        from ..ops import spmm_streamed

        assert variant.impl == "pregather", variant.impl
        out = spmm_streamed(
            plan, feat, num_chunks=variant.stream_chunks,
            subtile=variant.subtile, **kwargs,
        )
    else:
        assert variant.impl == "pregather", variant.impl
        out = spmm_pallas(plan, feat, subtile=variant.subtile, **kwargs)
    if inv_perm is not None:
        out = jnp.take(out, inv_perm, axis=0, mode="clip")
    return out.astype(out_dtype)


_SAMPLE = 8192
_warned_no_tag = False


def _matrix_hash(indptr, indices, num_nodes: int) -> str:
    """Strided-SAMPLE content hash: O(1) work regardless of nnz.

    Hashing the full arrays cost a ~200 MB md5 on every call at rmat-19
    scale. Sampling is safe here because a hash collision can only pick
    a possibly-suboptimal cached *variant* — the plan is always rebuilt
    from the actual matrix, so results stay correct. Callers who want
    zero hashing pass `hash_tag` (reference protocol,
    jit_kernels/spmm.py:17-36)."""
    md5 = hashlib.md5()
    md5.update(
        np.asarray(
            [num_nodes, len(indptr), len(indices)], dtype=np.int64
        ).tobytes()
    )
    for arr in (indptr, indices):
        arr = np.ascontiguousarray(arr)
        step = max(1, arr.shape[0] // _SAMPLE)
        md5.update(arr[::step][:_SAMPLE].tobytes())
        md5.update(arr[-16:].tobytes())
    return md5.hexdigest()[:16]


def _values_hash(values) -> str:
    """Strided-sample hash of the per-edge value contents (same O(1)
    scheme as `_matrix_hash`). Used ONLY for the in-memory tune cache:
    a cached TunedSpmm embeds its value plane, so two same-structure
    tunes with different values must not share a memory entry."""
    values = np.ascontiguousarray(values)
    md5 = hashlib.md5()
    md5.update(np.int64(values.shape[0]).tobytes())
    step = max(1, values.shape[0] // _SAMPLE)
    md5.update(values[::step][:_SAMPLE].tobytes())
    md5.update(values[-16:].tobytes())
    return md5.hexdigest()[:16]


_CODE_VERSION = None


def _code_version() -> str:
    """Hash of the kernel/tuner sources so cache entries invalidate on
    code change (reference compiler.py:45-59 get_repo_version).

    Pinned at FIRST call for the process lifetime: a long-running tune
    whose sources are edited on disk mid-run must keep writing cache
    entries under the hash of the code it actually imported — hashing
    the files at every call made such a process write stale winners
    under the NEW hash (observed round 4: a later run disk-hit them)."""
    global _CODE_VERSION
    if _CODE_VERSION is None:
        root = os.path.dirname(os.path.dirname(__file__))
        md5 = hashlib.md5()
        for rel in ("ops", "format", "tuner"):
            d = os.path.join(root, rel)
            for fname in sorted(os.listdir(d)):
                if fname.endswith(".py"):
                    with open(os.path.join(d, fname), "rb") as f:
                        md5.update(f.read())
        _CODE_VERSION = md5.hexdigest()[:12]
    return _CODE_VERSION


def _device_reachable(timeout_s: float = 90.0) -> bool:
    """True when a FRESH subprocess can run one tiny op on this host's
    default backend. Used after a double probe timeout to distinguish a
    relay outage (don't persist: candidate deserves a later re-time)
    from a candidate whose device program genuinely hangs (persist inf
    so resumed races skip it)."""
    import subprocess
    import sys as _sys

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((8, 128), jnp.float32);"
        "(x @ x.T).block_until_ready();"
        "print('reachable')"
    )
    try:
        r = subprocess.run(
            [_sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and "reachable" in (r.stdout or "")


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
        reorderings: tuple[str, ...] = ("identity",),
        budget_s: float | None = None,
        parallel_compile: bool = False,
        values=None,
        isolate: bool | None = None,
        probe_timeout_s: float = 900.0,
    ) -> TunedSpmm:
        """Pick the fastest (variant, ordering) for this (matrix,
        feature-shape) pair.

        isolate: time each candidate in its OWN subprocess
        (tuner/probe.py). None (default) auto-enables past ~4 GB of
        f32 edge-feature volume: racing huge candidates in one process
        poisons the device session (measured kept-buffer inflation +
        fragmentation OOMs at products scale). The reference's tuner
        has the same architecture — one nvcc/ctypes subprocess per
        candidate, validity by return code (jit_kernels/tuner.py:
        84-116).

        `feat` is a representative feature array (shape/dtype matter).
        reorderings: orderings to race by MEASURED time (e.g.
        ("identity", "rcm", "degree")); a non-identity winner is applied
        transparently inside the returned TunedSpmm (input rows permuted,
        output rows restored). Gather-volume proxies provably misrank
        orderings, so this is the honest selector.

        values: per-edge weights. When given, the space switches to the
        weighted kernels (impl "ell"/"weighted" — binary variants are
        rejected as invalid), plans carry the values (riding through any
        reordering), and the cache signature gets a ".w" marker. Two
        different value vectors on the same sparsity pattern share a
        cache entry by design: values change numerics, not kernel
        choice.

        budget_s: soft tuning-time budget in seconds (default from
        $VOLTRIX_TPU_TUNE_BUDGET_S); once exceeded, remaining candidates
        are skipped and the best-so-far wins. parallel_compile overlaps
        candidate compilation (background threads) with on-device
        timing — the reference builds all candidates concurrently
        (jit_kernels/tuner.py:84-102). Default off: measured on the
        axon-relayed v5e, concurrent compile POSTs contend and a 5-way
        cold tune took 123 s parallel vs 28 s serial; enable it on
        hosts with a local compiler."""
        import time

        import jax.numpy as jnp

        def build_default_space():
            # O(nnz log nnz) host passes — only on a genuine cache miss
            # (a warm-cache call must stay O(1); the space is unused on
            # memory/disk hits)
            from ..format.preprocess import (
                coverage_expansion,
                density_split_stats,
                pack_ratios,
            )

            nnz = len(indices)
            if values is not None:
                # expanded slots/edge of an h128 dense value plane gates
                # the dense "weighted" candidate
                slots = (
                    coverage_expansion(indptr, indices, num_nodes, 128, 1)
                    * 128
                )
                return weighted_default_space(
                    d=int(feat.shape[1]), nnz=nnz, dense_slots_per_nnz=slots
                )
            cov128 = coverage_expansion(indptr, indices, num_nodes, 2048, 128)
            cov32 = (
                coverage_expansion(indptr, indices, num_nodes, 2048, 32)
                if cov128 > FUSED_COVERAGE_THRESHOLD
                else None
            )
            # deduped h512-window gather rows: the honest size estimate
            # for the huge-graph gate (raw nnz overcounts by the dedup
            # factor on anything with shared neighbors)
            rows512 = int(
                coverage_expansion(indptr, indices, num_nodes, 512, 1) * nnz
            )
            d_ = int(feat.shape[1])
            # one sort gives the h2048 seg=1 dedup AND the packed-run
            # (seg=2/4) lane inflation ratios that gate the packed-
            # gather candidates
            lanes2048, ratios = pack_ratios(
                indptr, indices, num_nodes, 2048, qs=(2, 4)
            )
            rows2048 = (
                lanes2048
                # h2048 dedup matters only to the huge branch's memory gates
                if rows512 * d_ * 4 > 4 * 2**30
                else None
            )
            sr8, ss8 = density_split_stats(indptr, indices, num_nodes, 2048, 8)
            return default_space(
                d=d_,
                nnz=nnz,
                coverage128=cov128,
                coverage32=cov32,
                gather_rows=rows512,
                num_nodes=num_nodes,
                gather_rows_2048=rows2048,
                pack_ratio2=ratios.get(2),
                pack_ratio4=ratios.get(4),
                split_rows8=sr8,
                split_slots8=ss8,
            )

        verbose = env_flag(const.PRINT_AUTOTUNE_FLAG)
        if budget_s is None:
            env = os.environ.get(const.TUNE_BUDGET_FLAG, "")
            budget_s = float(env) if env else None

        if hash_tag is None and len(indices) >= 1 << 20:
            global _warned_no_tag
            if not _warned_no_tag:
                _warned_no_tag = True
                import logging

                logging.getLogger("voltrix_tpu").warning(
                    "tune_spmm: no hash_tag given for a %d-nnz matrix; "
                    "falling back to a sampled content hash. Pass "
                    "hash_tag= for exact cache identity (reference "
                    "protocol, jit_kernels/spmm.py:31-36).",
                    len(indices),
                )
        tag = hash_tag or _matrix_hash(indptr, indices, num_nodes)
        wmark = ".w" if values is not None else ""
        # An EXPLICIT space is part of the cache identity: without it,
        # a caller adding candidates to `space=` silently gets the old
        # winner back from disk and the new candidates never race
        # (observed with bench.py's headline space). The default space
        # stays un-hashed on purpose — it is built lazily only on a
        # miss, so hashing it would force the O(nnz log nnz) host
        # passes on every warm call; code changes to the default space
        # invalidate via `_code_version()` instead.
        smark = ""
        if space is not None:
            md5 = hashlib.md5(
                "|".join(sorted(v.key() for v in space)).encode()
            )
            smark = f".s{md5.hexdigest()[:8]}"
        signature = (
            f"{tag}.n{num_nodes}.d{feat.shape[1]}.{np.dtype(feat.dtype).name}"
            f"{wmark}{smark}.{_code_version()}"
        )
        # The DISK key excludes the value contents on purpose (the
        # recorded winner is structure-only; the plan is rebuilt from the
        # caller's values on every disk hit). The MEMORY key must NOT:
        # a cached TunedSpmm embeds the value plane, so a same-structure
        # call with different values would silently compute with stale
        # weights. Sampled hash keeps this O(1) in nnz.
        mem_key = (
            signature
            if values is None
            else f"{signature}.v{_values_hash(values)}"
        )

        if mem_key in self._mem:
            if verbose:
                print(f"voltrix_tpu tune: memory hit for {signature}")
            return self._mem[mem_key]

        plans: dict = {}
        csrs: dict = {"identity": (indptr, indices, values, None)}

        def csr_for(ordering: str):
            if ordering not in csrs:
                csrs[ordering] = _reorder(
                    ordering, indptr, indices, num_nodes, values
                )
            return csrs[ordering]

        def plan_for_variant(variant: Variant, ordering: str = "identity"):
            ptr, idx, vals, _ = csr_for(ordering)
            key = (ordering,) + _variant_plan_key(variant)
            if key not in plans:
                plans[key] = build_variant_plan(
                    variant, ptr, idx, num_nodes, vals, backend,
                    weighted=values is not None,
                )
            return plans[key]

        def perm_arrays(ordering: str):
            import jax.numpy as jnp

            perm = csr_for(ordering)[3]
            if perm is None:
                return None, None
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.shape[0], dtype=np.int32)
            return jnp.asarray(perm), jnp.asarray(inv)

        # on-disk hit: re-instantiate the recorded winner (plan rebuilt
        # from the matrix; cheap relative to tuning every variant)
        disk = self._disk_path(signature)
        if os.path.exists(disk):
            with open(disk) as f:
                entry = json.load(f)
            variant = Variant(**entry["variant"])
            ordering = entry.get("ordering", "identity")
            perm, inv_perm = perm_arrays(ordering)
            tuned = TunedSpmm(
                plan=plan_for_variant(variant, ordering),
                variant=variant,
                time_ms=entry["time_ms"],
                candidates=entry.get("candidates", {}),
                ordering=ordering,
                perm=perm,
                inv_perm=inv_perm,
            )
            self._mem[mem_key] = tuned
            if verbose:
                print(f"voltrix_tpu tune: disk hit for {signature}: {variant.key()}")
            return tuned

        if space is None:
            space = build_default_space()
        if isolate is None:
            isolate = len(indices) * int(feat.shape[1]) * 4 > 4 * 2**30
        feat_shape_d = int(feat.shape[1])
        feat_dtype_name = np.dtype(feat.dtype).name
        if not isolate:
            feat = jnp.asarray(feat)
        results: dict[str, float] = {}
        best = None  # (time, variant, plan, ordering, perm, inv_perm)
        t_begin = time.perf_counter()

        # stage 1: build plans + launch candidate compiles in the
        # background; stage 2: time serially (the device is exclusive)
        # while later compiles still make progress.
        from concurrent.futures import ThreadPoolExecutor

        from ..utils import device_loop_prepare

        def plan_key(variant: Variant, ordering: str):
            return (ordering,) + _variant_plan_key(variant)

        def make_runner(variant, plan, perm, inv_perm):
            if perm is None:
                return (lambda c, p, v=variant: _run_variant(v, p, c)), (plan,)
            return (
                lambda c, p, pe, ip, v=variant: _run_variant(v, p, c, pe, ip),
                (plan, perm, inv_perm),
            )

        candidates = [
            (f"{o}|{v.key()}", v, o) for o in reorderings for v in space
        ]

        # Partial-race resume: a relay drop / attempt timeout used to
        # lose every timed candidate (the disk entry is written only
        # after a FULL race — BENCH_r03 died this way). Persist each
        # candidate's time as it lands; the next race with the same
        # signature prefills and re-times only what's missing.
        partial = disk + ".partial"
        # Probe TIMEOUTS never enter the sidecar: an orphaned relay RPC
        # (the relay drops ~10-20 min at a time and an in-flight call
        # never returns) says nothing about the candidate, and a
        # persisted inf would permanently exclude a potential winner
        # from every resumed race with this signature.
        timeout_keys: set[str] = set()

        def save_partial():
            os.makedirs(self.cache_dir(), exist_ok=True)
            tmp = partial + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "results": {
                            k: v
                            for k, v in results.items()
                            if k not in timeout_keys
                        }
                    },
                    f,
                )
            os.replace(tmp, partial)

        if os.path.exists(partial):
            try:
                with open(partial) as f:
                    prior = json.load(f).get("results", {})
            except ValueError:
                prior = {}
            for key, variant, ordering in candidates:
                if key in prior:
                    results[key] = float(prior[key])
                    t = results[key]
                    if t != float("inf") and (best is None or t < best[0]):
                        # plan=None: rebuilt for the winner at the end
                        best = (t, variant, None, ordering, None, None)
            if results and verbose:
                print(
                    f"voltrix_tpu tune: resumed {len(results)} candidate "
                    f"time(s) from a partial race"
                )

        probe_state = {"csr": None}

        def probe_candidate(variant: Variant, ordering: str):
            """One isolated probe run -> (ms | inf, error|None)."""
            import subprocess
            import sys as _sys
            import tempfile

            if probe_state["csr"] is None:
                f = tempfile.NamedTemporaryFile(
                    prefix="voltrix_probe_csr_", suffix=".npz", delete=False
                )
                arrs = {
                    "indptr": np.asarray(indptr),
                    "indices": np.asarray(indices),
                }
                if values is not None:
                    arrs["values"] = np.asarray(values, np.float32)
                np.savez(f, **arrs)
                f.close()
                probe_state["csr"] = f.name
            spec = {
                "csr": probe_state["csr"],
                "num_nodes": num_nodes,
                "d": feat_shape_d,
                "feat_dtype": feat_dtype_name,
                "variant": dataclasses.asdict(variant),
                "ordering": ordering,
                "iters": iters,
                "backend": backend,
            }
            sf = tempfile.NamedTemporaryFile(
                "w", prefix="voltrix_probe_", suffix=".json", delete=False
            )
            json.dump(spec, sf)
            sf.close()
            import voltrix_spmm_tpu as _pkg

            env = dict(os.environ)
            pkg_parent = os.path.dirname(
                os.path.dirname(os.path.abspath(_pkg.__file__))
            )
            env["PYTHONPATH"] = (
                pkg_parent + os.pathsep + env.get("PYTHONPATH", "")
            )
            # Pin the probe to the PARENT's backend. On this box a
            # sitecustomize hook registers the TPU-relay PJRT plugin in
            # every python process whenever PALLAS_AXON_POOL_IPS is set,
            # and that registration OVERRIDES JAX_PLATFORMS=cpu
            # (measured: probe startup 73 s on the relay vs 1.9 s on
            # CPU; unbounded when the relay is down). A CPU-suite tuner
            # must never have its probes silently dial the relay.
            import jax as _jax

            if _jax.default_backend() == "cpu":
                env.pop("PALLAS_AXON_POOL_IPS", None)
                env["JAX_PLATFORMS"] = "cpu"
            try:
                r = subprocess.run(
                    [
                        _sys.executable,
                        "-m",
                        "voltrix_spmm_tpu.tuner.probe",
                        sf.name,
                    ],
                    capture_output=True,
                    text=True,
                    timeout=probe_timeout_s,
                    env=env,
                )
            except subprocess.TimeoutExpired:
                return float("inf"), f"timeout after {probe_timeout_s:.0f}s"
            for line in reversed((r.stdout or "").strip().splitlines()):
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    out = json.loads(line)
                except ValueError:
                    continue
                if out.get("ok"):
                    return float(out["time_ms"]), None
                return float("inf"), out.get("error", "probe failed")
            return float("inf"), (r.stderr or "no output")[-300:]

        pool = (
            ThreadPoolExecutor(max_workers=4)
            if parallel_compile and not isolate
            else None
        )
        futs: dict[str, object] = {}
        try:
            if pool is not None:
                # compile-ahead needs every plan resident up front —
                # only worthwhile on hosts with a local compiler
                for key, variant, ordering in candidates:
                    if key in results:  # prefilled from a partial race
                        continue
                    try:
                        plan = plan_for_variant(variant, ordering)
                        fn, fargs = make_runner(
                            variant, plan, *perm_arrays(ordering)
                        )
                        futs[key] = pool.submit(
                            device_loop_prepare, fn, feat, *fargs
                        )
                    except Exception as e:
                        if verbose:
                            print(f"voltrix_tpu tune: {key} invalid: {e}")
                        results[key] = float("inf")

            skipped = 0
            for i, (key, variant, ordering) in enumerate(candidates):
                if key in results:  # failed at compile-ahead / prefilled
                    continue
                if (
                    budget_s is not None
                    and best is not None
                    and time.perf_counter() - t_begin > budget_s
                ):
                    skipped += 1
                    if key in futs:
                        futs[key].cancel()
                    continue
                if isolate:
                    t, err = probe_candidate(variant, ordering)
                    if err and err.startswith("timeout"):
                        # retry once: a relay blip and a genuinely
                        # hanging candidate look identical on the first
                        # timeout; only the second one is believed
                        t, err = probe_candidate(variant, ordering)
                    if err and err.startswith("timeout"):
                        # double timeout: if the device is reachable the
                        # candidate itself hangs -> persist inf so
                        # resumed races skip it; if the relay is down,
                        # keep it out of the sidecar for a later re-time
                        if not _device_reachable():
                            timeout_keys.add(key)
                    results[key] = t
                    save_partial()
                    if verbose:
                        tail = f" ({err})" if err else ""
                        print(
                            f"voltrix_tpu tune: {key} -> {t:.3f} ms "
                            f"[probe]{tail}"
                        )
                    if t != float("inf") and (best is None or t < best[0]):
                        best = (t, variant, None, ordering, None, None)
                    continue
                pk = plan_key(variant, ordering)
                try:
                    # lazy plan build in serial mode: only this candidate's
                    # plan is device-resident (huge-graph tunes OOM'd when
                    # every candidate's plan was staged up front)
                    plan = plan_for_variant(variant, ordering)
                    fn, fargs = make_runner(
                        variant, plan, *perm_arrays(ordering)
                    )
                    compiled = futs[key].result() if key in futs else None
                    # device_loop_bench auto-scales the loop window, so
                    # sub-ms candidates need no special re-timing
                    try:
                        t = device_loop_bench(
                            fn, feat, *fargs,
                            iters=iters, trials=2, compiled=compiled,
                        )
                    except Exception as loop_err:
                        if "RESOURCE_EXHAUSTED" not in str(loop_err):
                            raise
                        # the loop harness keeps output + chained carry
                        # + the loop double-buffer resident at once; at
                        # reddit/products scale a candidate can fit a
                        # single dispatch but not the loop. Re-time with
                        # the memory-lean blocking-trace harness instead
                        # of discarding a potentially winning candidate.
                        from ..utils import device_trace_bench

                        t = device_trace_bench(fn, feat, *fargs, iters=3)
                        if verbose:
                            print(
                                f"voltrix_tpu tune: {key} loop harness "
                                "OOM'd; timed via device_trace_bench"
                            )
                except Exception as e:  # invalid candidate -> skip, like
                    # the reference's return-code filter (tuner.py:108-116)
                    if verbose:
                        print(f"voltrix_tpu tune: {key} invalid: {e}")
                    results[key] = float("inf")
                    t = None
                if t is not None:
                    results[key] = t
                    if verbose:
                        print(f"voltrix_tpu tune: {key} -> {t:.3f} ms")
                    if best is None or t < best[0]:
                        best = (t, variant, plan, ordering, *perm_arrays(ordering))
                save_partial()
                # evict device plans no remaining candidate shares and the
                # current best does not own (multi-GB residency otherwise)
                if pool is None:
                    remaining = {
                        plan_key(v, o) for _, v, o in candidates[i + 1 :]
                    }
                    best_pk = (
                        plan_key(best[1], best[3]) if best is not None else None
                    )
                    for k in list(plans):
                        if k != best_pk and k not in remaining:
                            del plans[k]
            if skipped and verbose:
                print(
                    f"voltrix_tpu tune: budget {budget_s:.1f}s exhausted, "
                    f"skipped {skipped} candidate(s)"
                )
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
            if probe_state["csr"] is not None:
                try:
                    os.unlink(probe_state["csr"])
                except OSError:
                    pass

        assert best is not None, "no valid tuning candidate"
        if best[2] is None:
            # probes (and partial-race prefills) never ship plans back;
            # build the winner's once
            perm_w, inv_w = perm_arrays(best[3])
            best = (
                best[0],
                best[1],
                plan_for_variant(best[1], best[3]),
                best[3],
                perm_w,
                inv_w,
            )
        tuned = TunedSpmm(
            plan=best[2],
            variant=best[1],
            time_ms=best[0],
            candidates=results,
            ordering=best[3],
            perm=best[4],
            inv_perm=best[5],
        )
        self._mem[mem_key] = tuned

        os.makedirs(self.cache_dir(), exist_ok=True)
        tmp = disk + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "variant": dataclasses.asdict(best[1]),
                    "ordering": best[3],
                    "time_ms": best[0],
                    "candidates": results,
                },
                f,
                indent=2,
            )
        os.replace(tmp, disk)
        try:  # the race completed; the resume sidecar is now redundant
            os.unlink(partial)
        except OSError:
            pass
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


# Pin the code-version hash at import so it reflects the sources this
# process actually loaded (see _code_version docstring).
_code_version()
