#!/usr/bin/env python
"""Full benchmark sweep (reference: bench/bench_all.py).

Datasets x feature dims {256, 512, 1024} x methods, validated against
the scipy golden oracle, timed with the on-device loop harness, written
to results.csv in the same row protocol as the reference
(dataset, method, featdim, time_ms) for plot.py.

Usage: python bench/bench_all.py [--datasets ...] [--dims 256,512]
       [--methods ...] [--quick]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEAT_DIMS = [256, 512, 1024]  # reference bench_all.py:21


def methods_registry():
    import jax.numpy as jnp

    from voltrix_spmm_tpu.format import PlanConfig, csr_preprocess
    from voltrix_spmm_tpu.ops import spmm_pallas, spmm_pallas_fused
    from voltrix_spmm_tpu.ops.baselines import (
        make_bcoo_spmm,
        make_gather_segment_spmm,
    )
    from voltrix_spmm_tpu.tuner import tune_spmm

    # NOTE: each method returns (fn, plan); when plan is not None the
    # bench passes it to fn as a traced ARGUMENT — closing plans over
    # jit embeds them as constants and blows the remote-compile request
    # size (HTTP 413) on large graphs.
    def voltrix_tuned(a, feat, tag=None, seed_space=None):
        tuned = tune_spmm(
            a.indptr, a.indices, a.shape[0], feat, hash_tag=tag,
            space=seed_space,
        )
        from voltrix_spmm_tpu.tuner.tuner import _run_variant

        fn = lambda x, p, v=tuned.variant: _run_variant(v, p, x)  # noqa: E731
        fn.variant = tuned.variant  # for the per-cell floor column
        return fn, tuned.plan

    def voltrix_pregather(a, feat):
        plan = csr_preprocess(
            a.indptr, a.indices, a.shape[0],
            PlanConfig(1024, 128, 1, block_unroll=4),
        ).device()
        return (lambda x, p: spmm_pallas(p, x)), plan

    def voltrix_fused(a, feat):
        # the winning bulk-DMA config (one 128-row DMA per block) where
        # coverage allows; fall back to the exact-lane h128/s8 pipeline
        # on scattered graphs (coverage gate, see tuner.default_space)
        from voltrix_spmm_tpu.format.preprocess import fused_auto_config

        cfg = fused_auto_config(a.indptr, a.indices, a.shape[0])
        if cfg is None:
            cfg = PlanConfig(128, 128, 8)
        plan = csr_preprocess(a.indptr, a.indices, a.shape[0], cfg).device()
        return (lambda x, p: spmm_pallas_fused(p, x)), plan

    def csr_ell(a, feat):
        # hand-authored row-parallel CSR Pallas kernel (the GE-SpMM
        # role, reference bench/scripts/gespmm.cu:469-786): raw CSR
        # edges padded per window, no dedup/bitmask/coverage — the
        # control that shows the binned format (not merely "Pallas")
        # is the win. Streams window chunks when the gather is large,
        # so it also covers the d=1024 cells where BCOO compile-fails
        # and XLA-gather exceeds HBM.
        from voltrix_spmm_tpu.format.ell import (
            csr_preprocess_ell,
            slice_ell_windows,
        )
        from voltrix_spmm_tpu.ops import spmm_ell, spmm_ell_streamed

        cfg = PlanConfig(128, 128, block_unroll=4)
        plan = csr_preprocess_ell(a.indptr, a.indices, a.shape[0], cfg)
        gather_bytes = plan.gather_rows * feat.shape[1] * 4
        if gather_bytes > 2 * 2**30:
            # chunk count scaled so one chunk's f32 gather stays ~1 GB
            # (fixed 16 chunks OOM'd at ogbn-products scale: 133 GB
            # full gather / 16 = 8 GB chunks)
            chunks = max(16, -(-gather_bytes // 2**30))
            plans = [s.device() for s in slice_ell_windows(plan, chunks)]
            return (lambda x, p: spmm_ell_streamed(p, x)), plans
        return (lambda x, p: spmm_ell(p, x)), plan.device()

    def bcoo(a, feat):
        return make_bcoo_spmm(a), None

    def xla_gather(a, feat):
        # edge-parallel gather materializes (nnz, d) — skip when that
        # intermediate alone would exhaust HBM (observed at 4.1M x 512)
        if a.nnz * feat.shape[1] * 4 > 4 * 2**30:
            raise RuntimeError("skipped: (nnz, d) intermediate exceeds HBM budget")
        return make_gather_segment_spmm(a), None

    def dense(a, feat):
        # densified MXU matmul — the roofline reference (third
        # independent formulation next to BCOO and XLA-gather)
        from voltrix_spmm_tpu.ops.baselines import make_dense_spmm

        if a.shape[0] > 16384:
            raise RuntimeError("skipped: dense A exceeds HBM budget")
        return make_dense_spmm(a)  # (fn, dense-as-argument)

    return {
        "Voltrix": voltrix_tuned,  # autotuned (the headline method)
        "Voltrix-pregather": voltrix_pregather,
        "Voltrix-fused": voltrix_fused,
        "BCOO": bcoo,  # vendor sparse baseline (cuSPARSE role)
        "CSR-ELL": csr_ell,  # hand Pallas row-parallel CSR (GE-SpMM role)
        "XLA-gather": xla_gather,  # XLA gather+segment-sum baseline
        "Dense": dense,  # densified matmul (MXU roofline reference)
    }


def seeded_space(name: str, n: int, seed_dim: int, target_dim: int):
    """Trimmed tuning space for d != seed_dim cells: the disk-cached
    seed-dim winner plus its feature-dtype twin (and its neighbor
    stream-chunking when streamed). A full default-space race per
    (dataset, dim) costs ~an hour on the big proxies (isolated probes x
    1-core JAX cold starts); the winner GEOMETRY transfers across d —
    only the storage-dtype/chunking tradeoffs move with row width —
    so the transferred race keeps cells honest at ~3 candidates.
    Returns None (falls back to the full default space) when no
    seed-dim cache entry exists."""
    import dataclasses
    import glob
    import json

    from voltrix_spmm_tpu.tuner import Variant

    cache = os.environ.get(
        "VOLTRIX_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".voltrix_spmm_tpu", "cache"),
    )
    pats = glob.glob(
        os.path.join(
            cache, f"tune.{name}-sweep.n{n}.d{seed_dim}.float32.*.json"
        )
    )
    pats = [p for p in pats if not p.endswith(".partial")]
    if not pats:
        return None
    with open(max(pats, key=os.path.getmtime)) as f:
        entry = json.load(f)
    fields = {f.name for f in dataclasses.fields(Variant)}
    win = Variant(**{k: v for k, v in entry["variant"].items() if k in fields})
    space = [win]
    alt = "bfloat16" if win.feat_dtype is None else None
    if win.impl in ("pregather", "ell"):
        space.append(dataclasses.replace(win, feat_dtype=alt))
    if win.stream_chunks:
        # wider rows at the same chunk count double peak gather bytes;
        # offer the next chunking so the cell survives d512/d1024
        scale = max(1, target_dim // seed_dim)
        space.append(
            dataclasses.replace(
                win, stream_chunks=min(1024, win.stream_chunks * scale)
            )
        )
        space.append(
            dataclasses.replace(
                win,
                feat_dtype=alt,
                stream_chunks=min(1024, win.stream_chunks * scale),
            )
        )
    return space


def champion_space(d: int):
    """Curated regime-champion space for budget-bounded races whose
    seed-dim cache entry is gone (the session-3 VM rotation dropped the
    round-4 tune winners). A truncated DEFAULT-space race under
    VOLTRIX_TPU_BENCH_BUDGET_S measures the first ~2 gate-ordered
    candidates, and the gate order is not champion-first: the protein
    d256 race found its 3.3x winner (h2048 subtile) at candidate 7 of
    10. This space instead opens with the measured champions of both
    regimes (rounds 2-5, docs/RESULTS.md): tall clustered-subtile
    pregather for community/dense graphs (reddit 100.65 ms, protein
    75.8 ms) and short-window pregather for scattered power-law graphs
    (rmat-17 6.23 ms), plus streamed twins for d512/1024 residency and
    the coverage-gated fused bulk-DMA champion for uniform graphs.
    Invalid candidates (coverage gate, VMEM, HBM) are dropped by the
    tuner's validity filter as usual; the explicit space gets its own
    cache identity (tuner smark), so default-space entries are never
    polluted."""
    import dataclasses

    from voltrix_spmm_tpu.tuner import Variant

    tall = Variant(
        "pregather", block_h=2048, block_unroll=4, subtile=True,
        feat_dtype="bfloat16",
    )
    short = Variant(
        "pregather", block_h=128, block_unroll=4, feat_dtype="bfloat16"
    )
    space = [
        tall,
        short,
        dataclasses.replace(short, stream_chunks=64),
        dataclasses.replace(tall, stream_chunks=16),
        Variant(
            "pregather", block_h=512, block_unroll=4, subtile=True,
            feat_dtype="bfloat16",
        ),
        Variant("fused", block_h=2048, gather_segment=128, block_unroll=4),
    ]
    return space


def _cell_floor(plan, variant, n: int, d: int):
    """Per-cell speed-of-light in ms for THIS plan on a v5e, so 'fast'
    is auditable per grid cell (VERDICT r4 #7): overlapped max of the
    measured gather law — max(rows/175e6 row-issue, bytes_rw/340e9
    HBM) — and the MXU time over the plan's expanded block slots at
    ~197 TFLOPs bf16 (the floor model established in docs/RESULTS.md
    rounds 2-3). Streamed winners (list of window-slice plans) sum
    their slices; returns None only for shapes without block
    geometry."""
    sides = []  # (fetched_rows, streamed_lanes, expanded_slots)
    try:
        if isinstance(plan, (list, tuple)):  # streamed window slices
            for p in plan:
                lanes = int(p.gather_rows)
                q = int(p.config.gather_segment)
                sides.append(
                    (lanes // q if q > 1 else lanes, lanes,
                     lanes * int(p.config.block_h))
                )
        elif hasattr(plan, "dense") and hasattr(plan, "sparse"):  # hybrid
            q = plan.dense.config.gather_segment
            for p, qq in ((plan.dense, q), (plan.sparse, 1)):
                lanes = int(p.gather_rows)
                slots = lanes * int(p.config.block_h)
                sides.append((lanes // qq, lanes, slots))
        else:
            lanes = int(plan.gather_rows)
            q = int(plan.config.gather_segment)
            fetched = lanes // q if q > 1 else lanes
            sides.append((fetched, lanes, lanes * int(plan.config.block_h)))
    except (AttributeError, TypeError):
        return None
    feat_bytes = 2 if getattr(variant, "feat_dtype", None) == "bfloat16" else 4
    rows = sum(s[0] for s in sides)
    bytes_rw = sum(s[1] for s in sides) * d * feat_bytes + n * d * 4
    slots = sum(s[2] for s in sides)
    t_traffic = max(rows / 175e6, bytes_rw / 340e9)
    t_mxu = 2.0 * slots * d / 197e12
    return max(t_traffic, t_mxu) * 1e3


def _load_done(out_dir, csv_name):
    """Per-cell resume (VERDICT r4 weak #6): rows already measured in a
    previous (stall-killed) run of the same sweep are kept and skipped,
    so watchdog retries only pay for the missing cells. nan cells are
    NOT kept — a stall-kill mid-measurement writes nan, and those
    deserve a retry."""
    path = os.path.join(out_dir, csv_name)
    rows, done = [], set()
    if not os.path.exists(path):
        return rows, done
    with open(path) as f:
        for r in csv.reader(f):
            if not r or r[0] == "dataset":
                continue
            try:
                t = float(r[3])
            except (IndexError, ValueError):
                t = float("nan")
            if np.isnan(t):
                continue
            rows.append(r)
            done.add((r[0], r[1], int(r[2])))
    return rows, done


def _log_cell_error(args, name, method, d, exc):
    """Sidecar diagnosis for nan cells (round-3 advice: a nan row whose
    reason lives only in a scrolled-away stdout is not auditable).
    Appends one line per failure next to the sweep CSV."""
    import datetime

    path = os.path.join(args.out_dir, args.out_csv + ".errors.txt")
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    first = str(exc).splitlines()[0][:300] if str(exc) else repr(exc)
    try:
        with open(path, "a") as f:
            f.write(
                f"{stamp} {name} {method} d={d} "
                f"{type(exc).__name__}: {first}\n"
            )
    except OSError:
        pass


def run(args):
    import jax.numpy as jnp

    from voltrix_spmm_tpu.ops import spmm_scipy
    from voltrix_spmm_tpu.runtime import native_available, native_spmm_oracle
    from voltrix_spmm_tpu.utils import calc_diff, device_loop_bench

    oracle_fn = (
        native_spmm_oracle
        if native_available()
        else (lambda ip, ix, n, f: spmm_scipy(ip, ix, n, f))
    )

    import graph_gen

    os.makedirs(args.out_dir, exist_ok=True)
    registry = methods_registry()
    methods = args.methods.split(",") if args.methods else list(registry)
    dims = [int(x) for x in args.dims.split(",")]
    rows, done = (
        ([], set()) if args.no_resume else _load_done(args.out_dir, args.out_csv)
    )
    if done:
        print(f"[resume] {len(done)} cell(s) already in {args.out_csv}")
    for name in args.datasets.split(","):
        # write partial results as we go so a crash keeps earlier rows
        _flush(args.out_dir, rows, args.out_csv)
        if all(
            (name, m, d) in done for m in methods for d in dims
        ):
            print(f"[resume] {name}: all cells present — skipping")
            continue
        path = os.path.join(args.data_dir, f"{name}.reorder.npz")
        if not os.path.exists(path):
            os.makedirs(args.data_dir, exist_ok=True)
            path = graph_gen.generate(name, args.data_dir, reorder=True)
        a = graph_gen.load(path)
        n = a.shape[0]
        rng = np.random.default_rng(0)
        for d in dims:
            feat_np = rng.standard_normal((n, d)).astype(np.float32)
            if all((name, m, d) in done for m in methods):
                continue
            try:
                feat = jnp.asarray(feat_np)
                feat.block_until_ready()
                oracle = oracle_fn(a.indptr, a.indices, n, feat_np)
            except Exception as e:  # e.g. device OOM on the feature
                # upload itself — record the whole cell as failed instead
                # of killing the sweep
                print(f"[setup] {name} d={d}: FAILED ({e})")
                _log_cell_error(args, name, "setup", d, e)
                for method in methods:
                    rows.append([name, method, d, float("nan")])
                continue
            for method in methods:
                if (name, method, d) in done:
                    continue
                try:
                    kw = (
                        {"tag": f"{name}-sweep"}
                        if method == "Voltrix"
                        else {}
                    )
                    if method == "Voltrix" and args.seed_dim and (
                        d != args.seed_dim
                    ):
                        kw["seed_space"] = seeded_space(
                            name, n, args.seed_dim, d
                        )
                        if kw["seed_space"]:
                            print(
                                f"[Voltrix] {name} d={d}: seeded space "
                                f"from d{args.seed_dim} winner: "
                                + ", ".join(
                                    v.key() for v in kw["seed_space"]
                                )
                            )
                        elif os.environ.get("VOLTRIX_TPU_BENCH_BUDGET_S"):
                            # no seed winner on disk AND a race budget:
                            # a budget-truncated default race measures
                            # the first ~2 gate-ordered candidates,
                            # which is not champion-first — race the
                            # curated regime champions instead
                            kw["seed_space"] = champion_space(d)
                            print(
                                f"[Voltrix] {name} d={d}: no "
                                f"d{args.seed_dim} seed entry; racing "
                                "champion space under budget: "
                                + ", ".join(
                                    v.key() for v in kw["seed_space"]
                                )
                            )
                    fn, plan = registry[method](a, feat_np, **kw)
                    rest = () if plan is None else (plan,)
                    out = np.asarray(fn(feat, *rest))
                    diff = calc_diff(out, oracle)
                    assert diff < 1e-4, f"accuracy failure: {diff}"
                    del out
                    try:
                        t = device_loop_bench(
                            lambda c, *r, fn=fn: fn(c, *r),
                            feat,
                            *rest,
                            iters=args.iters,
                            trials=2,
                        )
                    except Exception as loop_err:
                        if "RESOURCE_EXHAUSTED" not in str(loop_err):
                            raise
                        # products-class cells fit one dispatch but not
                        # the fori-loop's extra residency — fall back to
                        # the memory-lean blocking-trace harness
                        from voltrix_spmm_tpu.utils import (
                            device_trace_bench,
                        )

                        t = device_trace_bench(
                            lambda c, *r, fn=fn: fn(c, *r),
                            feat, *rest, iters=3,
                        )
                        print(
                            f"[{method}] {name} d={d}: loop harness "
                            "OOM'd; timed via device_trace_bench"
                        )
                except Exception as e:
                    print(f"[{method}] {name} d={d}: FAILED ({e})")
                    _log_cell_error(args, name, method, d, e)
                    rows.append([name, method, d, float("nan"), "", ""])
                    t = None
                if t is not None:
                    floor = _cell_floor(
                        plan, getattr(fn, "variant", None), n, d
                    )
                    fl_ms = round(floor, 4) if floor else ""
                    fl_pct = round(100.0 * floor / t, 1) if floor else ""
                    print(
                        f"[{method}] {name} d={d}: {t:.3f} ms "
                        f"(diff {diff * 100:.4f}%"
                        + (f", {fl_pct}% of floor" if floor else "")
                        + ")"
                    )
                    rows.append(
                        [name, method, d, round(t, 4), fl_ms, fl_pct]
                    )
                # write per CELL so a stall-kill retry resumes here
                _flush(args.out_dir, rows, args.out_csv)
                # free THIS method's device residency before the next one:
                # at ogbn-products scale a pinned 2.5 GB tuned plan plus
                # executables OOM'd every later method in the same cell
                import gc

                import jax

                from voltrix_spmm_tpu.tuner.tuner import spmm_tuner

                fn = plan = rest = out = None
                spmm_tuner._mem.clear()
                jax.clear_caches()
                gc.collect()
        # free device-resident plans and executables between datasets —
        # the tuner's memory cache pins plans in HBM and the sweep
        # otherwise exhausts device memory by the last dataset
        import jax

        from voltrix_spmm_tpu.tuner.tuner import spmm_tuner

        spmm_tuner._mem.clear()
        jax.clear_caches()
        import gc

        del feat, oracle, feat_np
        gc.collect()

    out_csv = _flush(args.out_dir, rows, args.out_csv)
    print(f"results -> {out_csv}")


def _flush(out_dir, rows, csv_name="results.csv"):
    out_csv = os.path.join(out_dir, csv_name)
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["dataset", "method", "featdim", "time_ms", "floor_ms", "floor_pct"]
        )
        w.writerows((list(r) + ["", ""])[:6] for r in rows)
    return out_csv


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    here = os.path.dirname(os.path.abspath(__file__))
    p.add_argument("--datasets", default="er-8k,rmat-17,sbm-131k,dense-4k")
    p.add_argument("--dims", default="256,512,1024")
    p.add_argument("--methods", default="")
    p.add_argument("--data-dir", default=os.path.join(here, "data"))
    p.add_argument("--out-dir", default=here)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out-csv", default="results.csv")
    p.add_argument(
        "--seed-dim", type=int, default=0,
        help="for Voltrix cells at other dims, race a trimmed space "
        "seeded by this dim's cached winner (see seeded_space)",
    )
    p.add_argument(
        "--no-resume", action="store_true",
        help="ignore cells already present in --out-csv (default: "
        "resume — skip measured non-nan cells so watchdog retries "
        "only pay for what's missing)",
    )
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    if args.quick:
        args.datasets = "er-8k"
        args.dims = "256"
        args.iters = 4
    run(args)
