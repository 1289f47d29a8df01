#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: autotuned Pallas SpMM speedup over `jax.experimental.sparse`
BCOO on a power-law (R-MAT) graph — the TPU stand-in for the
reference's speedup-over-cuSPARSE protocol (bench/bench_all.py).
Target from BASELINE.md: >= 3x.
"""

import json
import sys
import time


def wait_for_tpu(max_wait_s: float = 600.0) -> bool:
    """The axon relay flakes; probe with a tiny op before the real run."""
    import subprocess

    code = (
        "import jax.numpy as jnp;"
        "print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))"
    )
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, timeout=90
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(15)
    return False


def headline_space(d: int = 256):
    """The headline tuning space, exposed at module level so
    bench/seed_headline_cache.py can rebuild the exact cache identity
    (the space hash is part of the tuner's disk signature) after a VM
    rotation wipes ~/.voltrix_spmm_tpu.

    f32/bf16 only: bf16 storage/MXU inputs are the same accuracy class
    as the reference's tf32 tensor cores vs fp32 cuSPARSE, so the
    comparison against fp32 BCOO stays apples-to-apples (int8 is
    reported in bench/bench_all.py, not the headline). The winner's
    difference rate vs the f32 oracle is reported in `detail`."""
    from voltrix_spmm_tpu.tuner import Variant

    return [
        Variant("pregather", block_h=2048, block_unroll=4),
        Variant("pregather", block_h=2048, block_unroll=4, subtile=True),
        Variant("pregather", block_h=2048, block_unroll=4, feat_dtype="bfloat16"),
        Variant(
            "pregather", block_h=2048, block_unroll=4,
            subtile=True, feat_dtype="bfloat16",
        ),
        Variant("pregather", block_h=1024, block_unroll=4, subtile=True),
        # unroll=2 halves the group-OR inflation of the subtile skip
        # bitmap (group-level sub occupancy 41.1% vs u4's 48.7% on this
        # graph -> MXU floor 1.46 vs 1.76 ms) at 2x grid steps
        Variant(
            "pregather", block_h=2048, block_unroll=2,
            subtile=True, feat_dtype="bfloat16",
        ),
        # bf16 STORAGE + bf16 MXU inputs: numerically the same class as
        # compute_dtype=f32 (default precision rounds MXU inputs to bf16
        # anyway) but skips the per-step VMEM xg cast. Distinct from the
        # dead-ended f32-storage+bf16-compute combination, which PAID a
        # cast instead of skipping one.
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16", compute_dtype="bfloat16",
        ),
        # packed gather: one (q*d)-wide super-row per q-aligned lane
        # run — the v5e gather is per-ROW-cost-bound at 512 B rows, so
        # q=2 halves-ish the row count at pack ratio 1.34 on this graph
        # (measured 11.9 -> 9.2 ms same-session vs the q=1 twin)
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16", gather_segment=2,
        ),
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16", gather_segment=4,
        ),
        # deeper group unroll: 8 blocks (1024 lanes) per grid step —
        # halves grid steps / occ-bitmap ORs at the cost of a wider
        # group occupancy union
        Variant(
            "pregather", block_h=2048, block_unroll=8, subtile=True,
            feat_dtype="bfloat16",
        ),
        # narrower feature chunk: 2 chunks re-read the bitmask twice
        # but halve the VMEM output tile (pipeline headroom)
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16", block_d=128,
        ),
        # round-5 closest challenger for the record: interleaved packed
        # q2 (flatten-free). The full round-5 design race — density
        # split, incidence ordering, q4 — lives in
        # bench/exp_split_rmat17_v2.txt; all lost to seg1-u8 via the
        # wide-fetch penalty (docs/DESIGN.md round-5 revision), so only
        # this representative stays in the headline space.
        Variant(
            "pregather", block_h=2048, block_unroll=4, subtile=True,
            feat_dtype="bfloat16", gather_segment=2, ipack=True,
        ),
    ]


def main():
    import numpy as np

    sys.path.insert(0, ".")
    from voltrix_spmm_tpu.data import reorder_rcm, rmat_csr, symmetrize
    from voltrix_spmm_tpu.ops.baselines import make_bcoo_spmm
    from voltrix_spmm_tpu.tuner import tune_spmm
    from voltrix_spmm_tpu.utils import device_loop_bench

    import jax.numpy as jnp

    scale, avg_deg, d = 17, 16, 256  # 131072 nodes, ~3.7M undirected edges
    a = symmetrize(rmat_csr(scale, avg_deg, seed=0))
    # RCM measured fastest end-to-end here despite degree-sort gathering
    # ~19% fewer rows — the access pattern matters, not just volume
    a, _ = reorder_rcm(a)
    order_name = "rcm"
    n, nnz = a.shape[0], a.nnz

    rng = np.random.default_rng(0)
    feat_np = rng.standard_normal((n, d)).astype(np.float32)
    feat = jnp.asarray(feat_np)

    space = headline_space(d)
    tuned = tune_spmm(
        a.indptr, a.indices, n, feat_np, space=space,
        hash_tag=f"bench-rmat{scale}-deg{avg_deg}-{order_name}",
    )
    t_pallas = tuned.time_ms

    if "--profile" in sys.argv:
        # per-kernel device-time attribution (reference bench_kineto role)
        from voltrix_spmm_tpu.profiling import attribute_spmm, profile_op

        table = profile_op(tuned, feat, iters=5)
        attrib = attribute_spmm(table, tuned.plan)
        print(
            json.dumps(
                {
                    "metric": "spmm_profile_rmat17_d256",
                    "variant": tuned.variant.key(),
                    "attribution": {
                        k: round(v, 4) for k, v in attrib.items()
                    },
                    "top_ops": [
                        {
                            "op": r["op"][:100],
                            "ms": round(r["ms_per_iter"], 4),
                        }
                        for r in table[:6]
                    ],
                }
            )
        )
        return

    bcoo = make_bcoo_spmm(a)
    t_bcoo = device_loop_bench(lambda c, f=bcoo: f(c), feat, iters=5)

    # accuracy of the tuned winner vs the f32 host oracle (reference
    # protocol: difference rate vs cuSPARSE, README.md:177-190)
    from voltrix_spmm_tpu.utils import calc_diff

    try:
        from voltrix_spmm_tpu.runtime import native_spmm_oracle

        oracle = native_spmm_oracle(a.indptr, a.indices, n, feat_np)
    except Exception:
        from voltrix_spmm_tpu.ops import spmm_scipy

        oracle = spmm_scipy(a.indptr, a.indices, n, feat_np)
    diff_rate = calc_diff(np.asarray(tuned(feat)), oracle)

    speedup = t_bcoo / t_pallas
    tflops = 2.0 * nnz * d / (t_pallas * 1e-3) / 1e12
    print(
        json.dumps(
            {
                "metric": "spmm_speedup_vs_bcoo_rmat17_d256",
                "value": round(speedup, 3),
                "unit": "x",
                "vs_baseline": round(speedup / 3.0, 3),
                "detail": {
                    "pallas_ms": round(t_pallas, 4),
                    "bcoo_ms": round(t_bcoo, 4),
                    "nnz_tflops": round(tflops, 4),
                    "diff_rate": float(diff_rate),
                    "variant": tuned.variant.key(),
                    "num_nodes": n,
                    "nnz": int(nnz),
                    "feat_dim": d,
                },
            }
        )
    )


def resilient():
    """Probe + bounded-retry orchestration (reference timing protocol
    role: voltrix/utils.py:324-350 warmup/iters; here the hazard is the
    relay, documented to drop for ~10-20 min at a time — BENCH_r03
    died on a single 10-min probe window). Each measurement attempt
    runs in its OWN subprocess so a mid-run relay drop poisons only
    that attempt; the tuner's persistent cache makes retries cheap."""
    import os
    import subprocess

    deadline = time.time() + float(
        os.environ.get("VOLTRIX_TPU_BENCH_BUDGET_S", "2700")
    )
    # Quiet-chip protocol: a long-running r4 queue cell (grid sweeps,
    # GAT tunes) may hold the single TPU when the driver captures the
    # headline. The pause sentinel makes bench/watchdog.py suspend its
    # cell (kill + resume later from the tune sidecars) so this
    # measurement runs uncontended; removed in the finally below.
    pause_file = "/tmp/r4_pause"

    def _touch_pause():
        # The sentinel carries this process's PID so a watchdog that is
        # WRAPPING bench.py can recognize its own child's pause request
        # and ignore it (otherwise: kill -> wait-out-staleness -> retry
        # livelock, round-4 advisor finding).
        try:
            with open(pause_file, "w") as f:
                f.write(str(os.getpid()))
        except OSError:
            pass

    _touch_pause()
    # One attempt spans up to ~2100 s (600 s relay probe + 1500 s
    # measurement) — longer than the watchdog's PAUSE_STALE_S — so a
    # per-attempt touch is not enough: re-touch from a daemon thread
    # every 60 s for the whole resilient() lifetime.
    import threading

    _pause_done = threading.Event()

    def _keep_fresh():
        while not _pause_done.wait(60.0):
            _touch_pause()

    threading.Thread(target=_keep_fresh, daemon=True).start()
    if os.path.exists("/tmp/r4_queue.lock"):
        time.sleep(75)  # watchdog poll (20 s) + kill + RPC drain

    errors = []
    attempt = 0
    try:
        while time.time() < deadline and attempt < 5:
            attempt += 1
            probe_window = min(600.0, max(60.0, deadline - time.time()))
            if not wait_for_tpu(probe_window):
                errors.append(
                    f"attempt {attempt}: relay probe failed for "
                    f"{probe_window:.0f}s"
                )
                continue
            budget = min(1500.0, max(120.0, deadline - time.time()))
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--measure"]
                    + [a for a in sys.argv[1:] if a != "--measure"],
                    capture_output=True,
                    text=True,
                    timeout=budget,
                )
            except subprocess.TimeoutExpired:
                errors.append(
                    f"attempt {attempt}: measurement timeout {budget:.0f}s"
                )
                continue
            sys.stderr.write(r.stderr or "")
            for line in reversed((r.stdout or "").strip().splitlines()):
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    print(line)
                    return 0
            errors.append(
                f"attempt {attempt}: rc={r.returncode} "
                f"tail={((r.stderr or r.stdout) or 'no output')[-200:]!r}"
            )
            time.sleep(30)
        print(
            json.dumps(
                {
                    "metric": "spmm_speedup_vs_bcoo_rmat17_d256",
                    "value": 0.0,
                    "unit": "x",
                    "vs_baseline": 0.0,
                    "detail": {
                        "error": "; ".join(errors) or "no attempts ran"
                    },
                }
            )
        )
        return 0
    finally:
        _pause_done.set()
        try:
            os.remove(pause_file)
        except OSError:
            pass


if __name__ == "__main__":
    if "--measure" in sys.argv:
        main()
    else:
        sys.exit(resilient())
