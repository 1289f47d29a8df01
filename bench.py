#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: Pallas SpMM speedup over `jax.experimental.sparse` BCOO on a
power-law (R-MAT) graph — the TPU stand-in for the reference's
speedup-over-cuSPARSE protocol (bench/bench_all.py). Target from
BASELINE.md: >= 3x.
"""

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    sys.path.insert(0, ".")
    from voltrix_spmm_tpu import csr_preprocess
    from voltrix_spmm_tpu.data import reorder_rcm, rmat_csr, symmetrize
    from voltrix_spmm_tpu.ops import spmm_pallas
    from voltrix_spmm_tpu.utils import device_loop_bench

    scale, avg_deg, d = 17, 16, 256  # 131072 nodes, ~2M undirected edges
    a = symmetrize(rmat_csr(scale, avg_deg, seed=0))
    a, _ = reorder_rcm(a)
    n = a.shape[0]
    nnz = a.nnz

    plan = csr_preprocess(a.indptr, a.indices, n).device()
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    t_pallas = device_loop_bench(
        lambda c, p: spmm_pallas(p, c), feat, plan, iters=20
    )

    coo = a.tocoo()
    bcoo = jsparse.BCOO(
        (
            jnp.ones(nnz, jnp.float32),
            jnp.asarray(np.stack([coo.row, coo.col], 1).astype(np.int32)),
        ),
        shape=(n, n),
        indices_sorted=True,
        unique_indices=True,
    )
    t_bcoo = device_loop_bench(lambda c, m: m @ c, feat, bcoo, iters=5)

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
                    "num_nodes": n,
                    "nnz": int(nnz),
                    "feat_dim": d,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
