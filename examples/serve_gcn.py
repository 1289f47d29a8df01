#!/usr/bin/env python
"""Deployment example: export a trained GCN forward pass to an on-disk
service bundle, then reload and serve it WITHOUT the model code.

Phase 1 (build host): build the graph plan, init/train params, export
  jit(forward) with jax.export and save bundle (program + plan + meta).
Phase 2 (serving process): load_bundle() -> call. No tuner, no
  preprocessing, no model definitions — just the program and arrays.

    python examples/serve_gcn.py [--nodes 8192] [--out /tmp/gcn_svc]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from voltrix_spmm_tpu.models import build_graph, gcn_forward, init_gcn
    from voltrix_spmm_tpu.serve import (
        export_servable,
        load_bundle,
        save_bundle,
    )

    rng = np.random.default_rng(0)
    n, d = args.nodes, args.feat_dim
    a = sp.random(n, n, density=args.density, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()

    # --- phase 1: build host ------------------------------------------
    g = build_graph(a.indptr, a.indices, n, config="auto", symmetric=True)
    params = init_gcn(jax.random.PRNGKey(0), d, args.hidden, args.classes)
    feat = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    def fwd(p, x):
        return gcn_forward(p, g, x)

    t0 = time.time()
    blob = export_servable(fwd, params, feat)
    print(f"exported servable: {len(blob) / 1e6:.2f} MB in {time.time() - t0:.1f}s")
    save_bundle(
        args.out,
        blob,
        plan=g.plan,
        meta={"model": "gcn-2layer", "nodes": n, "feat_dim": d},
    )
    ref = np.asarray(fwd(params, feat))

    # --- phase 2: serving process -------------------------------------
    bundle = load_bundle(args.out)
    print("bundle meta:", bundle.meta)
    t0 = time.time()
    out = np.asarray(bundle(params, feat))  # first call compiles
    print(f"first request (incl. compile): {time.time() - t0:.2f}s")
    t0 = time.time()
    for _ in range(5):
        out = bundle(params, feat)
    jax.block_until_ready(out)
    print(f"steady-state: {(time.time() - t0) / 5 * 1e3:.2f} ms/request")
    err = np.abs(np.asarray(out) - ref).max()
    print(f"served output matches build host: max|delta| = {err:.2e}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=8192)
    p.add_argument("--feat-dim", type=int, default=128)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--density", type=float, default=0.002)
    p.add_argument("--out", default="/tmp/gcn_svc")
    main(p.parse_args())
