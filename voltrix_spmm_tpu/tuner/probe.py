"""Isolated per-candidate timing probe (subprocess entry).

`python -m voltrix_spmm_tpu.tuner.probe spec.json` builds ONE tuning
candidate's plan, times it on the device, and prints a single JSON
line. The parent tuner launches one probe process per candidate for
huge graphs (`compile_and_tune(isolate=...)`).

Why a subprocess: at products scale (2.45M nodes / 83M nnz) racing
candidates in ONE process poisons the device session — measured: after
two candidates, a third read 26 s for a 0.5 s dispatch (the documented
30-50x kept-buffer inflation) and every later candidate died
RESOURCE_EXHAUSTED even though each fits comfortably alone. Process
exit is the only reliable full release of device residency through
the relay. This is also the architecture the reference uses for its
candidates (one nvcc/ctypes build+launch per tuning config,
jit_kernels/tuner.py:84-116 — validity = subprocess return code).

Timing inside the probe is the tuner's own harness: `device_loop_bench`
with the RESOURCE_EXHAUSTED fallback to `device_trace_bench`.

Spec JSON:
    {"csr": path.npz (indptr, indices[, values]),
     "num_nodes": N, "d": D, "feat_dtype": "float32",
     "variant": {Variant fields}, "ordering": "identity",
     "iters": 8, "backend": "auto"}
Output (last stdout line): {"ok": true, "time_ms": t}
                        or {"ok": false, "error": "..."}.
"""

from __future__ import annotations

import json
import sys


def run_probe(spec: dict) -> dict:
    import numpy as np

    from ..utils import device_loop_bench
    from .tuner import Variant, _reorder, _run_variant, build_variant_plan

    z = np.load(spec["csr"])
    indptr, indices = z["indptr"], z["indices"]
    values = z["values"] if "values" in z.files else None
    num_nodes = int(spec["num_nodes"])
    variant = Variant(**spec["variant"])
    ordering = spec.get("ordering", "identity")
    ptr, idx, vals, perm = _reorder(
        ordering, indptr, indices, num_nodes, values
    )
    plan = build_variant_plan(
        variant, ptr, idx, num_nodes, vals,
        backend=spec.get("backend", "auto"),
        weighted=values is not None,
    )

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d = int(spec["d"])
    # timing needs shape/dtype only — kernel cost is data-independent
    feat = jnp.asarray(
        rng.standard_normal((num_nodes, d)).astype(np.float32)
    ).astype(jnp.dtype(spec.get("feat_dtype", "float32")))

    if perm is not None:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.shape[0], dtype=np.int32)
        pj, ij = jnp.asarray(perm), jnp.asarray(inv)
        fn = lambda c, p, v=variant, pe=pj, iv=ij: _run_variant(v, p, c, pe, iv)
    else:
        fn = lambda c, p, v=variant: _run_variant(v, p, c)

    try:
        t = device_loop_bench(fn, feat, plan, iters=int(spec.get("iters", 8)),
                              trials=2)
    except Exception as e:
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        from ..utils import device_trace_bench

        t = device_trace_bench(fn, feat, plan, iters=3)
    return {"ok": True, "time_ms": float(t)}


def main(argv):
    with open(argv[1]) as f:
        spec = json.load(f)
    try:
        out = run_probe(spec)
    except Exception as e:  # noqa: BLE001 — the parent keys off ok=false
        out = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(out), flush=True)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
