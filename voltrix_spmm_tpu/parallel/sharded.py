"""Multi-chip execution: SPMD sharding of SpMM and GCN training.

The reference is strictly single-GPU (SURVEY.md §2.3 — no distributed
surface exists). This module is the TPU-native scale-out path described
in SURVEY.md §5/§7: SpMM with a replicated plan is embarrassingly
parallel over the feature dim (zero collectives on ICI), and GCN
training composes that with Megatron-style tensor parallelism
(column-parallel W1, row-parallel W2 + psum) over a ('data', 'model')
mesh, with gradient pmean over 'data'.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..format.plan import SpmmPlan
from ..models.graph import GraphData
from ..ops.pallas_spmm import spmm_pallas


def make_mesh(n_devices: int | None = None, dp: int | None = None, tp: int | None = None) -> Mesh:
    """Build a ('data', 'model') mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if dp is None or tp is None:
        if n_devices % 4 == 0 and n_devices >= 8:
            tp = 4
        elif n_devices % 2 == 0:
            tp = 2
        else:
            tp = 1
        dp = n_devices // tp
    assert dp * tp == n_devices, (dp, tp, n_devices)
    return Mesh(np.asarray(devices).reshape(dp, tp), ("data", "model"))


def sharded_spmm(plan: SpmmPlan, feat: jax.Array, mesh: Mesh) -> jax.Array:
    """SpMM with the feature dim sharded over the 'model' axis.

    The plan (A's bitmask/indices) is replicated; each device computes its
    own column slice of the output — no collective in the kernel, matching
    the comm-free sharding noted in SURVEY.md §2.3/§5.
    """
    f = shard_map(
        lambda p, x: spmm_pallas(p, x),
        mesh=mesh,
        in_specs=(P(), P(None, "model")),
        out_specs=P(None, "model"),
        check_vma=False,
    )
    return f(plan, feat)


def gcn_param_specs():
    """Megatron-style specs: W1 column-parallel, W2 row-parallel."""
    return {
        "w1": P(None, "model"),
        "b1": P("model"),
        "w2": P("model", None),
        "b2": P(),
    }


def _allreduce_identity_bwd(x, axis):
    """Forward all-reduce whose BACKWARD is identity — the Megatron
    row-parallel rule (each shard's partial receives the plain output
    cotangent). Under check_vma=False the transpose of a bare lax.psum
    is psum again, which silently scales every upstream parameter
    gradient by the axis size (measured tp x on the dryrun mesh)."""
    return x + jax.lax.stop_gradient(jax.lax.psum(x, axis) - x)


def _local_gcn_forward(params, g: GraphData, x: jax.Array) -> jax.Array:
    """Per-device GCN forward; `x` is the local (B_local, N, D) batch
    shard with full features, params are local tensor-parallel shards."""
    from ..models.graph import aggregate

    h = aggregate(g, x, mode="mean")
    h = jax.nn.relu(h @ params["w1"] + params["b1"])  # (B, N, H/tp)
    h = aggregate(g, h, mode="mean")  # feature-sharded: no comm
    partial = h @ params["w2"]  # row-parallel partial sums
    logits = _allreduce_identity_bwd(partial, "model") + params["b2"]
    return logits


def sharded_gcn_forward(params, g: GraphData, x: jax.Array, mesh: Mesh):
    f = shard_map(
        _local_gcn_forward,
        mesh=mesh,
        in_specs=(gcn_param_specs(), P(), P("data", None, None)),
        out_specs=P("data", None, None),
        check_vma=False,
    )
    return f(params, g, x)


def make_sharded_train_step(mesh: Mesh, lr: float = 1e-2):
    """Full SPMD GCN training step over the ('data','model') mesh.

    dp: graph-batch sharded over 'data', grads pmean'd across it.
    tp: W1 column-parallel / W2 row-parallel with a psum on 'model'.
    Returns jittable `(params, g, x, y) -> (params, loss)`.
    """
    import optax

    def local_step(params, g, x, y):
        def loss_fn(p):
            logits = _local_gcn_forward(p, g, x)
            losses = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return losses.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # average over the data axis (params replicated across 'data')
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        params = jax.tree.map(lambda p, dp_: p - lr * dp_, params, grads)
        return params, loss

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(gcn_param_specs(), P(), P("data", None, None), P("data", None)),
        out_specs=(gcn_param_specs(), P()),
        check_vma=False,
    )
    return jax.jit(step)
