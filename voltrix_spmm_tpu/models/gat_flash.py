"""Flash GAT: dot-product attention GAT on the fused one-kernel path.

Same math as `models.gat_ell` (scores e_uv = leaky_relu(scale q_u.k_v),
per-destination softmax, aggregate v) but the whole head is ONE fused
Pallas launch over the dedup'd binned `SpmmPlan` (`ops.spmm_attention_ad`)
instead of the three-pass ELL pipeline (SDDMM kernel -> O(nnz) segment
softmax -> weighted ELL SpMM). Consequences:

- no O(nnz) attention vector ever exists (residuals are out + lse, O(n));
- the gather dedup of the binned format applies (each distinct neighbor
  fetched once per window vs once per edge on ELL);
- no transpose plan and no edge-endpoint arrays are needed — the model's
  graph container is just the binary plan from `csr_preprocess`.

Semantics note: the binary plan collapses duplicate CSR edges (presence
bits), while the ELL formulation keeps duplicate edges as separate
softmax logits. On deduplicated adjacency (the GNN norm, and the
reference's workload — bmat_kernels.cuh:16-20) the two are identical;
tests assert head-for-head parity against `gat_ell` on such graphs.

Model family beyond the reference (its kernels serve binary GCN/SAGE
aggregation only); this is the framework's transformer-class flagship.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..format.plan import SpmmPlan
from ..ops.attention import spmm_attention_ad


def flash_attention_aggregate(
    plan: SpmmPlan,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    plan_t: SpmmPlan | None = None,
    negative_slope: float = 0.2,
    scale: float | None = None,
) -> jax.Array:
    """One attention head, fused: out_u = sum_v alpha_uv v_v with
    alpha = softmax_v(leaky_relu(scale q_u . k_v)) over u's in-neighbors.
    Differentiable in q/k/v (flash-style recompute backward; pass the
    transpose plan to route dK/dV through the scatter-free split
    backward)."""
    return spmm_attention_ad(
        plan, q, k, v, plan_t=plan_t, scale=scale,
        negative_slope=negative_slope,
    )


def _plan_pair(g):
    """(plan, plan_t, plane_dtype) from a GraphData, a (plan, plan_t[,
    plane_dtype]) tuple, or a bare plan (plan_t=None -> self-contained
    fallback backward). plane_dtype None defers to the size heuristic
    in the forward; jnp.float32 forces f32 planes; jnp.bfloat16 forces
    the halved gather stream (e.g. from a `TunedAttention` winner)."""
    if isinstance(g, SpmmPlan):
        return g, None, None
    if isinstance(g, (tuple, list)):
        if len(g) == 3:
            return g[0], g[1], g[2]
        plan, plan_t = g
        return plan, plan_t, None
    return g.plan, g.plan_t, getattr(g, "plane_dtype", None)


def init_gat_flash(
    key,
    in_dim: int,
    hidden: int,
    num_classes: int,
    num_heads: int = 4,
    dtype=jnp.float32,
):
    """2-layer flash GAT: layer 1 = num_heads concatenated heads, layer 2
    = one head -> logits. Parameter tree is identical to
    `models.init_gat_dot` so the two formulations are drop-in comparable."""
    from .gat_ell import init_gat_dot

    return init_gat_dot(
        key, in_dim, hidden, num_classes, num_heads=num_heads, dtype=dtype
    )


def gat_flash_forward(params, g, x: jax.Array) -> jax.Array:
    """2-layer flash GAT forward. `g` is a `GraphData` or a
    (plan, plan_t) pair — layer 1 then runs ALL heads through the
    batched multi-head op (`ops.spmm_attention_mh_ad`: one gather + one
    launch per direction, scatter-free split backward). A bare
    `SpmmPlan` falls back to per-head calls with the self-contained
    per-lane backward."""
    plan, plan_t, pdt_override = _plan_pair(g)
    nh = params["wq1"].shape[0]
    if plan_t is not None:
        from ..ops.attention_mh import spmm_attention_mh_ad

        # large scattered graphs stream the gathered q/k/v/dO planes in
        # bf16 (same heuristic as GraphData.agg_dtype; accuracy class of
        # the MXU's default bf16-rounding matmul — softmax stats keep
        # f32 via hi/lo splitting inside the op); an explicit override
        # (e.g. the tuner's measured winner) beats the heuristic
        if pdt_override is None:
            pdt = jnp.bfloat16 if x.shape[0] >= 65536 else None
        else:
            pdt = (
                None
                if jnp.dtype(pdt_override) == jnp.float32
                else jnp.dtype(pdt_override)
            )
        q = jnp.einsum("nd,hdk->hnk", x, params["wq1"])
        k = jnp.einsum("nd,hdk->hnk", x, params["wk1"])
        v = jnp.einsum("nd,hdk->hnk", x, params["wv1"])
        heads = spmm_attention_mh_ad(
            plan, q, k, v, plan_t=plan_t, negative_slope=0.2,
            plane_dtype=pdt,
        )  # (H, n, dv)
        h = jax.nn.elu(
            jnp.transpose(heads, (1, 0, 2)).reshape(x.shape[0], -1)
        )
        # layer 2 through the same op (H=1): the pair-packed bf16 plane
        # beats the per-head f32 path even for one head
        out = spmm_attention_mh_ad(
            plan,
            (h @ params["wq2"])[None],
            (h @ params["wk2"])[None],
            (h @ params["wv2"])[None],
            plan_t=plan_t,
            negative_slope=0.2,
            plane_dtype=pdt,
        )
        return out[0]
    else:
        heads = [
            flash_attention_aggregate(
                plan,
                x @ params["wq1"][hh],
                x @ params["wk1"][hh],
                x @ params["wv1"][hh],
                plan_t=plan_t,
            )
            for hh in range(nh)
        ]
        h = jax.nn.elu(jnp.concatenate(heads, axis=1))
    return flash_attention_aggregate(
        plan, h @ params["wq2"], h @ params["wk2"], h @ params["wv2"],
        plan_t=plan_t,
    )


def gat_flash_loss(params, plan: SpmmPlan, x, labels):
    import optax

    logits = gat_flash_forward(params, plan, x)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()


def make_gat_flash_train_step(lr: float = 1e-2):
    """Jitted SGD step (params, plan, x, labels) -> (params, loss)."""

    @jax.jit
    def step(params, plan, x, labels):
        loss, grads = jax.value_and_grad(gat_flash_loss)(
            params, plan, x, labels
        )
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    return step
