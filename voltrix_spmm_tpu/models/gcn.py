"""Two-layer GCN on the SpMM kernels — the flagship model.

Matches the workload class the reference's kernels serve (GCN forward
aggregation, bmat_kernels.cuh:16-20; TC-GNN-style 2-layer GCN is the
bench protocol in BASELINE.md). Training support (loss/grad/SGD) is a
TPU-side extension: the SpMM is differentiable via `spmm_ad`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .graph import GraphData, aggregate


def init_gcn(key, in_dim: int, hidden: int, num_classes: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    scale1 = (2.0 / in_dim) ** 0.5
    scale2 = (2.0 / hidden) ** 0.5
    return {
        "w1": (jax.random.normal(k1, (in_dim, hidden)) * scale1).astype(dtype),
        "b1": jnp.zeros((hidden,), dtype),
        "w2": (jax.random.normal(k2, (hidden, num_classes)) * scale2).astype(dtype),
        "b2": jnp.zeros((num_classes,), dtype),
    }


def _agg_linear(g, x, w, transform_first):
    """agg(x) @ w computed in the cheaper order.

    Aggregation is linear, so agg(x) @ w == agg(x @ w) exactly (up to
    float association); when the output width is smaller than the input
    width, transforming FIRST shrinks the SpMM's feature dimension —
    the gather stream AND the masked-matmul width scale with it (the
    standard right-multiplication-first GCN trick; DGL/PyG do the
    same). "auto" applies it only when in_dim > 256: below that the v5e
    gather is per-ROW-issue-bound (DESIGN.md gather law) so a narrower
    row saves nothing, and the kernel's 128-lane padding floors the
    rest (measured full train step, rmat-17 hidden 128: d256 17.0 ->
    18.0 ms — a wash; d512 26.3 -> 18.8 ms — 1.40x)."""
    if transform_first == "auto":
        transform_first = x.shape[-1] > 256 and w.shape[1] < x.shape[-1]
    if transform_first:
        return aggregate(g, x @ w, mode="mean")
    return aggregate(g, x, mode="mean") @ w


def gcn_forward(
    params, g: GraphData, x: jax.Array, *, transform_first="auto"
) -> jax.Array:
    """logits = agg(relu(agg(x) @ W1 + b1)) @ W2 + b2, mean aggregation.

    transform_first: "auto" (default) aggregates each layer in the
    cheaper of the two mathematically-equal orders (see _agg_linear);
    False reproduces the aggregate-then-transform order exactly."""
    h = jax.nn.relu(_agg_linear(g, x, params["w1"], transform_first) + params["b1"])
    return _agg_linear(g, h, params["w2"], transform_first) + params["b2"]


def gcn_loss(params, g: GraphData, x: jax.Array, labels: jax.Array) -> jax.Array:
    logits = gcn_forward(params, g, x)
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(optimizer: optax.GradientTransformation):
    """Returns a jittable `(params, opt_state, g, x, y) -> (params,
    opt_state, loss)` full training step."""

    def train_step(params, opt_state, g, x, y):
        loss, grads = jax.value_and_grad(gcn_loss)(params, g, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
