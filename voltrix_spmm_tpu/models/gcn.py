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


def gcn_forward(params, g: GraphData, x: jax.Array) -> jax.Array:
    """logits = agg(relu(agg(x) @ W1 + b1)) @ W2 + b2, mean aggregation."""
    h = aggregate(g, x, mode="mean")
    h = jax.nn.relu(h @ params["w1"] + params["b1"])
    h = aggregate(g, h, mode="mean")
    return h @ params["w2"] + params["b2"]


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
