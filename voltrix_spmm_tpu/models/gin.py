"""GIN (Graph Isomorphism Network) on the SpMM kernels.

Third model family: GIN uses *sum* aggregation with a learned self-loop
weight — h' = MLP((1 + eps) * h + sum_neighbors h) — which maps directly
onto the binary SpMM (sum aggregation is exactly A @ h). Rounds out the
GCN/GraphSAGE families the reference's kernels target
(bmat_kernels.cuh:16-20)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .graph import GraphData, aggregate


def init_gin(key, in_dim: int, hidden: int, num_classes: int, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    s1 = (2.0 / in_dim) ** 0.5
    s2 = (2.0 / hidden) ** 0.5
    return {
        "eps1": jnp.zeros((), dtype),
        "w1a": (jax.random.normal(keys[0], (in_dim, hidden)) * s1).astype(dtype),
        "b1a": jnp.zeros((hidden,), dtype),
        "w1b": (jax.random.normal(keys[1], (hidden, hidden)) * s2).astype(dtype),
        "b1b": jnp.zeros((hidden,), dtype),
        "eps2": jnp.zeros((), dtype),
        "w2a": (jax.random.normal(keys[2], (hidden, hidden)) * s2).astype(dtype),
        "b2a": jnp.zeros((hidden,), dtype),
        "w2b": (jax.random.normal(keys[3], (hidden, num_classes)) * s2).astype(
            dtype
        ),
        "b2b": jnp.zeros((num_classes,), dtype),
    }


def _gin_layer(x, agg, eps, wa, ba, wb, bb):
    h = (1.0 + eps) * x + agg
    h = jax.nn.relu(h @ wa + ba)
    return h @ wb + bb


def gin_forward(params, g: GraphData, x: jax.Array) -> jax.Array:
    a1 = aggregate(g, x, mode="sum")
    h = jax.nn.relu(
        _gin_layer(x, a1, params["eps1"], params["w1a"], params["b1a"],
                   params["w1b"], params["b1b"])
    )
    a2 = aggregate(g, h, mode="sum")
    return _gin_layer(h, a2, params["eps2"], params["w2a"], params["b2a"],
                      params["w2b"], params["b2b"])
