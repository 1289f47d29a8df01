"""GraphSAGE (mean aggregator) on the SpMM kernels.

The second model family the reference's kernels target
(bmat_kernels.cuh:16-20 names GraphSAGE alongside GCN). SAGE layer:
h = relu(x @ W_self + mean_agg(x) @ W_neigh + b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .graph import GraphData, aggregate


def init_sage(key, in_dim: int, hidden: int, num_classes: int, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    s1 = (1.0 / in_dim) ** 0.5
    s2 = (1.0 / hidden) ** 0.5
    return {
        "w_self1": (jax.random.normal(keys[0], (in_dim, hidden)) * s1).astype(dtype),
        "w_neigh1": (jax.random.normal(keys[1], (in_dim, hidden)) * s1).astype(dtype),
        "b1": jnp.zeros((hidden,), dtype),
        "w_self2": (jax.random.normal(keys[2], (hidden, num_classes)) * s2).astype(dtype),
        "w_neigh2": (jax.random.normal(keys[3], (hidden, num_classes)) * s2).astype(dtype),
        "b2": jnp.zeros((num_classes,), dtype),
    }


def sage_forward(params, g: GraphData, x: jax.Array) -> jax.Array:
    agg = aggregate(g, x, mode="mean")
    h = jax.nn.relu(
        x @ params["w_self1"] + agg @ params["w_neigh1"] + params["b1"]
    )
    agg2 = aggregate(g, h, mode="mean")
    return h @ params["w_self2"] + agg2 @ params["w_neigh2"] + params["b2"]
