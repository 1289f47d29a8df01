"""R-GCN (relational GCN) on the SpMM kernels.

Knowledge-graph / heterogeneous-graph workload: edges carry relation
types, and a layer aggregates once PER RELATION with its own weight:

    h' = act( h @ W_self + sum_r mean_agg_r(h) @ W_r )

Each relation is an independent `GraphData` (its own plan, usually
asymmetric — relations are directed), so the layer is R binary SpMMs —
exactly the kernel the reference accelerates (bmat_kernels.cuh:16-20),
composed R ways. Supports the R-GCN paper's basis decomposition
(W_r = sum_b a[r, b] V_b) to keep parameters sublinear in R.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .graph import GraphData, aggregate


def init_rgcn(
    key,
    in_dim: int,
    hidden: int,
    num_classes: int,
    num_rels: int,
    num_bases: int | None = None,
    dtype=jnp.float32,
):
    """Two R-GCN layers. num_bases=None stores a full W_r per relation;
    an int B stores B shared basis matrices + (R, B) coefficients."""
    dims = [(in_dim, hidden), (hidden, num_classes)]
    params = {"layers": []}
    for a, b in dims:
        key, k_self, k_rel, k_coef = jax.random.split(key, 4)
        s = (1.0 / a) ** 0.5
        layer = {
            "w_self": (jax.random.normal(k_self, (a, b)) * s).astype(dtype),
            "b": jnp.zeros((b,), dtype),
        }
        if num_bases is None:
            layer["w_rel"] = (
                jax.random.normal(k_rel, (num_rels, a, b)) * s
            ).astype(dtype)
        else:
            layer["v_bases"] = (
                jax.random.normal(k_rel, (num_bases, a, b)) * s
            ).astype(dtype)
            layer["a_coef"] = (
                jax.random.normal(k_coef, (num_rels, num_bases))
                * (1.0 / num_bases) ** 0.5
            ).astype(dtype)
        params["layers"].append(layer)
    return params


def _rel_weights(layer):
    if "w_rel" in layer:
        return layer["w_rel"]
    # basis decomposition: W_r = sum_b a[r, b] V_b
    return jnp.einsum("rb,bio->rio", layer["a_coef"], layer["v_bases"])


def _rgcn_layer(layer, rel_graphs: list[GraphData], h):
    w_rel = _rel_weights(layer)
    z = h @ layer["w_self"] + layer["b"]
    for r, g in enumerate(rel_graphs):
        z = z + aggregate(g, h, mode="mean") @ w_rel[r]
    return z


def rgcn_forward(params, rel_graphs: list[GraphData], x: jax.Array):
    h = jax.nn.relu(_rgcn_layer(params["layers"][0], rel_graphs, x))
    return _rgcn_layer(params["layers"][1], rel_graphs, h)


def rgcn_loss(params, rel_graphs, x, labels) -> jax.Array:
    logits = rgcn_forward(params, rel_graphs, x)
    mask = labels >= 0
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(labels, 0)
    )
    return jnp.sum(jnp.where(mask, losses, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1
    )


def make_rgcn_train_step(optimizer: optax.GradientTransformation):
    """Jittable `(params, opt_state, rel_graphs, x, y) -> (params,
    opt_state, loss)`; label -100 excludes a node from the loss."""

    def train_step(params, opt_state, rel_graphs, x, y):
        loss, grads = jax.value_and_grad(rgcn_loss)(
            params, rel_graphs, x, y
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
