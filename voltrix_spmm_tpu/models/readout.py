"""Graph-level readout + GIN graph classifier over block-diagonal batches.

Four of the reference's twelve evaluation datasets (DD, protein, YeastH,
Yeast — /root/reference/bench/plot.py:8) are many-small-graph corpora
whose real GNN workload is *graph classification*: batch the graphs as
one block-diagonal adjacency (`data.block_diagonal`), run message
passing with a single SpMM per layer, then pool each graph's node
embeddings into one vector. The reference times only the SpMM; this
module makes the surrounding workload runnable end to end.

Design notes (TPU):
- the readout is a segment reduction over a static `(total_nodes,)`
  graph-id array — XLA lowers `segment_sum` to one sorted-segment scan,
  no dynamic shapes, jit/grad-safe;
- the classifier is GIN (sum aggregation == the binary SpMM exactly)
  with jumping-knowledge readout: both layers' node embeddings are
  pooled and concatenated before the linear head, per the GIN paper's
  graph-classification recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .graph import GraphData, aggregate


def graph_readout(
    x: jax.Array,
    graph_ids: jax.Array,
    num_graphs: int,
    mode: str = "sum",
) -> jax.Array:
    """Pool node features (N, D) into per-graph vectors (num_graphs, D).

    graph_ids: int32 (N,) from `data.node_graph_ids`; num_graphs is
    static. mode: "sum" | "mean" | "max".
    """
    if mode == "sum":
        return jax.ops.segment_sum(x, graph_ids, num_segments=num_graphs)
    if mode == "mean":
        s = jax.ops.segment_sum(x, graph_ids, num_segments=num_graphs)
        counts = jax.ops.segment_sum(
            jnp.ones((x.shape[0], 1), x.dtype), graph_ids,
            num_segments=num_graphs,
        )
        return s / jnp.maximum(counts, 1.0)
    if mode == "max":
        return jax.ops.segment_max(x, graph_ids, num_segments=num_graphs)
    raise ValueError(f"unknown readout mode {mode!r}")


def init_gin_classifier(
    key, in_dim: int, hidden: int, num_classes: int, dtype=jnp.float32
):
    """Two GIN layers (MLPs to `hidden`) + a linear head over the
    concatenated per-layer readouts (jumping knowledge)."""
    keys = jax.random.split(key, 5)
    s_in = (2.0 / in_dim) ** 0.5
    s_h = (2.0 / hidden) ** 0.5

    def dense(k, a, b, s):
        return (jax.random.normal(k, (a, b)) * s).astype(dtype)

    return {
        "eps1": jnp.zeros((), dtype),
        "w1a": dense(keys[0], in_dim, hidden, s_in),
        "b1a": jnp.zeros((hidden,), dtype),
        "w1b": dense(keys[1], hidden, hidden, s_h),
        "b1b": jnp.zeros((hidden,), dtype),
        "eps2": jnp.zeros((), dtype),
        "w2a": dense(keys[2], hidden, hidden, s_h),
        "b2a": jnp.zeros((hidden,), dtype),
        "w2b": dense(keys[3], hidden, hidden, s_h),
        "b2b": jnp.zeros((hidden,), dtype),
        "w_head": dense(keys[4], 2 * hidden, num_classes, (1.0 / hidden) ** 0.5),
        "b_head": jnp.zeros((num_classes,), dtype),
    }


def _gin_mlp(x, agg, eps, wa, ba, wb, bb):
    h = (1.0 + eps) * x + agg
    h = jax.nn.relu(h @ wa + ba)
    return jax.nn.relu(h @ wb + bb)


def gin_classifier_forward(
    params,
    g: GraphData,
    x: jax.Array,
    graph_ids: jax.Array,
    num_graphs: int,
    readout: str = "sum",
) -> jax.Array:
    """Logits (num_graphs, num_classes) for a block-diagonal batch.

    Because the adjacency is block-diagonal and GIN uses sum
    aggregation, the batched forward is exactly equal to running each
    graph separately (tested) — one SpMM launch serves the whole batch.
    """
    h1 = _gin_mlp(
        x, aggregate(g, x, mode="sum"), params["eps1"],
        params["w1a"], params["b1a"], params["w1b"], params["b1b"],
    )
    h2 = _gin_mlp(
        h1, aggregate(g, h1, mode="sum"), params["eps2"],
        params["w2a"], params["b2a"], params["w2b"], params["b2b"],
    )
    pooled = jnp.concatenate(
        [
            graph_readout(h1, graph_ids, num_graphs, readout),
            graph_readout(h2, graph_ids, num_graphs, readout),
        ],
        axis=1,
    )
    return pooled @ params["w_head"] + params["b_head"]


def gin_classifier_loss(
    params, g, x, graph_ids, num_graphs: int, labels: jax.Array
) -> jax.Array:
    logits = gin_classifier_forward(params, g, x, graph_ids, num_graphs)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()


def make_classifier_train_step(optimizer: optax.GradientTransformation):
    """Jittable `(params, opt_state, g, x, graph_ids, labels) -> (params,
    opt_state, loss)` step; num_graphs is taken from labels' static shape."""

    def train_step(params, opt_state, g, x, graph_ids, labels):
        loss, grads = jax.value_and_grad(gin_classifier_loss)(
            params, g, x, graph_ids, labels.shape[0], labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
