"""Deep (N-layer) GCN with scanned layers and per-layer rematerialization.

The 2-layer `gcn.py` keeps both activations live through the backward —
fine at its scale. A DEEP residual GCN over a products-class graph is
where full-graph training becomes activation-memory-bound: each hidden
layer's residual is (num_nodes, hidden) f32 (1.25 GB at 2.45M x 128),
so L layers hold L such buffers for the backward.

TPU-idiomatic answer (there is no reference counterpart — the reference
is a single kernel, SURVEY.md §0): stack the uniform hidden layers into
one (L, h, h) parameter pytree, run them under `lax.scan` (one traced
layer body regardless of depth — constant compile time), and optionally
wrap the body in `jax.checkpoint` (per-layer remat). What remat buys,
measured: `lax.scan` stores each step's CARRY for the backward either
way; checkpointing drops the body-INTERNAL residuals (aggregate
output, pre-activation, relu mask — ~3 extra (N, h) buffers per layer)
in exchange for one body recompute per layer. XLA-CPU memory analysis
confirms the shrink (tests/test_deep_gcn.py). On the v5e the analysis
showed NO win at the scales tried (rmat-15 h1024 d256 L12: 772 MB
plain vs 856 MB remat; er-32k fused path: 377 vs 470) — XLA:TPU's
scheduler already keeps body temps bounded and the pregather buffer
dominates; pair deep stacks with `build_graph(stream_chunks=)` when
memory-bound, and treat remat=True as the knob for
activation-dominated configs, verified per-model via
`serve.compiled_stats` before relying on it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .graph import GraphData, aggregate


def init_deep_gcn(
    key,
    in_dim: int,
    hidden: int,
    num_classes: int,
    num_layers: int,
    dtype=jnp.float32,
):
    """num_layers >= 2: input projection + (num_layers - 2) scanned
    uniform hidden blocks + output layer."""
    assert num_layers >= 2, "need at least input + output layers"
    k_in, k_mid, k_out = jax.random.split(key, 3)
    n_mid = num_layers - 2
    mid_w = (
        jax.random.normal(k_mid, (n_mid, hidden, hidden))
        * (2.0 / hidden) ** 0.5
    ).astype(dtype)
    return {
        "w_in": (
            jax.random.normal(k_in, (in_dim, hidden)) * (2.0 / in_dim) ** 0.5
        ).astype(dtype),
        "b_in": jnp.zeros((hidden,), dtype),
        "w_mid": mid_w,
        "b_mid": jnp.zeros((n_mid, hidden), dtype),
        "w_out": (
            jax.random.normal(k_out, (hidden, num_classes))
            * (2.0 / hidden) ** 0.5
        ).astype(dtype),
        "b_out": jnp.zeros((num_classes,), dtype),
    }


def deep_gcn_forward(
    params,
    g: GraphData,
    x: jax.Array,
    *,
    remat: bool = False,
    residual: bool = True,
    mode: str = "mean",
) -> jax.Array:
    """logits for an L-layer GCN; hidden blocks are h + relu(agg(h) @ W
    + b) (residual keeps deep stacks trainable against oversmoothing).

    remat=True checkpoints each scanned layer: the backward recomputes
    body internals instead of storing them (~3 fewer (N, h) temp
    buffers per layer; the scan carry is stored either way). Verify the
    trade for your config via serve.compiled_stats — see the module
    docstring for measured TPU caveats.
    """
    h = jax.nn.relu(aggregate(g, x, mode=mode) @ params["w_in"] + params["b_in"])

    def body(carry, layer):
        w, b = layer
        out = jax.nn.relu(aggregate(g, carry, mode=mode) @ w + b)
        if residual:
            out = out + carry
        return out, None

    body_fn = jax.checkpoint(body) if remat else body
    if params["w_mid"].shape[0] > 0:
        h, _ = jax.lax.scan(body_fn, h, (params["w_mid"], params["b_mid"]))
    h = aggregate(g, h, mode=mode)
    return h @ params["w_out"] + params["b_out"]


def deep_gcn_loss(params, g, x, y, *, remat=False, residual=True, mode="mean"):
    logits = deep_gcn_forward(
        params, g, x, remat=remat, residual=residual, mode=mode
    )
    return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


def make_deep_train_step(
    optimizer: optax.GradientTransformation,
    *,
    remat: bool = False,
    residual: bool = True,
    mode: str = "mean",
):
    """Jittable `(params, opt_state, g, x, y) -> (params, opt_state,
    loss)` full-graph step over the scanned deep GCN."""

    def train_step(params, opt_state, g, x, y):
        loss, grads = jax.value_and_grad(deep_gcn_loss)(
            params, g, x, y, remat=remat, residual=residual, mode=mode
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(train_step)
