"""Mini-batch GraphSAGE over neighbor-sampled blocks.

The full-graph SAGE (`sage.py`) is the reference kernels' workload
shape; this is its production training protocol: per step, aggregate
over `data.sampling` blocks whose plans are padded to static shapes, so
the jitted step compiles once for a batch geometry and every mini-batch
reuses it (tested via jit cache-size assertions).

Layer l consumes the hop-l block: h_dst = act(h[:num_dst] @ W_self +
(inv_deg * SpMM(block, h)) @ W_neigh + b) — the mean aggregator over
the SAMPLED edges, matching GraphSAGE's estimator. The SpMM runs the
same differentiable Pallas path as full-graph training (`spmm_ad`
with the block's transpose plan for the backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops.autodiff import spmm_ad


def init_sage_minibatch(key, dims: list[int], dtype=jnp.float32):
    """dims = [in_dim, hidden..., num_classes]; one SAGE layer per hop
    (len(dims) - 1 layers == number of sampled blocks)."""
    layers = []
    for l in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        s = (1.0 / dims[l]) ** 0.5
        layers.append(
            {
                "w_self": (
                    jax.random.normal(k1, (dims[l], dims[l + 1])) * s
                ).astype(dtype),
                "w_neigh": (
                    jax.random.normal(k2, (dims[l], dims[l + 1])) * s
                ).astype(dtype),
                "b": jnp.zeros((dims[l + 1],), dtype),
            }
        )
    return layers


def sage_minibatch_forward(params, blocks, x_src: jax.Array) -> jax.Array:
    """blocks: `data.sampling.sample_blocks` output (input-side first);
    x_src: features of blocks[0]'s padded source list
    (`gather_features`). Returns logits for the seed rows."""
    assert len(params) == len(blocks), (len(params), len(blocks))
    h = x_src
    for l, (p, blk) in enumerate(zip(params, blocks)):
        # source slot j < num_dst is dst j itself (sampling.py contract)
        self_h = h[: blk.num_dst]
        agg = jnp.asarray(blk.inv_deg) * spmm_ad(blk.plan, blk.plan_t, h)
        z = self_h @ p["w_self"] + agg @ p["w_neigh"] + p["b"]
        h = jax.nn.relu(z) if l + 1 < len(blocks) else z
    return h


def sage_minibatch_loss(params, blocks, x_src, labels) -> jax.Array:
    logits = sage_minibatch_forward(params, blocks, x_src)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()


def make_sage_minibatch_step(optimizer: optax.GradientTransformation):
    """Returns `(params, opt_state, plans, inv_degs, x_src, y) ->
    (params, opt_state, loss)` where plans/inv_degs are the per-hop
    `[(plan, plan_t), ...]` / `[inv_deg, ...]` lists — plain pytrees, so
    the step jits once per batch geometry.

    (The step takes the block pieces rather than SampleBlock objects so
    callers can donate/reuse device copies; `blocks_args` packs them.)"""

    def loss_fn(params, plans, inv_degs, x_src, y):
        h = x_src
        last = len(plans) - 1
        for l, ((plan, plan_t), invd, p) in enumerate(
            zip(plans, inv_degs, params)
        ):
            self_h = h[: plan.num_nodes]
            agg = invd * spmm_ad(plan, plan_t, h)
            z = self_h @ p["w_self"] + agg @ p["w_neigh"] + p["b"]
            h = jax.nn.relu(z) if l < last else z
        return optax.softmax_cross_entropy_with_integer_labels(
            h, y
        ).mean()

    @jax.jit
    def step(params, opt_state, plans, inv_degs, x_src, y):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, plans, inv_degs, x_src, y
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def blocks_args(blocks):
    """Split SampleBlocks into the (plans, inv_degs) pytrees the jitted
    step consumes."""
    plans = [(b.plan, b.plan_t) for b in blocks]
    inv_degs = [jnp.asarray(b.inv_deg) for b in blocks]
    return plans, inv_degs


def sage_inference(params, g, x: jax.Array) -> jax.Array:
    """Layer-wise FULL-GRAPH inference with mini-batch-trained params —
    the standard GraphSAGE deployment pattern: train on sampled blocks,
    serve with exact full-neighborhood aggregation (one big SpMM per
    layer, where the kernels are fastest). g: `models.build_graph`
    output; returns logits for every node."""
    from .graph import aggregate

    h = x
    for l, p in enumerate(params):
        agg = aggregate(g, h, mode="mean")
        z = h @ p["w_self"] + agg @ p["w_neigh"] + p["b"]
        h = jax.nn.relu(z) if l + 1 < len(params) else z
    return h
