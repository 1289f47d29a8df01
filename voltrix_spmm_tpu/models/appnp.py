"""APPNP: Approximate Personalized Propagation of Neural Predictions
(Klicpera et al., ICLR 2019) on the SpMM kernels.

Model-family extension beyond the reference's GCN/SAGE workload
(bmat_kernels.cuh:16-20): a feature MLP followed by K steps of
personalized-PageRank propagation

    z^{k+1} = (1 - alpha) * A_hat @ z^k + alpha * h,   A_hat = D^-1/2 A D^-1/2

— K back-to-back SpMMs on the same plan, exactly the workload this
library is built to make fast (each step is one `aggregate(..., "sym")`
through the regime-dispatched kernels). Differentiable end to end via
`spmm_ad`; the propagation runs under `lax.fori_loop`, so K does not
unroll into K compiled kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .graph import GraphData, aggregate


def init_appnp(key, in_dim: int, hidden: int, num_classes: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w1": (
            jax.random.normal(k1, (in_dim, hidden)) * (2.0 / in_dim) ** 0.5
        ).astype(dtype),
        "b1": jnp.zeros((hidden,), dtype),
        "w2": (
            jax.random.normal(k2, (hidden, num_classes))
            * (2.0 / hidden) ** 0.5
        ).astype(dtype),
        "b2": jnp.zeros((num_classes,), dtype),
    }


def appnp_forward(
    params,
    g: GraphData,
    x: jax.Array,
    *,
    k: int = 10,
    alpha: float = 0.1,
) -> jax.Array:
    """logits after K personalized-PageRank propagation steps."""
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    h = h @ params["w2"] + params["b2"]

    def step(_, z):
        return (1.0 - alpha) * aggregate(g, z, mode="sym") + alpha * h

    return jax.lax.fori_loop(0, k, step, h)


def appnp_loss(params, g: GraphData, x, labels, *, k: int = 10, alpha: float = 0.1):
    import optax

    logits = appnp_forward(params, g, x, k=k, alpha=alpha)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()
