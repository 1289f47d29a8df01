"""Dot-product-attention GAT on the ELL plan: semantics vs a dense
oracle, end-to-end gradients, and training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.models import (
    build_ell_graph,
    dot_attention_aggregate,
    gat_dot_forward,
    gat_dot_loss,
    init_gat_dot,
)

CFG = PlanConfig(64, 128)


def small_graph(rng, n=200, density=0.03):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    a = ((a + a.T + sp.eye(n)) != 0).astype(np.float32).tocsr()
    return a, build_ell_graph(a.indptr, a.indices, n, CFG)


def dense_dot_head(a, q, k, v, scale):
    n = a.shape[0]
    e = (q @ k.T) * scale
    e = np.where(e > 0, e, 0.2 * e)
    mask = a.toarray() != 0
    e = np.where(mask, e, -np.inf)
    m = e.max(axis=1, keepdims=True)
    alpha = np.exp(e - m) * mask
    alpha = alpha / np.maximum(alpha.sum(axis=1, keepdims=True), 1e-9)
    return alpha @ v


def test_dot_head_matches_dense(rng):
    a, g = small_graph(rng)
    n, f = a.shape[0], 24
    q = rng.standard_normal((n, f)).astype(np.float32)
    k = rng.standard_normal((n, f)).astype(np.float32)
    v = rng.standard_normal((n, f)).astype(np.float32)
    scale = 1.0 / f**0.5
    got = np.asarray(
        dot_attention_aggregate(
            g, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
        )
    )
    want = dense_dot_head(a, q, k, v, scale)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_dot_head_grad_matches_dense(rng):
    a, g = small_graph(rng, n=120)
    n, f = a.shape[0], 12
    q = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    mask = jnp.asarray((a.toarray() != 0).astype(np.float32))
    scale = 1.0 / f**0.5

    def loss_sparse(q_, k_, v_):
        return jnp.sum(jnp.sin(dot_attention_aggregate(g, q_, k_, v_)))

    def loss_dense(q_, k_, v_):
        e = jax.nn.leaky_relu((q_ @ k_.T) * scale, negative_slope=0.2)
        e = jnp.where(mask > 0, e, -jnp.inf)
        alpha = jax.nn.softmax(e, axis=1)
        alpha = jnp.where(mask > 0, alpha, 0.0)
        return jnp.sum(jnp.sin(alpha @ v_))

    gs = jax.grad(loss_sparse, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(gs, gd):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
        )


def test_gat_dot_forward_jit(rng):
    a, g = small_graph(rng)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))
    params = init_gat_dot(jax.random.PRNGKey(0), 10, 8, 5, num_heads=2)
    logits = jax.jit(gat_dot_forward)(params, g, x)
    assert logits.shape == (n, 5)
    assert bool(jnp.isfinite(logits).all())


def test_gat_dot_trains(rng):
    a, g = small_graph(rng, n=150)
    n = a.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    params = init_gat_dot(jax.random.PRNGKey(1), 10, 8, 4, num_heads=2)
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(gat_dot_loss)(params, g, x, labels)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(30):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[:: len(losses) - 1]
