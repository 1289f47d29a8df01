"""GAT on the weighted value plane: attention semantics vs a dense
numpy oracle, autodiff through the attention, and training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.models import (
    build_gat_graph,
    edge_softmax,
    gat_attention_aggregate,
    gat_forward,
    gat_loss,
    init_gat,
)

CFG = PlanConfig(32, 128)


def small_graph(rng, n=200, density=0.03):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a.data[:] = 1.0
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    # GAT convention: self-loops so every row has a neighbor set
    a = ((a + sp.eye(n, format="csr")) != 0).astype(np.float32).tocsr()
    return a, build_gat_graph(a.indptr, a.indices, n, CFG)


def dense_gat_head(a, h, a_src, a_dst):
    """Dense numpy oracle for one attention head."""
    n = a.shape[0]
    s = h @ a_src
    t = h @ a_dst
    e = s[:, None] + t[None, :]
    e = np.where(e > 0, e, 0.2 * e)  # leaky relu
    mask = a.toarray() != 0
    e = np.where(mask, e, -np.inf)
    m = e.max(axis=1, keepdims=True)
    alpha = np.exp(e - m) * mask
    alpha = alpha / np.maximum(alpha.sum(axis=1, keepdims=True), 1e-9)
    return alpha @ h


def test_edge_softmax_rows_sum_to_one(rng):
    a, g = small_graph(rng)
    e = jnp.asarray(rng.standard_normal(a.nnz).astype(np.float32))
    alpha = np.asarray(edge_softmax(g, e))
    rows = np.repeat(np.arange(a.shape[0]), np.diff(a.indptr))
    sums = np.zeros(a.shape[0])
    np.add.at(sums, rows, alpha)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_gat_head_matches_dense(rng):
    a, g = small_graph(rng)
    n, f = a.shape[0], 16
    h = rng.standard_normal((n, f)).astype(np.float32)
    a_src = rng.standard_normal(f).astype(np.float32)
    a_dst = rng.standard_normal(f).astype(np.float32)
    out = np.asarray(
        gat_attention_aggregate(
            g, jnp.asarray(h), jnp.asarray(a_src), jnp.asarray(a_dst)
        )
    )
    want = dense_gat_head(a, h, a_src, a_dst)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_gat_forward_shape_and_jit(rng):
    a, g = small_graph(rng)
    n, d, hidden, classes = a.shape[0], 12, 8, 5
    params = init_gat(jax.random.PRNGKey(0), d, hidden, classes, num_heads=2)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    logits = jax.jit(gat_forward)(params, g, x)
    assert logits.shape == (n, classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_gat_grad_matches_dense(rng):
    """Gradient through attention + weighted SpMM vs numeric dense ref."""
    a, g = small_graph(rng, n=120)
    n, f = a.shape[0], 8
    h0 = rng.standard_normal((n, f)).astype(np.float32)
    a_src = rng.standard_normal(f).astype(np.float32)
    a_dst = rng.standard_normal(f).astype(np.float32)
    w = rng.standard_normal((n, f)).astype(np.float32)

    def loss(hj):
        return jnp.sum(
            gat_attention_aggregate(
                g, hj, jnp.asarray(a_src), jnp.asarray(a_dst)
            )
            * w
        )

    grad = np.asarray(jax.grad(loss)(jnp.asarray(h0)))

    # numeric gradient on the dense oracle (spot-check 5 coordinates)
    eps = 1e-3
    idx = [(3, 2), (50, 0), (99, 7), (0, 4), (77, 1)]
    for i, j in idx:
        hp, hm = h0.copy(), h0.copy()
        hp[i, j] += eps
        hm[i, j] -= eps
        num = (
            (dense_gat_head(a, hp, a_src, a_dst) * w).sum()
            - (dense_gat_head(a, hm, a_src, a_dst) * w).sum()
        ) / (2 * eps)
        np.testing.assert_allclose(grad[i, j], num, rtol=2e-2, atol=2e-2)


def test_gat_trains(rng):
    a, g = small_graph(rng)
    n, d, hidden, classes = a.shape[0], 12, 8, 4
    params = init_gat(jax.random.PRNGKey(1), d, hidden, classes, num_heads=2)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, size=n))
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(gat_loss)(params, g, x, y)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss0 = step(params, opt_state)
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss)) and float(loss) < float(loss0)
