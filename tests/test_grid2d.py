"""2D-partitioned (SUMMA-style) SpMM tests on the 8-virtual-device CPU
mesh: forward/grad parity vs dense oracles and training-step parity vs
the ring trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from jax.sharding import Mesh

from voltrix_spmm_tpu.format import PlanConfig
from voltrix_spmm_tpu.parallel import (
    build_grid2d_plan,
    grid2d_spmm,
    make_grid2d_train_step,
)

CFG = PlanConfig(32, 128)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh(nrow, ncol):
    devs = np.asarray(jax.devices()[: nrow * ncol]).reshape(nrow, ncol)
    return Mesh(devs, ("row", "col"))


def _padded_problem(rng, n, d, nrow, ncol, density=0.05):
    a = sp.random(n, n, density=density, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    plan = build_grid2d_plan(
        a.indptr, a.indices, n, nrow, ncol, CFG, with_transpose=True
    )
    n_pad = plan.num_nodes
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    a_pad = np.zeros((n_pad, n_pad), np.float32)
    a_pad[:n, :n] = a.toarray()
    return a, plan, jnp.asarray(x), jnp.asarray(a_pad)


@pytest.mark.parametrize("nrow,ncol", [(2, 4), (4, 2)])
def test_grid2d_spmm_matches_dense(rng, nrow, ncol):
    _, plan, x, a_pad = _padded_problem(rng, 200, 64, nrow, ncol)
    mesh = _mesh(nrow, ncol)
    out = np.asarray(grid2d_spmm(plan, x, mesh))
    ref = np.asarray(a_pad @ x)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_grid2d_plan_memory_splits_both_axes(rng):
    """Each device's block covers 1/(R*C) of the padded adjacency: the
    stacked bitmask has (R, C) leading dims and per-device blocks sized
    by the LOCAL block count, not the global one."""
    n, nrow, ncol = 240, 2, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    plan = build_grid2d_plan(a.indptr, a.indices, n, nrow, ncol, CFG)
    assert plan.bitmask.shape[:2] == (nrow, ncol)
    # a single-device plan of the same graph has >> tb_max blocks
    from voltrix_spmm_tpu.format import csr_preprocess

    full = csr_preprocess(a.indptr, a.indices, n, CFG)
    assert plan.tb_max < full.total_blocks


def test_grid2d_grad_matches_dense(rng):
    nrow, ncol = 2, 4
    _, plan, x, a_pad = _padded_problem(rng, 160, 32, nrow, ncol)
    mesh = _mesh(nrow, ncol)
    w = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))

    def loss_sharded(xv):
        return jnp.sum(jnp.tanh(grid2d_spmm(plan, xv, mesh) @ w))

    def loss_dense(xv):
        return jnp.sum(jnp.tanh((a_pad @ xv) @ w))

    g_sharded = np.asarray(jax.grad(loss_sharded)(x))
    g_dense = np.asarray(jax.grad(loss_dense)(x))
    np.testing.assert_allclose(g_sharded, g_dense, rtol=1e-4, atol=1e-4)


def test_grid2d_forward_only_grad_raises(rng):
    n, nrow, ncol = 160, 2, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    plan = build_grid2d_plan(
        a.indptr, a.indices, n, nrow, ncol, CFG, with_transpose=False
    )
    mesh = _mesh(nrow, ncol)
    x = jnp.asarray(
        rng.standard_normal((plan.num_nodes, 16)).astype(np.float32)
    )
    with pytest.raises(ValueError, match="with_transpose"):
        jax.grad(lambda xv: grid2d_spmm(plan, xv, mesh).sum())(x)


def test_grid2d_train_step_matches_dense_oracle(rng):
    import optax

    nrow, ncol = 2, 4
    n, d, hidden, classes = 192, 16, 8, 4
    a = sp.random(n, n, density=0.05, format="csr", random_state=rng)
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    plan = build_grid2d_plan(
        a.indptr, a.indices, n, nrow, ncol, CFG, with_transpose=True
    )
    n_pad = plan.num_nodes
    deg = np.maximum(np.diff(a.indptr).astype(np.float32), 1.0)
    inv_deg = np.zeros(n_pad, np.float32)
    inv_deg[:n] = 1.0 / deg
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d))
    y = np.full(n_pad, -100, np.int32)
    y[:n] = rng.integers(0, classes, size=n)

    from voltrix_spmm_tpu.models import init_gcn

    params = init_gcn(jax.random.PRNGKey(0), d, hidden, classes)
    mesh = _mesh(nrow, ncol)
    step = make_grid2d_train_step(plan, mesh, inv_deg, lr=1e-2)
    new_params, loss = step(params, jnp.asarray(x), jnp.asarray(y))
    jax.block_until_ready((new_params, loss))

    # dense oracle, identical padded GCN
    a_pad = np.zeros((n_pad, n_pad), np.float32)
    a_pad[:n, :n] = a.toarray()
    a_j = jnp.asarray(a_pad)
    invd = jnp.asarray(inv_deg.reshape(-1, 1))
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def dense_loss(p):
        h = invd * (a_j @ xj)
        h = jax.nn.relu(h @ p["w1"] + p["b1"])
        h = invd * (a_j @ h)
        logits = h @ p["w2"] + p["b2"]
        mask = yj >= 0
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(yj, 0)
        )
        return jnp.where(mask, losses, 0.0).sum() / jnp.maximum(
            mask.sum(), 1
        )

    ref_loss, ref_grads = jax.value_and_grad(dense_loss)(params)
    ref_params = jax.tree.map(lambda p, g: p - 1e-2 * g, params, ref_grads)
    assert abs(float(loss) - float(ref_loss)) / abs(float(ref_loss)) < 1e-4
    deltas = jax.tree.map(
        lambda u, v: float(jnp.max(jnp.abs(u - v))), new_params, ref_params
    )
    assert max(jax.tree.leaves(deltas)) < 1e-4, deltas
